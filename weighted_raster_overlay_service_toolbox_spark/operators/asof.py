"""As-of join: for each probe row, the latest reference row at-or-before
its timestamp, per key.

Spark has no native as-of join. The scalable implementation is NOT
probe-join-reference + groupBy-max (that join explodes to |probe| x
|ref-per-key| rows before aggregating); it is the union + window pattern:

1. tag reference rows 0 and probe rows 1, union them aligned by name;
2. one shuffle: window partitioned by key, ordered by (ts, tag) --
   reference sorts before probe at equal ts so ``<=`` ties match;
3. ``last(ref_value, ignorenulls=True)`` over unbounded-preceding fills
   each probe row with the most recent reference value;
4. keep probe rows.

Cost: a single shuffle of |probe| + |ref| rows on the key -- the same cost
as one sort-merge join, with no intermediate blow-up. Skewed keys are
handled by AQE; at 100 TB both inputs would be pre-bucketed by key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    on: list[str],
    ts: str,
    ref_value_cols: list[str],
    suffix: str = "_ref",
) -> DataFrame:
    """Left as-of join (backward direction, inclusive).

    ``probe`` keeps all its columns; for each probe row the reference row
    with the greatest ``ts`` <= probe ``ts`` (per ``on`` key) contributes
    ``ref_value_cols`` plus ``ts + suffix``. No match -> nulls.
    ``ref`` must be unique per (key, ts); pre-aggregate it otherwise.
    """
    tag = "__asof_tag"
    fill_cols = [ts + suffix] + [c + suffix for c in ref_value_cols]

    ref_side = ref.select(
        *on,
        F.col(ts).alias(ts),
        F.col(ts).alias(ts + suffix),
        *[F.col(c).alias(c + suffix) for c in ref_value_cols],
        F.lit(0).alias(tag),
    )
    probe_cols = probe.columns
    probe_side = probe.select(
        *probe_cols,
        *[F.lit(None).cast(ref_side.schema[c].dataType).alias(c) for c in fill_cols],
        F.lit(1).alias(tag),
    )
    unioned = probe_side.unionByName(ref_side, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col(tag).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: list[Column] = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols
    ]
    return (
        unioned.select(*probe_cols, tag, *filled)
        .filter(F.col(tag) == 1)
        .drop(tag)
    )
