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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join, inclusive at equal timestamps.

    ``direction``: "backward" (default) matches the reference row with
    the greatest ``ts`` <= probe ``ts``; "forward" the smallest ``ts``
    >= probe ``ts`` -- the pandas ``merge_asof`` directions, same single
    shuffle either way (only the window's sort order flips; ties still
    resolve ref-before-probe so both directions are inclusive).

    ``tolerance_seconds``: maximum |probe.ts - ref.ts| gap; a nearest
    match farther than this nulls out (exactly "no match within
    tolerance" -- applied AFTER the nearest-match window, which equals
    restricting the join window because the nearest match inside the
    tolerance IS the overall nearest when one exists).

    ``probe`` keeps all its columns; the matched reference row
    contributes ``ref_value_cols`` plus ``ts + suffix``. No match ->
    nulls. ``ref`` must be unique per (key, ts); pre-aggregate it
    otherwise.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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

    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col(tag).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: list[Column] = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols
    ]
    out = unioned.select(*probe_cols, tag, *filled).filter(F.col(tag) == 1).drop(tag)
    if tolerance_seconds is not None:
        gap = F.col(ts).cast("double") - F.col(ts + suffix).cast("double")
        if direction == "forward":
            gap = -gap
        ok = F.col(ts + suffix).isNotNull() & (gap <= F.lit(float(tolerance_seconds)))
        out = out.select(
            *probe_cols,
            *[F.when(ok, F.col(c)).otherwise(F.lit(None)).alias(c) for c in fill_cols],
        )
    return out
