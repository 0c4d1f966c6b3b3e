"""Range / remap / classification expression builders -- the WRO core.

The reference stores a classification as parallel lists: N half-open
ranges ``[min_i, max_i)``, N suitability outputs 0-9, N labels
(``WROS/Weighted Raster Overlay Service.pyt:1119-1138``), with the last
bound bumped one past the data max (``.pyt:934-936``) so the max value
itself falls in the final range. Remap semantics
(``UpdateWROClassification.pyt.xml:2``): cell value v in ``[min_i, max_i)``
-> ``out_i``; suitability domain 0-9, default 5 (``.pyt:86-87, 969-972``).

Everything here builds *column expressions* (CASE chains, struct arrays) --
JVM-side, whole-stage-codegen friendly. No UDFs, no driver-side loops over
data; literal range lists are classification metadata (handfuls of rows),
never data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (lo, hi, out) triple: value in [lo, hi) -> out.
RangeTriple = tuple[float, float, int]


def remap_case(value: Column, ranges: list[RangeTriple]) -> Column:
    """R39: min-inclusive/max-exclusive CASE chain; unmatched -> NULL."""
    expr = F.lit(None).cast("int")
    for lo, hi, out in reversed(ranges):
        expr = F.when((value >= F.lit(lo)) & (value < F.lit(hi)), F.lit(out)).otherwise(
            expr
        )
    return expr


def remap_case_sql(value_expr: str, ranges: list[RangeTriple]) -> str:
    """The identical CASE chain as ANSI SQL (for DuckDB oracles)."""
    whens = " ".join(
        f"WHEN {value_expr} >= {lo} AND {value_expr} < {hi} THEN {out}"
        for lo, hi, out in ranges
    )
    return f"CASE {whens} ELSE NULL END"


def in_any_range(value: Column, ranges: list[tuple[float, float]]) -> Column:
    """R41 helper: true when value falls in any [lo, hi) -- NoData test."""
    expr = F.lit(False)
    for lo, hi in ranges:
        expr = expr | ((value >= F.lit(lo)) & (value < F.lit(hi)))
    return expr


def equal_interval_bounds(n_classes: int = 5):
    """R16 (``.pyt:895-938``): expression factory for np.linspace-style
    bounds. Returns (bin_expr_fn, bounds_fn):

    - ``bin_expr_fn(v, mn, mx)``: class index 0..n-1; the data max clamps
      into the last class (the reference's max+1 exclusive bound).
    - ``bounds_fn(i, mn, mx)``: (lo, hi) columns of class i, with
      ``hi = mx + 1`` for the last class (``.pyt:934-936``).

    Degenerate min==max (``.pyt:913-926``): one range ``[v, v+1)``; the
    bin expr yields 0 for every value, which matches.
    """

    def bin_expr(v: Column, mn: Column, mx: Column) -> Column:
        width = (mx - mn) / F.lit(n_classes)
        raw = F.floor((v - mn) / width).cast("int")
        return F.when(mx == mn, F.lit(0)).otherwise(
            F.least(raw, F.lit(n_classes - 1))
        )

    def bounds(i: int, mn: Column, mx: Column) -> tuple[Column, Column]:
        width = (mx - mn) / F.lit(n_classes)
        lo = mn + F.lit(i) * width
        hi = (mx + F.lit(1.0)) if i == n_classes - 1 else mn + F.lit(i + 1) * width
        return lo, hi

    return bin_expr, bounds


def unique_value_ranges(df: DataFrame, value_col: str) -> DataFrame:
    """R18/R19 (``.pyt:1012-1114``): distinct values -> consecutive
    half-open ranges ``[v_i, v_{i+1})``, final ``[v_n, v_n + 1)``.

    One shuffle for the distinct, one window over the (small) distinct
    set -- the distinct value count is classification cardinality, so the
    window's single partition is fine at any data scale.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col("lo"))
    return (
        df.select(F.col(value_col).cast("double").alias("lo"))
        .distinct()
        .select(
            "lo",
            F.coalesce(F.lead("lo").over(w), F.col("lo") + 1).alias("hi"),
        )
    )


def contiguity_errors(ranges_df: DataFrame, lo: str = "lo", hi: str = "hi") -> DataFrame:
    """R25 (``.pyt:199-217``): each range's max must equal the next
    range's min; returns the offending rows (empty == valid)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(lo))
    return (
        ranges_df.select(
            F.col(lo), F.col(hi), F.lead(lo).over(w).alias("next_lo"),
        )
        .filter(F.col("next_lo").isNotNull() & (F.col(hi) != F.col("next_lo")))
    )
