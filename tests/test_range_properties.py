"""Property-based tests (SURVEY.md section 5.4) for the classification
kernels: remap totality over contiguous ranges, and equal-interval bins
partitioning [min, max+1). Hypothesis drives value generation; each
property evaluates the real column expressions on a Spark DataFrame."""

from __future__ import annotations


from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.functions.ranges import (
    equal_interval_bounds,
    remap_case,
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(
    bounds=st.lists(finite, min_size=2, max_size=6, unique=True),
    values=st.lists(finite, min_size=1, max_size=10),
)
@settings(max_examples=25, deadline=None)
def test_remap_totality_over_contiguous_ranges(spark, bounds, values):
    """With contiguous ranges covering [b0, bn), a value maps to a non-null
    suitability IFF it lies inside [b0, bn) -- totality within coverage,
    null outside (the reference's half-open semantics,
    UpdateWROClassification.pyt.xml)."""
    bs = sorted(bounds)
    ranges = [(bs[i], bs[i + 1], i % 10) for i in range(len(bs) - 1)]
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    got = df.select("v", remap_case(F.col("v"), ranges).alias("out")).collect()
    for r in got:
        inside = bs[0] <= r["v"] < bs[-1]
        if inside:
            expected = next(
                out for lo, hi, out in ranges if lo <= r["v"] < hi
            )
            assert r["out"] == expected, (r, ranges)
        else:
            assert r["out"] is None, (r, ranges)


@given(
    lo=finite,
    width=st.floats(min_value=1e-3, max_value=1e6, allow_nan=False),
    values=st.lists(st.floats(0, 1), min_size=1, max_size=10),
)
@settings(max_examples=25, deadline=None)
def test_equal_interval_partitions_min_to_max(spark, lo, width, values):
    """Every value in [min, max] lands in exactly one of the n classes,
    the data max in the last class (the reference's max+1 bound,
    .pyt:934-936)."""
    hi = lo + width
    bin_expr, bounds = equal_interval_bounds(5)
    vals = [lo + f * width for f in values] + [lo, hi]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = df.select(
        "v", bin_expr(F.col("v"), F.lit(lo), F.lit(hi)).alias("idx")
    ).collect()
    for r in got:
        assert 0 <= r["idx"] <= 4, r
        # exact equality: isclose's relative tolerance wrongly matches
        # mid-bin values when width is tiny relative to the magnitude
        if r["v"] == hi:
            assert r["idx"] == 4, f"data max must land in last class: {r}"
