"""token_budget_mixture unit properties: budget adherence, strict-prefix
selection, partition-order independence, and weight rounding."""

from __future__ import annotations

from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.operators.mixture import (
    token_budget_mixture,
)
from weighted_raster_overlay_service_toolbox_spark.sources import load_table

from .conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_budgets_respected_and_unlisted_domains_dropped(spark):
    out = token_budget_mixture(
        _docs(spark), {"src0": 0.5, "src1": 0.5}, total_budget=400
    )
    rows = out.collect()
    assert rows, "fixture must yield at least one selected doc"
    assert {r["source"] for r in rows} <= {"src0", "src1"}
    per_src_max = {}
    for r in rows:
        per_src_max[r["source"]] = max(
            per_src_max.get(r["source"], 0), r["cum_tokens"]
        )
    for src, cum in per_src_max.items():
        assert cum <= 200, (src, cum)


def test_selection_is_partition_order_independent(spark):
    d = _docs(spark)
    w = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    a = sorted(map(tuple, token_budget_mixture(d, w, 2000).collect()))
    b = sorted(
        map(
            tuple,
            token_budget_mixture(d.repartition(13), w, 2000).collect(),
        )
    )
    assert a == b and a


def test_selection_is_a_strict_prefix_of_the_md5_order(spark):
    """Every selected doc precedes every unselected doc of the same
    domain in the md5 order -- no skip-and-continue (skipping would make
    selection depend on later docs and break incremental stability)."""
    d = _docs(spark).filter(F.col("source") == "src0")
    sel = {
        r["doc_id"]
        for r in token_budget_mixture(d, {"src0": 1.0}, 60).collect()
    }
    ordered = [
        r["doc_id"]
        for r in d.select(
            "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
        )
        .orderBy("h", "doc_id")
        .collect()
    ]
    assert sel, "budget of 60 tokens must admit at least one doc"
    k = len(sel)
    assert set(ordered[:k]) == sel


def test_fractional_budget_rounds_not_truncates(spark):
    """2000 * 0.3 is 599.99999999999997 in floats; the budget must be
    600, so a domain whose first docs sum to exactly 600 keeps them."""
    import pyspark.sql.types as T

    rows = [("a", "s", 600)]
    d = spark.createDataFrame(rows, "doc_id string, source string, nt int")
    out = token_budget_mixture(
        d, {"s": 0.3}, total_budget=2000, n_tokens=F.col("nt")
    ).collect()
    assert len(out) == 1 and out[0]["cum_tokens"] == 600
