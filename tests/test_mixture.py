"""token_budget_mixture unit properties: budget adherence, strict-prefix
selection, partition-order independence, and weight rounding -- plus the
salted mega-domain variant (budget conservation across lanes, n_salts=1
identity, within-lane prefix stability)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.operators.mixture import (
    _lane_budgets,
    salted_token_budget_mixture,
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


@given(
    budget=st.integers(min_value=0, max_value=10**15),
    n=st.integers(min_value=1, max_value=1024),
)
def test_lane_budgets_conserve_exactly(budget, n):
    """The salt split must neither create nor lose budget: lane budgets
    sum to the domain budget for ANY (budget, n), and no two lanes
    differ by more than one token."""
    lanes = _lane_budgets(budget, n)
    assert len(lanes) == n
    assert sum(lanes) == budget
    assert max(lanes) - min(lanes) <= 1


def test_salted_with_one_salt_is_identical_to_unsalted(spark):
    """n_salts=1 degenerates to token_budget_mixture exactly (same order
    key, same budget, one lane) -- the drop-in guarantee."""
    d = _docs(spark)
    w = {"src0": 0.4, "src1": 0.3, "src2": 0.3}
    plain = sorted(
        (r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"])
        for r in token_budget_mixture(d, w, 2000).collect()
    )
    salted = sorted(
        (r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"])
        for r in salted_token_budget_mixture(d, w, 2000, n_salts=1).collect()
    )
    assert plain == salted and plain


def test_salted_respects_per_domain_budget_and_lane_assignment(spark):
    """With real salting: (a) each domain's selected-token total stays
    within its rounded budget; (b) every row's lane is the portable-hash
    lane of its id (function of the id ALONE -- rerun/partition stable);
    (c) selection is partition-order independent."""
    d = _docs(spark)
    w = {"src0": 0.5, "src1": 0.5}
    out = salted_token_budget_mixture(d, w, 1000, n_salts=4)
    rows = out.collect()
    assert rows
    per_src: dict[str, int] = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + r["n_tokens"]
        assert 0 <= r["lane"] < 4
    for src, total in per_src.items():
        assert total <= 500, (src, total)
    # lane must equal the portable hash of the id, computed independently
    import hashlib

    for r in rows[:50]:
        h = int(
            hashlib.md5(f"lane:{r['doc_id']}".encode()).hexdigest()[:15], 16
        )
        assert r["lane"] == h % 4, r
    again = salted_token_budget_mixture(d.repartition(17), w, 1000, n_salts=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_salted_selection_is_a_prefix_within_each_lane(spark):
    """Within every (domain, lane) partition the selected docs precede
    every unselected doc of that lane in md5 order -- the strict-prefix
    incremental-stability contract, preserved lane-by-lane."""
    d = _docs(spark).filter(F.col("source") == "src0")
    out = salted_token_budget_mixture(d, {"src0": 1.0}, 120, n_salts=3)
    sel_by_lane: dict[int, set] = {}
    for r in out.collect():
        sel_by_lane.setdefault(r["lane"], set()).add(r["doc_id"])
    assert sel_by_lane, "budget of 120 tokens must admit at least one doc"
    import hashlib

    ordered_all = [
        r["doc_id"]
        for r in d.select(
            "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
        )
        .orderBy("h", "doc_id")
        .collect()
    ]
    for lane, sel in sel_by_lane.items():
        lane_order = [
            i
            for i in ordered_all
            if int(hashlib.md5(f"lane:{i}".encode()).hexdigest()[:15], 16) % 3
            == lane
        ]
        k = len(sel)
        assert set(lane_order[:k]) == sel, lane


def test_salted_per_domain_salt_dict_defaults_to_one(spark):
    """A per-domain dict salts only the named mega-domain; unnamed
    domains run unsalted (one lane, full domain budget)."""
    d = _docs(spark)
    w = {"src0": 0.5, "src1": 0.5}
    out = salted_token_budget_mixture(d, w, 1000, n_salts={"src0": 4})
    lanes = {
        r["source"]: set()
        for r in out.select("source").distinct().collect()
    }
    for r in out.collect():
        lanes[r["source"]].add(r["lane"])
    assert lanes.get("src1", {0}) == {0}
    assert len(lanes.get("src0", set())) > 1, lanes
