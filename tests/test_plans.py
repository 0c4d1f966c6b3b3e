"""Physical-plan assertions (SURVEY.md section 4): the properties that make
these plans survive a 100x scale-up. Checked against the formatted explain
output -- projection pruning must reach the parquet ReadSchema, key
predicates must appear in PushedFilters, dimension joins must broadcast,
and hot-path operators must stay inside WholeStageCodegen (no Python UDFs
in relational/WRO queries)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from weighted_raster_overlay_service_toolbox_spark.queries import QUERIES

from .conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_projection_reaches_scan(spark):
    """q_scan_prune must read 2 columns, not 11 (ReadSchema pruning)."""
    plan = plan_of(spark, "q_scan_prune")
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_shipdate" not in read


def test_filter_pushed_to_parquet(spark):
    """q_scan_filter_pushdown's key predicate must reach PushedFilters."""
    plan = plan_of(spark, "q_scan_filter_pushdown")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any("IsNotNull" in l or "EqualTo" in l or "GreaterThan" in l
                          for l in pushed), plan


def test_dimension_join_broadcasts(spark):
    """orders x customer: the dimension side must broadcast (no sort-merge
    shuffle of the fact table against a tiny dim)."""
    plan = plan_of(spark, "q_join_inner")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_wro_overlay_stays_jvm_side(spark):
    """The reference-core overlay pipeline must contain no Python UDF eval
    (BatchEvalPython/ArrowEvalPython) -- remap/overlay are pure column
    expressions inside codegen."""
    for name in ("q_wro_remap", "q_wro_overlay", "q_wro_equal_interval"):
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"
        # (codegen-id annotations are absent from AQE's pre-execution
        # formatted plan, so "no Python eval" is the checkable property)


def test_topk_is_take_ordered(spark):
    """q_topk must be TakeOrderedAndProject, not a global sort + limit."""
    plan = plan_of(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_agg_has_partial_phase(spark):
    """Grouped agg must do map-side partial aggregation before the
    shuffle (HashAggregate appears both sides of the exchange)."""
    plan = plan_of(spark, "q_agg_group")
    assert plan.count("HashAggregate") >= 2, plan


def test_simhash_pairing_is_blocked_equi_join(spark):
    """q_simhash's pairing must be a banded equi-join (shuffle keyed by
    band), never an all-pairs nested-loop/cartesian join -- the one
    round-1 scale-killer (VERDICT.md 'What's wrong' #3)."""
    plan = plan_of(spark, "q_simhash")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "band_val" in plan, plan  # equi-join key reached the plan


def test_bucket_pruning_selects_one_bucket(spark):
    """q_scan_bucket_pruned's equality predicate on the bucketing column
    must prune to 1 of 8 bucket files before any I/O, and the
    bucket-keyed aggregate must need no exchange."""
    plan = plan_of(spark, "q_scan_bucket_pruned")
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    assert "Exchange" not in plan, plan


def test_zorder_key_is_narrow_codegen(spark):
    """q_zorder_layout's Morton key must stay a pure projection: no
    exchange (it is a per-row layout key, shuffle-free by design) and no
    Python UDF -- the interleave is a bitwise expression chain inside
    whole-stage codegen."""
    plan = plan_of(spark, "q_zorder_layout")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "* Project" in plan, plan  # '*' = inside WholeStageCodegen


def test_dedup_cluster_edges_are_banded_not_all_pairs(spark):
    """q_dedup_clusters' edge generator (the plan that runs BEFORE the
    localCheckpoint truncates lineage) must be the banded two-phase shape:
    LSH candidates joined on (band_idx, band_hash), exact verify on
    candidates only -- never a token-keyed all-pairs self-join and never
    a cartesian/nested-loop product (VERDICT.md r3 'Next round' #3)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from weighted_raster_overlay_service_toolbox_spark.operators.dedup import (
        minhash_verified_edges,
    )
    from weighted_raster_overlay_service_toolbox_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 500)
    edges = minhash_verified_edges(
        d, "doc_id", F.array_distinct(F.split("text", " ")), threshold=0.9
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        edges.explain("formatted")
    plan = buf.getvalue()
    assert "band_hash" in plan, plan  # the LSH bucket key reached the join
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dedup_library_ops_carry_no_doc_cardinality_broadcast_hint(spark):
    """Round-7 fix (VERDICT r6 'What's wrong' #2): minhash_verified_edges
    and jaccard_pairs are library operators whose token-set / set-size
    sides are DOC-cardinality -- pipeline.curate_corpus feeds the full
    surviving corpus through them, so a forced broadcast OOMs every
    executor at 100 TB. The logical plan must carry NO broadcast hint on
    those sides; Catalyst/AQE may still CHOOSE broadcast from size stats
    at fixture scale (size-based, revocable -- the r5 hint rule). The
    vocab-sized hot-token filter keeps its hint per the pinned vocab-join
    convention, so jaccard_pairs is checked in its default (uncapped)
    form."""
    from pyspark.sql import functions as F

    from weighted_raster_overlay_service_toolbox_spark.operators.dedup import (
        jaccard_pairs,
        minhash_verified_edges,
    )
    from weighted_raster_overlay_service_toolbox_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 500)
    edges = minhash_verified_edges(
        d, "doc_id", F.array_distinct(F.split("text", " ")), threshold=0.9
    )
    logical = edges._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "ResolvedHint" not in logical, logical

    tok = d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))))
    pairs = jaccard_pairs(tok.toDF("doc_id", "tok"))
    logical = pairs._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "ResolvedHint" not in logical, logical


def test_partition_pruning_on_partitioned_layout(spark):
    """Date-partitioned layout + date filter => PartitionFilters prunes
    directories before any I/O -- the 100 TB layout for events/cells
    (SURVEY.md section 4 posture)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from weighted_raster_overlay_service_toolbox_spark.sources import load_table

    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), ".scratch", "events_by_day"
    )
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(path)

    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-01")
    plan = ""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "day" in pf[0], plan
    # correctness: pruned read equals a post-hoc filter of the full table
    want = ev.filter(F.col("day") == "2024-01-01").count()
    assert back.count() == want


def test_sink_partitioned_query_prunes(spark):
    """q_sink_partitioned's readback must prune to the one matching
    partition directory (PartitionFilters on o_orderpriority)."""
    plan = plan_of(spark, "q_sink_partitioned")
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "o_orderpriority" in pf[0], plan


def test_bucketed_join_query_avoids_exchange(spark):
    """q_join_bucketed: both sides pre-bucketed on the join key; the
    physical plan must not shuffle either side (no Exchange). Catalyst may
    pick broadcast for the small side -- also shuffle-free -- so assert
    the absence of Exchange rather than a specific join strategy."""
    plan = plan_of(spark, "q_join_bucketed")
    assert "Exchange" not in plan or "BroadcastExchange" in plan, plan
    assert "ShuffleExchange" not in plan.replace(
        "Exchange hashpartitioning", "ShuffleExchange"
    ), plan


def test_scan_dpp_has_dynamic_pruning(spark):
    """q_scan_dpp: the dim-side filter must reach the fact scan as a
    dynamicpruningexpression in PartitionFilters -- runtime directory
    skipping through the join, not a static filter."""
    plan = plan_of(spark, "q_scan_dpp")
    assert "dynamicpruning" in plan.lower(), plan
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "l_returnflag" in pf[0], plan


def test_corpus_pipeline_keep_one_is_windowed_not_broadcast_join(spark):
    """q_corpus_pipeline's fingerprint dedup (round 5): the keep-one must
    be a window rank with WindowGroupLimit pushed BELOW the fp exchange
    (each map task prunes to its local top-1 per fingerprint before the
    shuffle), never the old min-agg + broadcast join of the
    corpus-cardinality winner set."""
    plan = plan_of(spark, "q_corpus_pipeline")
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan, plan
    # partial (pre-shuffle) + final (post-shuffle) pruning = two instances
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_retention_cohorts_has_no_forced_broadcast(spark):
    """q_retention_cohorts (round 5): the first-seen side is
    user-cardinality; the logical plan must carry NO broadcast hint --
    Catalyst may still CHOOSE broadcast from size stats at fixture scale
    (that's the point: size-based, revocable at 100 TB, not forced)."""
    df = QUERIES["q_retention_cohorts"](spark, SF_SMOKE)
    logical = df._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "ResolvedHint" not in logical, logical


def test_unigram_logprob_vocab_join_broadcasts(spark):
    """q_unigram_logprob's vocab join must be a broadcast hash join (the
    unigram table is vocabulary-sized), never a shuffled sort-merge join
    of the full token stream against the vocab."""
    plan = plan_of(spark, "q_unigram_logprob")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_single_shard_shuffle(spark):
    """q_pack_sequences shuffles exactly once -- the shard-key exchange
    feeding applyInPandas; the greedy walk itself adds no further
    exchange."""
    plan = plan_of(spark, "q_pack_sequences")
    physical = plan.split("== Physical Plan ==")[-1].split("=====")[0]
    # exactly one hash partitioning -- the shard-key exchange
    assert physical.count("hashpartitioning") == 1, physical
    assert "FlatMapGroupsInPandas" in plan


def test_tpch_q1_partial_agg_single_exchange(spark):
    """q_tpch_q1: the shipdate predicate must reach PushedFilters and the
    plan must map-side combine -- exactly one exchange, fed by a partial
    HashAggregate (each task reduces its split to <= 6 rows before the
    shuffle)."""
    plan = plan_of(spark, "q_tpch_q1")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any("l_shipdate" in l for l in pushed), plan
    import re

    # formatted explain prints each node in the tree AND a detail section;
    # count the "(n) Exchange" detail headers for an exact node count.
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1, plan


def test_tpch_derived_partsupp_scans_fact_once(spark):
    """q_tpch_q2/q15/q20: the per-group (min/total/max) comparison must be
    a window over the DERIVED relation, not an aggregate + self-join that
    plans the fact-scan subtree twice. Pinned structurally: exactly one
    lineitem scan in the optimized plan (no reliance on AQE exchange
    reuse, which column pruning defeats -- observed on the executed plan
    of the two-branch Q15 form)."""
    for name in ("q_tpch_q2", "q_tpch_q15", "q_tpch_q20"):
        plan = plan_of(spark, name)
        assert plan.count("lineitem.parquet") == 1, f"{name}: {plan}"


def test_derived_aggregate_rewrites_scan_fact_once(spark):
    """Round-6 sweep of the remaining derived-aggregate-join-back
    queries whose RUNTIME plans showed a genuine double fact scan (AQE
    exchange reuse did rescue q_subquery_scalar and q_tpch_q11; it did
    NOT rescue these). Each is now a single-scan form: window aggregates
    (zscore moments, retention cohort, Q17 threshold, Q18 HAVING),
    conditional aggregation (funnel steps), or a one-pass rule fold
    (dq_checks). Pinned structurally: one fact scan in the optimized
    plan."""
    for name, table in (
        ("q_outliers_zscore", "events"),
        ("q_retention_cohorts", "events"),
        ("q_funnel_ordered", "events"),
        ("q_dq_checks", "orders"),
        ("q_tpch_q17", "lineitem"),
        ("q_tpch_q18", "lineitem"),
    ):
        plan = plan_of(spark, name)
        assert plan.count(f"{table}.parquet") == 1, f"{name}: {plan}"


def test_join_multikey_scans_fact_once(spark):
    """q_join_multikey (round-6 rewrite): "last line per order" must be a
    window max over l_orderkey, not a groupBy + self-join that plans the
    lineitem scan twice -- the same derived-relation lesson as
    test_tpch_derived_partsupp_scans_fact_once. Pinned structurally:
    exactly one lineitem scan in the optimized plan."""
    plan = plan_of(spark, "q_join_multikey")
    assert plan.count("lineitem.parquet") == 1, plan


def test_tpch_q21_semi_and_anti_joins(spark):
    """q_tpch_q21: EXISTS must plan as a LeftSemi and NOT EXISTS as a
    LeftAnti -- never an inner join + distinct (duplicate inflation) or
    a correlated re-execution."""
    plan = plan_of(spark, "q_tpch_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan


def test_interval_join_is_binned_equi_join(spark):
    """q_interval_join_binned: the +-60s temporal join must plan as an
    EQUI-join on the bin key (hash-partitionable), never a
    CartesianProduct / BroadcastNestedLoopJoin quadratic theta-join."""
    plan = plan_of(spark, "q_interval_join_binned")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_gapfill_scans_fact_once_at_runtime(spark):
    """q_timeseries_gapfill references its per-cell count table three
    times (counts, bounds, type list); the non-eager localCheckpoint
    must collapse that to ONE events scan at runtime -- the final
    adaptive plan reads the checkpointed grid-cardinality RDD, not the
    fact, for the derived references."""
    df = QUERIES["q_timeseries_gapfill"](spark, SF_SMOKE)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("events.parquet") <= 1, final


def test_dedup_bloom_scans_documents_twice_at_runtime(spark):
    """q_dedup_bloom's pinned fp index + word table must hold the plan
    at exactly TWO documents scans (batch + index) at runtime -- the
    unpinned form re-planned the scan -> fingerprint -> distinct subtree
    per Bloom probe join (9 scans / 14 exchanges measured before the
    pin). Two scans is the q_dedup_incremental convention: batch and
    index are separate relations by design (different storage in
    production)."""
    df = QUERIES["q_dedup_bloom"](spark, SF_SMOKE)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("documents.parquet") <= 2, final


def test_pagerank_scans_fact_once_at_runtime(spark):
    """q_pagerank derives its edge list from the fact once: the
    checkpoint on `edges` must prevent fan/nodes from independently
    re-running the lineitem-join-orders subtree (exchange reuse cannot
    span separate RDD materializations)."""
    df = QUERIES["q_pagerank"](spark, SF_SMOKE)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("lineitem.parquet") <= 1, final


def test_interval_join_scans_fact_once_at_runtime(spark):
    """q_interval_join_binned: both join sides read the ONE
    checkpointed (event_id, us, bin) projection; the self-anchored
    conditional-sum form needs no third scan for zero-concurrency
    events."""
    df = QUERIES["q_interval_join_binned"](spark, SF_SMOKE)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("events.parquet") <= 1, final


def _runtime_scan_count(spark, name: str, table: str) -> int:
    df = QUERIES[name](spark, SF_SMOKE)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    return final.count(f"{table}.parquet")


def test_text_corpus_queries_scan_documents_once_at_runtime(spark):
    """Round-6 shared-projection fix: q_tfidf (tf/df/N), q_approx_topk
    (sketch + exact yardstick), q_decontaminate (ev/tr/anti) and
    q_unigram_logprob (vocab/total/score) each referenced `documents`
    2-3x; the non-eager localCheckpoint on the shared narrow projection
    must collapse that to ONE corpus scan at runtime -- at 100 TB a 3x
    scan is 3x the I/O bill."""
    for name in (
        "q_tfidf",
        "q_approx_topk",
        "q_decontaminate",
        "q_unigram_logprob",
        "q_rare_token_ratio",
    ):
        assert _runtime_scan_count(spark, name, "documents") <= 1, name


def test_banded_self_joins_scan_corpus_once_at_runtime(spark):
    """q_dedup_minhash / q_simhash: the banded-signature self-join must
    read ONE checkpointed signature relation, not replan the
    docs -> tokens -> signature subtree (and its corpus scan) per join
    side. The cached relation is signature-sized -- a few longs per
    banded row, never the text."""
    for name in ("q_dedup_minhash", "q_simhash"):
        assert _runtime_scan_count(spark, name, "documents") <= 1, name


def test_semantic_dedup_scans_embeddings_once_at_runtime(spark):
    """q_semantic_dedup (round 7): the k-means assignment relation feeds
    BOTH cluster-self-join sides and the anti-join base; un-pinned, each
    consumer replans the scan -> assign subtree (3 embeddings scans in
    the static audit). The non-eager localCheckpoint pin must hold the
    runtime count at one."""
    assert _runtime_scan_count(spark, "q_semantic_dedup", "embeddings") <= 1


def test_triangle_count_degree_join_carries_no_broadcast_hint(spark):
    """Round-9 fix (VERDICT r8 'What's wrong' #2): the degree table is
    vertex-cardinality -- distinct co-purchased parts, which grows
    linearly with the catalog -- so forcing it broadcast is the same
    class of scale bug as the r6 minhash-edges hints. The logical plan
    must carry NO broadcast hint anywhere; AQE may still choose
    broadcast from size stats at fixture scale (size-based, revocable).
    Same pin shape as
    test_dedup_library_ops_carry_no_doc_cardinality_broadcast_hint."""
    from weighted_raster_overlay_service_toolbox_spark.queries import QUERIES

    df = QUERIES["q_triangle_count"](spark, SF_SMOKE)
    logical = df._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "ResolvedHint" not in logical, logical


def test_semantic_dedup_default_is_bounded_auto_cap(spark):
    """Round-9 fix (VERDICT r8 'What's wrong' #1): the registry default
    for semantic_dedup must be the BOUNDED path -- max_block="auto"
    derives clamp(ceil(2n/k), 256, 1024) from the occupancy census, so
    total pair work is <= n * 1024 / 2 (linear) instead of the measured
    14.8x-on-10x-data uncapped blowup. Three pins: (a) the signature
    default IS "auto"; (b) auto equals the explicitly-computed clamp
    value row-for-row (the census derivation is exact, not heuristic);
    (c) the striping actually engages -- with a cap below the largest
    cluster, auto and uncapped genuinely diverge on a forced fixture."""
    import inspect

    from pyspark.sql import functions as F

    from weighted_raster_overlay_service_toolbox_spark.operators.similarity import (
        AUTO_BLOCK_MAX,
        AUTO_BLOCK_MIN,
        semantic_dedup,
    )
    from weighted_raster_overlay_service_toolbox_spark.sources import load_table

    assert (
        inspect.signature(semantic_dedup).parameters["max_block"].default == "auto"
    )

    v = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    n = v.count()
    k = 8
    explicit = min(AUTO_BLOCK_MAX, max(AUTO_BLOCK_MIN, -(-2 * n // k)))
    auto_rows = sorted(
        semantic_dedup(v, k=k, max_block="auto").collect()
    )
    assert auto_rows == sorted(
        semantic_dedup(v, k=k, max_block=explicit).collect()
    )
    # (c) on a fixture whose one hot cluster exceeds the cap, the lanes
    # separate an adjacent near-dup pair the uncapped form catches: ids
    # stripe round-robin, so with cap=1 every pair is cross-lane.
    hot = v.filter(F.col("vec_id") < 40)
    capped = {r.vec_id for r in semantic_dedup(hot, k=2, max_block=1).collect()}
    uncapped = {r.vec_id for r in semantic_dedup(hot, k=2, max_block=None).collect()}
    assert uncapped <= capped and len(capped) >= len(uncapped)


def test_knn_edges_default_is_bounded_auto_cap(spark):
    """Round-9 generalization of the semantic-dedup bounded default
    (VERDICT r8 #1) to the OTHER within-block pair operator: the mutual
    kNN edge construction must default to the occupancy-census lane cap
    -- pair work <= n * AUTO_BLOCK_MAX even when the plane count lags
    the corpus (the sf1r table's 30x entry; measured bounded 21.8s vs
    38.0s uncapped at sf1r). Pins mirror the semantic-dedup test:
    signature default "auto"; auto == uncapped at fixture scale (every
    bucket under the cap => lanes provably never engage, so fixture
    results are unchanged); a forced small cap genuinely engages."""
    import inspect

    from weighted_raster_overlay_service_toolbox_spark.queries.llm import (
        _mutual_knn_edges,
    )

    assert (
        inspect.signature(_mutual_knn_edges).parameters["max_block"].default
        == "auto"
    )
    auto, _ = _mutual_knn_edges(spark, SF_SMOKE)
    unc, _ = _mutual_knn_edges(spark, SF_SMOKE, max_block=None)
    auto_rows = sorted(map(tuple, auto.collect()))
    assert auto_rows == sorted(map(tuple, unc.collect()))
    capped, _ = _mutual_knn_edges(spark, SF_SMOKE, max_block=8)
    assert sorted(map(tuple, capped.collect())) != auto_rows


def test_entity_resolution_default_is_bounded_auto_cap(spark):
    """Round-10 fix (VERDICT r9 'What's wrong' #2 / 'Next round' #3):
    the THIRD instance of the occupancy-census lane-cap rule -- the
    blocked-levenshtein pair space must be bounded by default.
    q_entity_resolution ships max_block="auto" = clamp(ceil(2n/B),
    256, 1024) derived from the blocking census (n rows, B blocks),
    with oversize blocks striped into id-round-robin lanes and pairs
    forming same-lane only (pair work <= n * 1024 / 2, linear; the r9
    sf1r fixed-name regime measured 41x on 10x data uncapped). Pins
    mirror the semantic-dedup / kNN tests: (a) signature default is
    "auto"; (b) auto == uncapped at fixture scale (every block under
    the 256 floor => lanes provably never engage => the census stays
    exact); (c) a forced cap below the largest block genuinely engages
    and only shrinks pair counts (per-lane sums under-count, never
    over-count)."""
    import inspect

    from weighted_raster_overlay_service_toolbox_spark.queries.extended import (
        q_entity_resolution,
    )

    assert (
        inspect.signature(q_entity_resolution).parameters["max_block"].default
        == "auto"
    )
    auto = sorted(map(tuple, q_entity_resolution(spark, SF_SMOKE).collect()))
    unc = sorted(
        map(tuple, q_entity_resolution(spark, SF_SMOKE, max_block=None).collect())
    )
    assert auto == unc
    capped = sorted(
        map(tuple, q_entity_resolution(spark, SF_SMOKE, max_block=1).collect())
    )
    assert capped != auto
    # blocks and record counts are cap-invariant; pair counts only shrink
    by_block_auto = {(r[0], r[1]): r[2:] for r in auto}
    by_block_capped = {(r[0], r[1]): r[2:] for r in capped}
    assert set(by_block_auto) == set(by_block_capped)
    for k, (n_rec, n_pairs, n_exact, n_near) in by_block_auto.items():
        c_rec, c_pairs, c_exact, c_near = by_block_capped[k]
        assert c_rec == n_rec
        assert c_pairs <= n_pairs and c_exact <= n_exact and c_near <= n_near


def test_knn_planes_auto_equals_pinned_four_at_fixture_scale(spark):
    """Round-10 (VERDICT r9 #5): n_planes="auto" is the production
    default for the mutual-kNN construction -- planes grow
    clamp(ceil(log2(n/256)), 4, 16) with the corpus, derived from the
    SAME broadcast occupancy census as the lane cap (a column mask over
    a 16-bit sign code, no driver-side count). The registry oracles
    inline 4-plane literals, so the pin that keeps them exact: at
    fixture scale (<= 4096 vectors) auto MUST equal the explicit
    4-plane construction bit-for-bit. Also pins the signature default
    and the sizing constants the docstring promises (20k vectors ->
    7 planes, the r9 sf1r measurement's knob)."""
    import inspect
    import math

    from weighted_raster_overlay_service_toolbox_spark.queries.llm import (
        AUTO_PLANES_MAX,
        AUTO_PLANES_MIN,
        AUTO_PLANES_TARGET,
        _mutual_knn_edges,
    )

    assert (
        inspect.signature(_mutual_knn_edges).parameters["n_planes"].default
        == "auto"
    )

    def expected_planes(n: int) -> int:
        return min(
            AUTO_PLANES_MAX,
            max(AUTO_PLANES_MIN, math.ceil(math.log2(n / AUTO_PLANES_TARGET))),
        )

    assert expected_planes(500) == 4
    assert expected_planes(2000) == 4
    assert expected_planes(4096) == 4
    assert expected_planes(20000) == 7

    auto, _ = _mutual_knn_edges(spark, SF_SMOKE)
    four, _ = _mutual_knn_edges(spark, SF_SMOKE, n_planes=4)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, four.collect())
    )


def test_global_rank_queries_have_no_single_partition_window(spark):
    """q_win_percent_rank / q_logprob_strata (re-planned round 14,
    VERDICT r13 #2-3): the two former fact-sized unpartitioned windows
    -- the last scale-killer class -- must now rank through the
    two-pass range-partitioned form (operators/rank.py global_rank).
    Pin: every Window node in the EXECUTED plan carries a partition
    spec (the windowspecdefinition's first argument is the range
    partition id, not an ordering column), i.e. no "moving all data to
    a single partition" reducer anywhere. q_perplexity_buckets (late
    r14) joined the list: its per-source terciles derive from ONE
    global_rank over (source, score, doc_id), never a per-source
    NTILE window (corpus/|sources|-sized partitions -- the same class
    divided by a small enum)."""
    import re

    for name in (
        "q_win_percent_rank",
        "q_logprob_strata",
        "q_perplexity_buckets",
    ):
        df = QUERIES[name](spark, SF_SMOKE)
        df.collect()
        final = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        for line in final.splitlines():
            m = re.search(r"windowspecdefinition\(([^)]*)\)", line)
            if m is None:
                continue
            spec = m.group(1)
            assert spec.split(",")[0].strip().startswith("_rank_pid"), (
                name,
                line.strip(),
            )


def test_global_rank_matches_single_reducer_row_number(spark):
    """operators/rank.py global_rank == row_number() OVER (ORDER BY ...)
    for a unique total order, regardless of where the sampled range
    boundaries fall (unit pin for the rank rewrites), and the total-count
    byproduct matches."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from weighted_raster_overlay_service_toolbox_spark.operators.rank import (
        global_rank,
    )
    from weighted_raster_overlay_service_toolbox_spark.sources import (
        load_table,
    )

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    keys = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    ranked, n = global_rank(o, keys, rank_col="r", num_partitions=7)
    ref = o.select(
        "o_orderkey",
        F.row_number().over(Window.orderBy(*keys)).cast("long").alias("r_ref"),
    )
    joined = ranked.join(ref, "o_orderkey")
    assert joined.filter(F.col("r") != F.col("r_ref")).count() == 0
    assert n == o.count()


def test_global_rank_empty_input(spark):
    """Zero-row input: global_rank returns an empty relation and n=0
    (no partition fires, offsets are empty)."""
    from pyspark.sql import functions as F

    from weighted_raster_overlay_service_toolbox_spark.operators.rank import (
        global_rank,
    )

    empty = spark.createDataFrame([], "k long, v double")
    ranked, n = global_rank(empty, [F.col("v").asc(), F.col("k").asc()])
    assert n == 0
    assert ranked.count() == 0
