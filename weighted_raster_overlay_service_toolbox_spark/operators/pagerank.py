"""Quantized PageRank: an exact-arithmetic iterative graph operator.

Scores are fixed-point BIGINTs (BASE = 1e9 "rank units") and every step
is integer arithmetic -- ``score DIV outdeg`` per edge, then
``RESET + (sum * damping_num) DIV damping_den`` per node -- so the
result is bit-identical regardless of partitioning, join order, or
engine (floating-point PageRank is not: double summation order changes
low bits, and 0.85 * x differs in the last ulp across engines). This is
the same integer-quantization recipe that made k-means and the custom
stateful streaming operator oracle-checkable (SURVEY.md round-5 notes).

100 TB design: per iteration, one hash join of the rank vector against
the (src-keyed) edge list and one groupBy(dst) aggregation -- the
textbook distributed PageRank step, all map-side combinable. The edge
list with out-degrees is computed once and reused across iterations;
``localCheckpoint`` (non-eager) truncates lineage each round so the plan
does not grow with the iteration count (the same treatment as
``graph.connected_components``). Dangling-node mass is handled by the
reset term only (nodes with no in-edges coalesce to RESET), matching
the unrolled-CTE oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: 1.0 of rank == 1e9 units.
BASE = 1_000_000_000


def pagerank_quantized(
    edges: DataFrame,
    iterations: int = 4,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list.

    ``edges`` must have string columns ``src`` and ``dst`` (pre-deduped;
    parallel edges count double by design). Returns ``(node, score)``
    with ``score`` in BASE-scaled fixed point. ``iterations`` is a
    constant, so the computation unrolls to a fixed dataflow -- which is
    exactly what makes it expressible as a chained-CTE SQL oracle.

    ``checkpoint_every`` (round 13, VERDICT r12 #6): lineage-truncation
    CADENCE for the rank vector. r12's scaling probe flagged 8.12x per
    10x-row decade; a stage-split profile (PLANS.md round 13) showed
    the edge derivation and the join/agg iterations scale fine -- the
    cost driver was the EVERY-ITERATION localCheckpoint, which forces
    each iteration into its own materialized job instead of letting
    Catalyst/AQE plan the unrolled dataflow as one (min-of-3 at the
    12M-edge sf1r fixture: every-1 34.8s, every-2 28.2s, every-4
    15.0s; identical scores -- checkpointing never affects values,
    only lineage). Default 4 pins once per four iterations: the plan
    between pins is 4 joins+aggs deep (bounded, AQE-optimizable), the
    decade ratio drops from 6.6x to ~2.5x raw (~1x sentinel-
    normalized), and a long-iteration caller still cannot grow the
    plan without bound. Set 1 to restore the old always-pin behavior
    for memory-tight clusters where mid-loop recompute-on-failure
    matters more than wall-clock."""
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
            " (the final iteration always pins; there is no"
            " never-checkpoint mode)"
        )
    reset = (BASE * (damping_den - damping_num)) // damping_den
    # checkpoint the EDGE LIST itself first: fan and nodes are separate
    # materializations, and without this each would independently re-run
    # the (possibly fact-sized) edge-derivation subtree -- exchange reuse
    # does not span separate RDD materializations.
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    fan = edges.join(deg, "src").localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    zeros = nodes.select("node", F.lit(0).cast("long").alias("c"))
    ranks = nodes.select("node", F.lit(BASE).cast("long").alias("score"))
    for it in range(iterations):
        contrib = fan.join(ranks, fan["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            F.expr("score DIV outdeg").alias("c"),
        )
        # union-in the zero row per node instead of a post-aggregation
        # left join against the node set: nodes without in-edges still
        # land on RESET + 0, and the iteration costs one shuffle less
        # (join + groupBy, no third exchange; A/B'd ~25% faster at
        # sf0.1 and strictly fewer stages at any scale).
        # Damping is applied as quotient/remainder split:
        #   floor(c*num/den) == (c DIV den)*num + ((c % den)*num) DIV den
        # exactly, for c >= 0. The naive (contrib * num) DIV den form
        # overflows int64 once contrib*num > 2^63 -- a hub node's summed
        # contrib can approach N*BASE, so the naive form silently wraps
        # beyond ~1e8 nodes. The split form's largest intermediate is
        # ~contrib itself, extending headroom to ~9e9 nodes (2^63/BASE);
        # beyond that, raise BASE granularity instead.
        ranks = (
            contrib.unionByName(zeros)
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
            .select(
                "node",
                F.expr(
                    f"CAST({reset} + (contrib DIV {damping_den}) * {damping_num}"
                    f" + ((contrib % {damping_den}) * {damping_num})"
                    f" DIV {damping_den} AS BIGINT)"
                ).alias("score"),
            )
        )
        # cadence pin (see docstring): last iteration always pins so
        # the returned relation is lineage-flat for downstream reuse.
        if (it + 1) % checkpoint_every == 0 or it + 1 == iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
