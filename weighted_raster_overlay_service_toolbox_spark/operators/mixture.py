"""Data-mixture assembly: select documents per domain to target TOKEN
proportions (the SlimPajama/DoReMi-style corpus reweighting step).

Given per-domain mixture weights and a total token budget, each domain's
documents are taken in a DETERMINISTIC pseudo-random order (md5 of the
document id -- engine-portable, partition-order independent, rerun
stable) until the domain's share of the budget is filled. Selection is a
running-sum window over the domain partition, so the whole operator is
one scan plus one domain-keyed shuffle.

100 TB design notes:

- The cumulative sum is sequential WITHIN a domain but domains are
  independent, so parallelism equals the number of domains; if one
  mega-domain dominates, :func:`salted_token_budget_mixture` splits it
  into hash-derived sub-domains with proportional sub-budgets (exact
  conservation: the lane budgets sum to the domain budget) and
  re-merges -- parallelism becomes domains x salts.
- Determinism is the point: the same input always selects the same
  set, independent of partitioning and rerun. On an incremental re-run
  (more data appended) the selection is stable only UP TO the earliest
  newcomer in a domain's md5 order -- every unchanged document ordered
  before it keeps its fate, but a newcomer hashing into the middle of
  the order shifts all later running sums (no hash order can prevent
  that while budgets bind). Pipelines needing append-only stability
  should freeze a selection snapshot and run subsequent rounds on the
  remainder with the leftover budget.
- Token counts are whatever ``token_count_col`` computes -- whitespace
  split here; swap in the BPE-ish regex from the token-count query when
  the training tokenizer is subword.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_budget_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    total_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    n_tokens: Column | None = None,
) -> DataFrame:
    """Greedy deterministic per-domain selection to token budgets.

    Returns ``(id_col, source_col, n_tokens, cum_tokens)`` for the
    selected documents: domains outside ``weights`` are dropped, and each
    kept domain contributes docs (in md5-of-id order) whose running token
    sum stays within ``round(total_budget * weight)`` -- ROUNDED, not
    truncated (see the inline comment), and with Python ``round``
    semantics: an exact ``.5`` budget rounds half-to-even.

    A document larger than its domain's remaining budget ends the
    domain's intake (strict prefix semantics -- no skip-and-continue:
    skipping would make the selection depend on later documents, breaking
    the incremental-rerun stability the md5 order buys).
    """
    if n_tokens is None:
        n_tokens = F.size(F.split(F.col("text"), " "))
    kept = docs.filter(F.col(source_col).isin(*weights.keys()))
    budget: Column = F.lit(None).cast("long")
    for src, wt in sorted(weights.items()):
        # round, not truncate: 2000 * 0.3 is 599.99999999999997 in
        # binary floating point, and int() would silently shave a token
        b = int(round(total_budget * wt))
        budget = F.when(F.col(source_col) == src, b).otherwise(budget)
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        kept.select(
            id_col, source_col, n_tokens.cast("int").alias("n_tokens")
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
    )


def _lane_budgets(domain_budget: int, n: int) -> list[int]:
    """Split an integer budget over ``n`` lanes, conserving it EXACTLY:
    lane ``i`` gets ``budget // n`` plus one of the ``budget % n``
    remainder tokens. ``sum(_lane_budgets(B, n)) == B`` for all B, n."""
    q, r = divmod(domain_budget, n)
    return [q + (1 if i < r else 0) for i in range(n)]


def salted_token_budget_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    total_budget: int,
    n_salts: int | dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    n_tokens: Column | None = None,
) -> DataFrame:
    """:func:`token_budget_mixture` with mega-domain salt-splitting --
    the executable form of the skew recipe in the module docstring.

    Each domain listed in ``weights`` is split into ``n_salts`` (an int
    for all domains, or a per-domain dict defaulting to 1) hash-derived
    sub-domains: a document's lane is ``portable_hash60('lane:' + id)
    mod n`` -- a function of the document id ALONE, so the lane
    assignment is rerun-stable, partition-order independent, and
    engine-portable (the md5 recipe every exact-hash oracle uses). The
    domain's ``round(total_budget * weight)`` budget is divided over the
    lanes by :func:`_lane_budgets` (exact conservation -- no token is
    created or lost by the split), each lane runs the same strict-prefix
    running-sum selection independently, and the lanes re-merge by
    simple union of the filtered partitions.

    Returns ``(id_col, source_col, lane, n_tokens, cum_tokens)`` where
    ``cum_tokens`` is the LANE-local running sum. With ``n_salts=1``
    the selection is IDENTICAL to :func:`token_budget_mixture` (lane 0,
    same order key, same budget) -- pinned by the property tests.

    Scale: the one window is partitioned by ``(source, lane)``, so the
    sequential-scan unit shrinks from a whole mega-domain to
    ``1/n_salts`` of it; the shuffle count is unchanged (one). The
    selection DIFFERS from the unsalted operator for ``n_salts > 1``
    (each lane takes its own md5-order prefix) but keeps every
    guarantee that matters downstream: per-domain token totals within
    budget, determinism, and within-lane strict-prefix stability.

    Sizing rule: keep ``lane_budget = budget / n_salts`` MUCH larger
    than the max document token count. Each lane's strict-prefix intake
    stops at its first over-budget document, wasting up to one document
    of headroom PER LANE -- so expected under-fill is
    ``~n_salts * avg_doc_tokens / 2``, negligible when lanes hold
    thousands of documents (the mega-domain case this exists for) but
    visible if a small domain is over-salted. This is the intended
    use: salt the domain that is too big for one sequential window,
    not every domain.
    """
    from .dedup import portable_hash60

    if n_tokens is None:
        n_tokens = F.size(F.split(F.col("text"), " "))
    salts_of = (
        (lambda s: n_salts)
        if isinstance(n_salts, int)
        else (lambda s: n_salts.get(s, 1))
    )
    kept = docs.filter(F.col(source_col).isin(*weights.keys()))
    lane = F.lit(None).cast("long")
    budget: Column = F.lit(None).cast("long")
    for src, wt in sorted(weights.items()):
        n = max(1, salts_of(src))
        # same round-not-truncate rationale as token_budget_mixture
        lanes = _lane_budgets(int(round(total_budget * wt)), n)
        src_lane = F.pmod(
            portable_hash60(F.concat(F.lit("lane:"), F.col(id_col).cast("string"))),
            F.lit(n),
        )
        lane = F.when(F.col(source_col) == src, src_lane).otherwise(lane)
        lane_budget = F.lit(None).cast("long")
        for i, b in enumerate(lanes):
            lane_budget = F.when(src_lane == i, b).otherwise(lane_budget)
        budget = F.when(F.col(source_col) == src, lane_budget).otherwise(budget)
    w = (
        Window.partitionBy(source_col, "lane")
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        kept.select(
            id_col,
            source_col,
            lane.alias("lane"),
            n_tokens.cast("int").alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
    )
