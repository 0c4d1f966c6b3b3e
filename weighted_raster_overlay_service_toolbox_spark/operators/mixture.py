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
  mega-domain dominates, salt-split it first (operators/skew.py) and
  give each split a proportional sub-budget.
- Determinism is the point: an incremental re-run (more data appended)
  selects the same prefix for unchanged documents, so downstream caches
  and training shards stay valid.
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
    sum stays within ``floor(total_budget * weight)``.

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
