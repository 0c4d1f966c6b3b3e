"""Shared language-mix purity scorer (ADVICE r8: q_lang_entropy and
q_stream_lang_mix previously duplicated this block and its oracle SQL
verbatim -- one copy drifting on the nano-nat or bp convention would
silently break the batch==stream equivalence the streaming query's
oracle asserts).

Input contract: a ``(source, lang, n)`` count relation -- from a batch
groupBy or a drained complete-mode streaming state table; the scorer
does not care which. Output: one row per source with Shannon entropy of
the language distribution in integer NANO-NATS (each term
(n/tot)*ln(tot/n) is one straight-line IEEE expression written
identically in both engines, quantized via duck_round x 1e9 and summed
as int64 -- commutative-exact) and the dominant-language share in basis
points.

Scale: per-source totals re-aggregate the already-small count relation
and join back broadcast -- (sources x langs)-sized, never
row-cardinality-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .rounding import duck_round

# The DuckDB mirror over the raw documents table: both queries' oracles
# use this single constant (batch==stream by construction -- the
# stream's drained (source, lang) state equals the batch counts).
LANG_MIX_ORACLE = """
    WITH c AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY source),
    e AS (
        SELECT c.source, c.n,
               CAST(ROUND((CAST(c.n AS DOUBLE) / t.tot)
                          * ln(CAST(t.tot AS DOUBLE) / c.n)
                          * 1000000000) AS BIGINT) AS h9
        FROM c JOIN t USING (source)
    )
    SELECT e.source, t.tot AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           CAST(SUM(e.h9) AS BIGINT) AS entropy_n9,
           CAST(ROUND(CAST(MAX(e.n) AS DOUBLE) * 10000 / t.tot) AS BIGINT)
               AS top_share_bp
    FROM e JOIN t ON t.source = e.source
    GROUP BY e.source, t.tot
    """


def lang_mix_scores(counts: DataFrame) -> DataFrame:
    """(source, lang, n) counts -> (source, n_docs, n_langs, entropy_n9,
    top_share_bp). The totals side is renamed before the join: when the
    counts relation is a memory-sink table both join sides derive from
    the same relation and unrenamed keys collide on attribute ids (the
    q_stream_lang_mix self-join case); the rename is harmless for plain
    batch counts."""
    t = (
        counts.groupBy("source")
        .agg(F.sum("n").alias("tot"))
        .withColumnRenamed("source", "src_t")
    )
    # bc-justification: enum-keyed per-source totals (see
    # tests/test_broadcast_lint.py).
    e = (
        counts.join(broadcast(t), F.col("source") == F.col("src_t"))
        .drop("src_t")
        .select(
            "source",
            "n",
            "tot",
            duck_round(
                (F.col("n").cast("double") / F.col("tot"))
                * F.log(F.col("tot").cast("double") / F.col("n"))
                * 1000000000
            )
            .cast("long")
            .alias("h9"),
        )
    )
    return (
        e.groupBy("source", "tot")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.sum("h9").cast("long").alias("entropy_n9"),
            duck_round(F.max("n").cast("double") * 10000 / F.col("tot"))
            .cast("long")
            .alias("top_share_bp"),
        )
        .select(
            "source",
            F.col("tot").alias("n_docs"),
            "n_langs",
            "entropy_n9",
            "top_share_bp",
        )
    )
