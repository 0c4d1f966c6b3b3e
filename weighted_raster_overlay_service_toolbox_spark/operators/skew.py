"""Skew-handling operators: salted aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew; salting is the
explicit tool for HOT-KEY aggregation (one key holding a large fraction
of all rows -- "the" in token counts, a mega-customer in orders), where
even a split partition funnels into one reducer for the final combine.

Pattern: two-stage aggregation. Stage 1 groups by (key, salt) -- the hot
key fans out over ``n_salts`` reducers; stage 2 groups by key to combine
the partials. Both stages get map-side partial aggregation, so the extra
shuffle moves only ``n_salts`` rows per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, out: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): hash of the whole row --
    not a random() (which would break retries/determinism) and not a
    round-robin (which depends on partition layout)."""
    return df.withColumn(
        out, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_count_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof per-key count + sum via two-stage salted aggregation.

    Returns ``key, n, total`` -- identical values to a direct
    ``groupBy(key).agg(count, sum)``; the difference is purely physical
    (the hot key's rows combine on ``n_salts`` reducers first).
    """
    stage1 = (
        with_salt(df, n_salts)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(value).alias("_s"))
    )
    return stage1.groupBy(key).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias("total")
    )


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where ``hot_keys`` of ``fact`` are salted and the matching
    dim rows are replicated ``n_salts`` times, so one key's rows spread
    over ``n_salts`` tasks instead of one straggler.

    Non-hot keys join with salt 0 against a single dim replica -- the
    replication cost is |dim ∩ hot| * n_salts rows, not |dim| * n_salts.
    """
    hot = F.col(key).isin(hot_keys)
    f_salted = fact.withColumn(
        "_salt",
        F.when(hot, F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)))
        .otherwise(F.lit(0)),
    )
    salts = F.when(hot, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
        F.array(F.lit(0))
    )
    d_replicated = dim.withColumn("_salt", F.explode(salts))
    return f_salted.join(d_replicated, [key, "_salt"]).drop("_salt")
