"""Similarity-search operators over embedding columns (``array<float>``).

Two paths, per the scale rule "exact for ground truth, bucketed for bulk":

- :func:`cosine_scores` / :func:`topk_per_probe` -- brute-force cosine
  against a broadcast probe set (exact baseline);
- :func:`hyperplane_bucket` -- seeded sign-LSH bucketer: the candidate
  space shrinks to one bucket per probe, turning the quadratic pair space
  into an equi-join keyed by bucket (IVF-style inverted file).

Numeric conventions: all arithmetic in double (float32 inputs are widened
once at load); dot products over large pair sets run in an Arrow-batched
numpy pandas_udf (:func:`dot_pandas`) -- higher-order-function lambdas are
interpreted per element and lose by ~10x at 100k+ pairs; per-vector norms
are always precomputed (N+M evaluations, not 2*N*M).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, pandas_udf


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Sequential double-precision dot product as a pure column expression
    (right for one-off norms; see :func:`dot_pandas` for bulk)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


_DOT_PANDAS = None


def dot_pandas(a, b) -> Column:
    """Arrow-batched numpy dot product: one einsum per Arrow batch, no
    per-row Python. Lazily built because pandas_udf return-type parsing
    needs an active SparkSession."""
    global _DOT_PANDAS
    if _DOT_PANDAS is None:

        @pandas_udf("double")
        def dot(x: pd.Series, y: pd.Series) -> pd.Series:
            import numpy as np

            xv = np.stack(x.to_numpy())
            yv = np.stack(y.to_numpy())
            return pd.Series(np.einsum("ij,ij->i", xv, yv))

        _DOT_PANDAS = dot
    return _DOT_PANDAS(a, b)


def with_norm(vectors: DataFrame, vec_col: str = "e", out: str = "nrm") -> DataFrame:
    """Attach the L2 norm once per vector."""
    return vectors.withColumn(out, F.sqrt(dot_expr(vec_col, vec_col)))


def cosine_scores(
    cands: DataFrame, probes: DataFrame, bulk: bool = True
) -> DataFrame:
    """Score every (probe, candidate) pair by cosine, probes broadcast.

    ``cands``: ``vec_id, e, nrm``; ``probes``: ``probe_id, pe, pnrm``.
    Returns ``probe_id, cand_id, sim`` with sim rounded to 4dp (the
    cross-engine determinism convention for similarity scores).
    """
    dot = dot_pandas if bulk else dot_expr
    joined = cands.join(broadcast(probes), F.col("vec_id") != F.col("probe_id"))
    sim = F.round(
        dot(F.col("pe"), F.col("e")) / (F.col("pnrm") * F.col("nrm")), 4
    ).cast("double")
    return joined.select(
        "probe_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
    )


def topk_per_probe(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k: rank on (rounded sim DESC, cand_id ASC) so the
    selection is stable across engines and partitionings."""
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("probe_id", "cand_id", "sim", F.col("rk").cast("int").alias("rk"))
    )


def _plane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5(seed, j) -- hash
    bits as a fixed entropy source; never random at run time."""
    vals = []
    for j in range(dim):
        h = hashlib.md5(f"plane-{seed}-{j}".encode()).digest()
        vals.append(int.from_bytes(h[:4], "big") / 2**31 - 1.0)
    return vals


def hyperplane_bucket(
    vectors: DataFrame, vec_col: str = "e", dim: int = 64, n_planes: int = 4,
    out: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket id (0 .. 2^n_planes - 1) from seeded hyperplanes.

    A plain integer column: bucket-partitioned layouts get partition
    pruning, and probe lookups become equi-joins on bucket."""
    planes = [F.array(*[F.lit(x) for x in _plane(dim, s)]) for s in range(n_planes)]
    bucket = sum(
        (
            F.when(dot_expr(F.col(vec_col), pl) >= 0, 1 << i).otherwise(0)
            for i, pl in enumerate(planes)
        ),
        start=F.lit(0),
    )
    return vectors.withColumn(out, bucket)


def semantic_dedup(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 3,
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embedding space, then compare
    ONLY within clusters -- the pair space collapses from n^2/2 to
    ~n^2/(2k), and at production scale k grows with n so the per-cluster
    block stays bounded (the paper runs 11k clusters over LAION). Within
    a cluster, a vector is DROPPED when its cosine to any LOWER-id
    vector of the same cluster reaches ``threshold`` -- the
    deterministic greedy keep-lowest-id rule (the same keep-one
    convention the MinHash cluster path uses), a SQL-expressible
    variant of the paper's per-cluster greedy sweep.

    Returns the SURVIVORS as ``(vec_id, cluster)``.

    Determinism/oracle story: clustering is the exact-arithmetic
    deterministic Lloyd's of operators/kmeans.py (quantized inputs,
    integer-exact centroid means), and the pair cosine follows the
    rounded-4dp convention, so the whole operator carries an exact
    DuckDB oracle (unrolled k-means CTEs + one within-cluster
    self-join).

    Scale: one broadcast + one (cluster, dim) shuffle per k-means
    iteration, then ONE cluster-keyed self-join whose pair dots run in
    the Arrow-batched numpy path (dot_pandas) -- no all-pairs product
    ever forms. Norms are precomputed per vector (N evaluations, not
    2 per pair)."""
    from .kmeans import kmeans

    assigned, _ = kmeans(vectors, k=k, iterations=iterations)
    # ONE embeddings scan: the assignment relation feeds BOTH self-join
    # sides and the final anti-join base -- un-pinned, each consumer
    # replans the scan->assign subtree (the aliased-derived-relation
    # rescan the r6 sweep eliminated registry-wide; same fix as the
    # banded minhash/simhash self-joins). The pinned relation is
    # embedding-sized -- exactly the data the self-join must hold anyway.
    assigned = assigned.localCheckpoint(eager=False)
    sides = with_norm(assigned)
    a = sides.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"), "cluster",
    )
    b = sides.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"), F.col("cluster").alias("cluster_b"),
    )
    cos = F.round(
        dot_pandas(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4
    ).cast("double")
    dropped = (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(cos >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return assigned.join(dropped, "vec_id", "left_anti").select(
        "vec_id", "cluster"
    )
