"""Deterministic Lloyd's k-means over an embedding column -- the
engine's iterative-algorithm pattern.

Each iteration is two Catalyst plans: (1) assignment -- candidates join a
BROADCAST of k centroids, argmin by squared distance with cluster-id
tiebreak; (2) update -- posexplode + (cluster, dim)-keyed EXACT mean:
inputs are quantized to 1e-6-granular integers once at entry, so the
centroid numerator is a commutative LONG sum, immune to double
summation-order nondeterminism across partitionings AND engines (a raw
``avg(double)`` depends on partial-aggregation order, which Spark does
not pin run-to-run -- quantization is what makes "deterministic k-means"
actually true, and what lets the 3-iteration run carry an exact DuckDB
oracle as unrolled SQL). Distances use the expanded identity
``|v|^2 - 2 v.c + |c|^2`` with sequential-fold dot products so both
engines evaluate the identical float expression.

Determinism: init from the k lowest vec_ids (no random), distance ties
break toward the lower cluster id.

Scale: per iteration, one broadcast (k*dim doubles -- tiny) and one
shuffle keyed by (cluster, dim). ``localCheckpoint`` truncates lineage so
the plan does not grow per iteration (the classic iterative-algorithm
trap on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import duck_round
from pyspark.sql.functions import broadcast

_Q = 1_000_000  # quantization denominator: 1e-6 embedding granularity


def quantize_vec(e) -> F.Column:
    """Snap each component to the 1e-6 grid (round half away from zero in
    both engines). ``round(x*1e6)/1e6`` -- the double result is the same
    bit pattern in Spark and DuckDB because both divide the same exact
    integer by the same constant."""
    e = F.col(e) if isinstance(e, str) else e
    return F.transform(e, lambda x: duck_round(x * _Q) / F.lit(float(_Q)))


def _dot(a, b) -> F.Column:
    """Sequential-fold dot product (index order 0..dim-1) -- matches
    DuckDB's list_dot_product evaluation order, so the expanded distance
    below is bit-identical across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _sq_dist(a, b) -> F.Column:
    """|a-b|^2 via the expanded identity (NOT a fold of squared diffs:
    the identity is what the oracle can replicate with dot products)."""
    return _dot(a, a) - 2 * _dot(a, b) + _dot(b, b)


def assign_clusters(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, e) x (cluster, ce) -> (vec_id, e, cluster) by nearest
    centroid, cluster-id tiebreak."""
    scored = vectors.join(broadcast(centroids)).select(
        "vec_id",
        "e",
        "cluster",
        _sq_dist(F.col("e"), F.col("ce")).alias("d2"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cluster")).alias("best"),
        F.first("e").alias("e"),
    )
    return best.select("vec_id", "e", F.col("best.cluster").alias("cluster"))


def update_centroids(assigned: DataFrame) -> DataFrame:
    """(vec_id, e, cluster) -> (cluster, ce): per-dimension EXACT mean --
    long sum of the 1e-6-quantized components / count / 1e6 -- re-packed
    into an ordered array."""
    flat = assigned.select(
        "cluster", F.posexplode("e").alias("pos", "val")
    ).select(
        "cluster", "pos", duck_round(F.col("val") * _Q).cast("long").alias("v6")
    )
    dims = flat.groupBy("cluster", "pos").agg(
        (F.sum("v6") / F.count(F.lit(1)) / F.lit(float(_Q))).alias("mean_val")
    )
    return dims.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_val"))),
            lambda s: s["mean_val"],
        ).alias("ce")
    )


def kmeans(
    vectors: DataFrame, k: int = 8, iterations: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Run Lloyd's algorithm; returns (assignments, centroids).

    ``vectors``: ``vec_id long, e array<double>`` (quantized to the 1e-6
    grid at entry). Init = the k lowest vec_ids (deterministic; callers
    wanting k-means++ can pass their own loop). Each iteration
    localCheckpoints the centroids to keep the lineage flat.
    """
    vectors = vectors.select("vec_id", quantize_vec("e").alias("e"))
    centroids = (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cluster"),
            F.col("e").alias("ce"),
        )
        .localCheckpoint()
    )
    assigned = None
    for _ in range(iterations):
        assigned = assign_clusters(vectors, centroids)
        centroids = update_centroids(assigned).localCheckpoint()
    return assigned, centroids
