"""Deterministic Lloyd's k-means over an embedding column -- the
engine's iterative-algorithm pattern.

Each iteration is two Catalyst plans: (1) assignment -- candidates join a
BROADCAST of k centroids, argmin by squared distance with cluster-id
tiebreak; (2) update -- posexplode + (cluster, dim)-keyed average,
re-packed to arrays. Determinism: init from the k lowest vec_ids (no
random), distance ties break toward the lower cluster id, averages are
order-independent.

Scale: per iteration, one broadcast (k*dim doubles -- tiny) and one
shuffle keyed by (cluster, dim). ``localCheckpoint`` truncates lineage so
the plan does not grow per iteration (the classic iterative-algorithm
trap on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _sq_dist(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


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
    """(vec_id, e, cluster) -> (cluster, ce): per-dimension mean,
    re-packed into an ordered array."""
    flat = assigned.select(
        "cluster", F.posexplode("e").alias("pos", "val")
    )
    dims = flat.groupBy("cluster", "pos").agg(F.avg("val").alias("mean_val"))
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

    ``vectors``: ``vec_id long, e array<double>``. Init = the k lowest
    vec_ids (deterministic; callers wanting k-means++ can pass their own
    loop). Each iteration localCheckpoints the centroids to keep the
    lineage flat.
    """
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
