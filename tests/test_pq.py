"""Product-quantization pins (round 10, q_ann_pq).

The joint grouped trainer claims BIT-IDENTICAL results to G sequential
per-group Lloyd's runs (disjoint group keys, verbatim kmeans arithmetic)
-- that equivalence is what lets the per-subspace unrolled-CTE oracle
chains cover the jointly-trained result, so it gets a pin, not a
docstring claim. Also pins the encode contract: the returned codebook is
c_{iterations-1}, the centroid set the final assignment ran against
(kmeans() would return the post-assignment update c_{iterations})."""

from __future__ import annotations

from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.operators.kmeans import (
    kmeans,
    kmeans_grouped_codebook_assign,
)
from weighted_raster_overlay_service_toolbox_spark.sources import load_table

from .conftest import SF_SMOKE

K, ITERS, SUB, M = 16, 3, 16, 2  # two subspaces keep the pin fast


def _subspaces(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return [
        emb.select(
            "vec_id",
            F.lit(j).alias("m"),
            F.slice("e", j * SUB + 1, SUB).alias("e"),
        )
        for j in range(M)
    ]


def test_grouped_trainer_matches_sequential_per_group_runs(spark):
    subs = _subspaces(spark)
    vm = subs[0].unionAll(subs[1])
    codes, codebook = kmeans_grouped_codebook_assign(vm, k=K, iterations=ITERS)
    for j in range(M):
        got = sorted(
            (r.vec_id, r.cluster)
            for r in codes.filter(F.col("m") == j).collect()
        )
        # kmeans(iterations=N).assigned IS the assignment against
        # c_{N-1} -- the same codes the grouped trainer must produce.
        want_assigned, _ = kmeans(
            subs[j].drop("m"), k=K, iterations=ITERS
        )
        want = sorted((r.vec_id, r.cluster) for r in want_assigned.collect())
        assert got == want, f"subspace {j} codes diverge"


def test_grouped_codebook_is_the_assignment_codebook(spark):
    subs = _subspaces(spark)
    vm = subs[0].unionAll(subs[1])
    _, codebook = kmeans_grouped_codebook_assign(vm, k=K, iterations=ITERS)
    for j in range(M):
        got = {
            r.cluster: tuple(r.ce)
            for r in codebook.filter(F.col("m") == j).collect()
        }
        # kmeans(iterations=N-1).centroids == c_{N-1}: the set the final
        # grouped assignment ran against (the PQ encode contract).
        _, want_cent = kmeans(subs[j].drop("m"), k=K, iterations=ITERS - 1)
        want = {r.cluster: tuple(r.ce) for r in want_cent.collect()}
        assert got == want, f"subspace {j} codebook diverges"
