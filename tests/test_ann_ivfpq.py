"""IVF x PQ serving-config pins (round 11, VERDICT r10 #2).

q_ann_ivfpq claims two measurable things beyond oracle parity:

1. recall@3 >= the exact-ranked IVF baseline (q_ann_ivf's ranking) --
   the bar a production config must clear before the 128x candidate-I/O
   cut is worth anything;
2. the exact re-rank of the 40-row ADC shortlist reaches the IVF
   COVERAGE CEILING -- every true neighbor the 5-bucket multi-probe set
   admits survives the PQ stage, i.e. quantization costs zero recall at
   this (M=16, K=64, shortlist=40) operating point.

Both are pinned here at sf0.001 (the r11 sweep measured the same
equalities at sf0.01 and sf0.1; PLANS.md records the full table).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from weighted_raster_overlay_service_toolbox_spark.functions.rounding import (
    duck_round,
)
from weighted_raster_overlay_service_toolbox_spark.operators.kmeans import (
    quantize_vec,
)
from weighted_raster_overlay_service_toolbox_spark.operators.similarity import (
    dot_expr,
    hyperplane_bucket,
)
from weighted_raster_overlay_service_toolbox_spark.queries import QUERIES
from weighted_raster_overlay_service_toolbox_spark.queries.llm import (
    _IVFPQ_PROBES,
    _IVFPQ_TOPK,
)
from weighted_raster_overlay_service_toolbox_spark.sources import load_table

from .conftest import SF_SMOKE


def _exact_top3(spark):
    """Exact-L2 ground truth (integer micro-unit ranks, the q_ann_pq
    convention) -- the recall denominator both assertions share."""
    fv = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id",
        quantize_vec(F.col("embedding").cast("array<double>")).alias("e"),
    )
    probes = fv.filter(F.col("vec_id") < _IVFPQ_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    d2 = (
        dot_expr(F.col("pe"), F.col("pe"))
        - 2 * dot_expr(F.col("pe"), F.col("e"))
        + dot_expr(F.col("e"), F.col("e"))
    )
    w = Window.partitionBy("probe_id").orderBy("d2u", "vec_id")
    return {
        (r.probe_id, r.vec_id)
        for r in fv.crossJoin(broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            duck_round(d2 * F.lit(1_000_000.0)).cast("long").alias("d2u"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _IVFPQ_TOPK)
        .collect()
    }


def test_ivfpq_recall_ties_or_beats_exact_ranked_ivf_baseline(spark):
    exact = _exact_top3(spark)
    ivf_top3 = {
        (r.probe_id, r.cand_id)
        for r in QUERIES["q_ann_ivf"](spark, SF_SMOKE)
        .filter(F.col("rk") <= _IVFPQ_TOPK)
        .collect()
    }
    ivf_hits = len(exact & ivf_top3)
    ivfpq_hits = sum(
        r.n_hits
        for r in QUERIES["q_ann_ivfpq_recall"](spark, SF_SMOKE).collect()
    )
    assert ivfpq_hits >= ivf_hits, (
        f"IVFPQ recall {ivfpq_hits} fell below the exact-ranked IVF "
        f"baseline {ivf_hits} (of {len(exact)})"
    )


def test_ivfpq_rerank_reaches_ivf_coverage_ceiling(spark):
    exact = _exact_top3(spark)
    vb = hyperplane_bucket(
        load_table(spark, SF_SMOKE, "embeddings").select(
            "vec_id",
            quantize_vec(F.col("embedding").cast("array<double>")).alias("e"),
        )
    ).select("vec_id", "bucket")
    probe_buckets = vb.filter(F.col("vec_id") < _IVFPQ_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(4)],
        ).alias("pbs"),
    )
    candidates = {
        (r.probe_id, r.vec_id)
        for r in vb.join(
            broadcast(probe_buckets),
            F.array_contains(F.col("pbs"), F.col("bucket"))
            & (F.col("vec_id") != F.col("probe_id")),
        )
        .select("probe_id", "vec_id")
        .collect()
    }
    ceiling = len(exact & candidates)
    ivfpq_hits = sum(
        r.n_hits
        for r in QUERIES["q_ann_ivfpq_recall"](spark, SF_SMOKE).collect()
    )
    assert ivfpq_hits == ceiling, (
        f"re-ranked shortlist recovered {ivfpq_hits} of the {ceiling} "
        f"true neighbors the multi-probe buckets admit"
    )
