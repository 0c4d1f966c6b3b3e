"""Multimodal operator plumbing tests: schemas, batch shapes, determinism
(the decode math is a documented stub; the Spark mechanics are real)."""

from __future__ import annotations

from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
    decode_features,
    frame_sample,
    resize,
)
from weighted_raster_overlay_service_toolbox_spark.sources import load_table

from .conftest import SF_SMOKE


def _payloads(spark):
    return load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )


def test_decode_one_row_per_input(spark):
    src = _payloads(spark)
    out = decode_features(src, "doc_id", "payload")
    assert out.columns == ["id", "n_bytes", "width", "height"]
    assert out.count() == src.count()
    r = out.first()
    assert 1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080
    # deterministic across runs
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, decode_features(src, "doc_id", "payload").collect())
    )


def test_resize_respects_max_side(spark):
    out = resize(_payloads(spark), "doc_id", "payload", max_side=256)
    rows = out.collect()
    assert rows
    for r in rows:
        assert max(r["width"], r["height"]) <= 256
        assert 0 < r["scale"] <= 1.0


def test_frame_sample_expands_rows(spark):
    src = _payloads(spark)
    out = frame_sample(src, "doc_id", "payload", every_n_bytes=40)
    n_in = src.count()
    n_out = out.count()
    assert n_out > n_in  # table-generating: multiple frames per doc
    # offsets are aligned and frame indexes dense per doc
    sample = out.filter(F.col("id") == 0).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in sample] == list(range(len(sample)))
    assert all(r["byte_offset"] == r["frame_idx"] * 40 for r in sample)
