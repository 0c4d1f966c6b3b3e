"""pin_corpus storage-mode contract (plans/pinning.py, VERDICT r7 #6)."""

from __future__ import annotations

import pytest

from weighted_raster_overlay_service_toolbox_spark.plans.pinning import (
    _ENV,
    pin_corpus,
)


def test_pin_corpus_modes(spark, monkeypatch):
    df = spark.range(10)

    # default: non-eager localCheckpoint -- lineage replaced by an RDD scan
    monkeypatch.delenv(_ENV, raising=False)
    pinned = pin_corpus(df)
    assert "LogicalRDD" in pinned._jdf.queryExecution().optimizedPlan().toString()

    # none: identity -- the exact same DataFrame object, no plan change
    monkeypatch.setenv(_ENV, "none")
    assert pin_corpus(df) is df

    # disk: persist(DISK_ONLY), lineage kept (recompute-on-loss)
    monkeypatch.setenv(_ENV, "disk")
    d = pin_corpus(df)
    lvl = d.storageLevel
    assert lvl.useDisk and not lvl.useMemory
    d.unpersist()

    # unknown mode: loud failure, never a silent default
    monkeypatch.setenv(_ENV, "ram")
    with pytest.raises(ValueError, match="ram"):
        pin_corpus(df)


def test_pin_corpus_value_equivalence(spark, monkeypatch):
    """All three modes produce identical values -- the knob trades
    fault-tolerance/storage, never semantics."""
    from pyspark.sql import functions as F

    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    results = {}
    for mode in ("checkpoint", "disk", "none"):
        monkeypatch.setenv(_ENV, mode)
        pinned = pin_corpus(base)
        agg = sorted(
            tuple(r)
            for r in pinned.groupBy("k").count().join(pinned, "k").collect()
        )
        results[mode] = agg
        if mode == "disk":
            pinned.unpersist()
    assert results["checkpoint"] == results["disk"] == results["none"]
