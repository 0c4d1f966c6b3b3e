"""Catalog persistence (R4-R11 surface): create/exists/load/append/replace
round trip with schema validation."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.sources.catalog_store import (
    REQUIRED_CLASSIFICATION,
    append_rows,
    catalog_exists,
    create_catalog,
    load_catalog,
    missing_columns,
    replace_catalog,
)

_STORE = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".scratch", "cat_store")


def test_full_lifecycle(spark):
    # R6 create; R9 exists
    assert not catalog_exists(_STORE) or create_catalog(spark, _STORE, overwrite=True) is None
    create_catalog(spark, _STORE, overwrite=True)
    assert catalog_exists(_STORE)
    with pytest.raises(FileExistsError):
        create_catalog(spark, _STORE)  # no silent clobber (.pyt:638-643)

    cat = load_catalog(spark, _STORE)
    assert cat.count() == 0
    # R10 introspection
    assert missing_columns(cat, REQUIRED_CLASSIFICATION) == []
    assert missing_columns(cat.drop("Title"), REQUIRED_CLASSIFICATION) == ["Title"]

    # R5 append aligns by name, missing columns null-filled
    rows = spark.createDataFrame(
        [("layerA", "Layer A")], "Name string, Title string"
    )
    append_rows(spark, _STORE, rows)
    got = load_catalog(spark, _STORE)
    assert got.count() == 1
    r = got.first()
    assert r["Name"] == "layerA" and r["Description"] is None

    # R4 keyed update via snapshot replace
    updated = got.withColumn(
        "Title",
        F.when(F.col("Name") == "layerA", F.lit("Renamed")).otherwise(F.col("Title")),
    )
    replace_catalog(_STORE, updated)
    assert load_catalog(spark, _STORE).first()["Title"] == "Renamed"


def test_replace_crash_window_recovery(spark):
    """A crash between replace_catalog's two renames leaves no live dir;
    the next load must roll the swap forward (complete .tmp) or back
    (no/partial .tmp), never lose the catalog."""
    import shutil

    path = _STORE + "_crash"
    create_catalog(spark, path, overwrite=True)
    rows = spark.createDataFrame([("a", "A")], "Name string, Title string")
    append_rows(spark, path, rows)

    # roll FORWARD: complete new snapshot in .tmp, live dir renamed away
    updated = load_catalog(spark, path).withColumn("Title", F.lit("New"))
    updated.write.mode("overwrite").parquet(path + ".tmp")
    os.rename(path, path + ".old")
    got = load_catalog(spark, path)  # triggers recovery
    assert got.first()["Title"] == "New"
    assert not os.path.isdir(path + ".old") and not os.path.isdir(path + ".tmp")

    # roll BACK: .tmp incomplete (no _SUCCESS) -> previous snapshot returns
    os.makedirs(path + ".tmp", exist_ok=True)
    os.rename(path, path + ".old")
    got2 = load_catalog(spark, path)
    assert got2.first()["Title"] == "New"  # previous live snapshot
    assert not os.path.isdir(path + ".old")
    shutil.rmtree(path, ignore_errors=True)


def test_stateful_custom_final_counts(spark):
    """applyInPandasWithState: final per-user state equals batch totals."""
    from weighted_raster_overlay_service_toolbox_spark.queries import QUERIES
    from weighted_raster_overlay_service_toolbox_spark.sources import load_table

    from .conftest import SF_SMOKE

    rows = QUERIES["q_stream_stateful_custom"](spark, SF_SMOKE).collect()
    assert rows
    final: dict[int, tuple[int, float]] = {}
    for r in sorted(rows, key=lambda r: r["batch_id"]):
        final[r["user_id"]] = (r["n_events"], r["sum_value"])
    truth = {
        r["user_id"]: (r["n"], r["s"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert set(final) == set(truth)
    for uid, (n, s) in final.items():
        assert n == truth[uid][0], f"user {uid} count {n} != {truth[uid][0]}"
        assert abs(s - truth[uid][1]) < 0.02, f"user {uid} sum {s} != {truth[uid][1]}"


def test_snapshot_history_and_time_travel(spark):
    from weighted_raster_overlay_service_toolbox_spark.sources.catalog_store import (
        catalog_versions,
        purge_history,
    )

    store = _STORE + "_tt"
    create_catalog(spark, store, overwrite=True)
    append_rows(
        spark,
        store,
        spark.createDataFrame([("a", "T0")], "Name string, Title string"),
    )
    assert catalog_versions(store) == []

    def set_title(t):
        cur = load_catalog(spark, store)
        replace_catalog(
            store,
            cur.withColumn("Title", F.lit(t)),
            keep_history=2,
        )

    for i, t in enumerate(["T1", "T2", "T3", "T4"]):
        set_title(t)
    # 4 replaces, keep_history=2 -> versions 3 and 4 retained (1, 2 pruned)
    assert catalog_versions(store) == [3, 4]
    # time travel: v3 = state after T2, v4 = after T3, live = T4
    assert load_catalog(spark, store, version=3).collect()[0]["Title"] == "T2"
    assert load_catalog(spark, store, version=4).collect()[0]["Title"] == "T3"
    assert load_catalog(spark, store).collect()[0]["Title"] == "T4"
    with pytest.raises(FileNotFoundError):
        load_catalog(spark, store, version=1)  # pruned
    # snapshot isolation: a reader holding v4 still works after another swap
    held = load_catalog(spark, store, version=4)
    set_title("T5")
    assert held.collect()[0]["Title"] == "T3"
    # rebuild starts with a clean history
    create_catalog(spark, store, overwrite=True)
    assert catalog_versions(store) == []
    purge_history(store)


def test_history_off_by_default_retains_nothing(spark):
    from weighted_raster_overlay_service_toolbox_spark.sources.catalog_store import (
        catalog_versions,
    )

    store = _STORE + "_nohist"
    create_catalog(spark, store, overwrite=True)
    append_rows(
        spark,
        store,
        spark.createDataFrame([("a", "T0")], "Name string, Title string"),
    )
    replace_catalog(store, load_catalog(spark, store).withColumn("Title", F.lit("T1")))
    assert catalog_versions(store) == []
    assert load_catalog(spark, store).collect()[0]["Title"] == "T1"


def test_versioned_replace_crash_recovery_keeps_live_catalog(spark):
    """A crash between the two renames of a keep_history replace must
    still recover a complete LIVE catalog (rolled forward via the
    completed .tmp); the displaced snapshot of the interrupted replace
    is dropped from history (documented caveat), older versions stay."""
    import os
    import shutil

    from weighted_raster_overlay_service_toolbox_spark.sources.catalog_store import (
        _swap_paths,
        catalog_versions,
        purge_history,
        recover_catalog,
    )

    store = _STORE + "_crash"
    create_catalog(spark, store, overwrite=True)
    append_rows(
        spark,
        store,
        spark.createDataFrame([("a", "T0")], "Name string, Title string"),
    )
    replace_catalog(
        store,
        load_catalog(spark, store).withColumn("Title", F.lit("T1")),
        keep_history=4,
    )
    assert catalog_versions(store) == [1]
    # simulate the crash window of a second replace: new snapshot fully
    # written to .tmp, live dir renamed away, process dies
    tmp, old = _swap_paths(store)
    load_catalog(spark, store).withColumn("Title", F.lit("T2")).write.parquet(tmp)
    os.rename(store, old)
    recover_catalog(store)  # what the next load/replace runs first
    assert load_catalog(spark, store).collect()[0]["Title"] == "T2"
    assert catalog_versions(store) == [1]  # older history intact
    assert not os.path.isdir(old) and not os.path.isdir(tmp)
    shutil.rmtree(store, ignore_errors=True)
    purge_history(store)


def test_merge_rows_upsert_semantics(spark):
    from weighted_raster_overlay_service_toolbox_spark.sources.catalog_store import (
        merge_rows,
    )

    store = _STORE + "_merge"
    create_catalog(spark, store, overwrite=True)
    append_rows(
        spark,
        store,
        spark.createDataFrame(
            [("a", "TA", "DA"), ("b", "TB", "DB")],
            "Name string, Title string, Description string",
        ),
    )
    merge_rows(
        spark,
        store,
        spark.createDataFrame(
            [("a", "TA2", None), ("c", "TC", "DC")],
            "Name string, Title string, Description string",
        ),
    )
    got = {
        r["Name"]: (r["Title"], r["Description"])
        for r in load_catalog(spark, store).collect()
    }
    # matched: non-null update wins, null keeps current; unmatched inserts
    assert got == {"a": ("TA2", "DA"), "b": ("TB", "DB"), "c": ("TC", "DC")}


def test_catalog_diff_emits_only_changed_keys(spark):
    from weighted_raster_overlay_service_toolbox_spark.sources.catalog_store import (
        catalog_diff,
    )

    store = _STORE + "_diff"
    create_catalog(spark, store, overwrite=True)
    append_rows(
        spark,
        store,
        spark.createDataFrame(
            [("a", "TA"), ("b", "TB"), ("c", "TC")],
            "Name string, Title string",
        ),
    )
    cur = load_catalog(spark, store)
    replace_catalog(
        store,
        cur.filter(F.col("Name") != "c").withColumn(
            "Title",
            F.when(F.col("Name") == "a", F.lit("TA2")).otherwise(F.col("Title")),
        ),
        keep_history=2,
    )
    diff = {
        r["Name"]: (r["change_type"], r["Title"])
        for r in catalog_diff(spark, store, v_from=1, v_to=None).collect()
    }
    # b unchanged -> absent; a updated (post-image); c deleted (null post)
    assert diff == {"a": ("update", "TA2"), "c": ("delete", None)}
    # identical snapshots diff to empty
    assert catalog_diff(spark, store, v_from=None, v_to=None).count() == 0
