"""Z-order layout: prove multi-dimensional clustering from the written
parquet footers themselves -- the file-skipping evidence a 100 TB scan
relies on, not just a plan assertion."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.operators.layout import (
    write_zordered,
    zorder_key,
)
from weighted_raster_overlay_service_toolbox_spark.sources import load_table

from .conftest import SF_SMOKE

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".scratch")


def _bucketed_events(spark):
    e = load_table(spark, SF_SMOKE, "events")
    return e.select(
        "event_id",
        (F.col("user_id") % 256).cast("long").alias("bx"),
        (F.floor("value").cast("long") % 256).cast("long").alias("by"),
    )


def _file_stats_area(path: str) -> float:
    """Sum over files of the (bx, by) bounding-box area the file's footer
    stats advertise -- exactly what min/max pruning sees. Smaller total
    area = more selective stats = more files skipped per predicate."""
    total = 0.0
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert files, path
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins = {"bx": None, "by": None}
        maxs = {"bx": None, "by": None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        assert mins["bx"] is not None and mins["by"] is not None, f
        total += (maxs["bx"] - mins["bx"] + 1) * (maxs["by"] - mins["by"] + 1)
    return total


def test_zorder_key_is_bijective_and_orders_locally(spark):
    """Property (hypothesis): the Morton key is a bijection on the
    8-bit x 8-bit domain (distinct inputs -> distinct keys, key decodes
    back to its inputs) -- checked against a pure-Python reimplementation
    so the Spark expression chain is falsifiable."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def py_morton(x: int, y: int) -> int:
        k = 0
        for i in range(8):
            k |= ((x >> i) & 1) << (2 * i)
            k |= ((y >> i) & 1) << (2 * i + 1)
        return k

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 255), st.integers(0, 255)),
            min_size=1, max_size=20, unique=True,
        )
    )
    def check(pairs):
        df = spark.createDataFrame(pairs, "x long, y long")
        got = {
            (r["x"], r["y"]): r["k"]
            for r in df.select(
                "x", "y", zorder_key(F.col("x"), F.col("y")).alias("k")
            ).collect()
        }
        for (x, y), k in got.items():
            assert k == py_morton(x, y), (x, y, k)
        assert len(set(got.values())) == len(got)  # injective

    check()


def test_zorder_nd_matches_python_and_rejects_overflow(spark):
    import pytest

    from weighted_raster_overlay_service_toolbox_spark.operators.layout import (
        zorder_key_nd,
    )

    def py_morton_nd(vals, bits):
        k = 0
        for i in range(bits):
            for d, v in enumerate(vals):
                k |= ((v >> i) & 1) << (i * len(vals) + d)
        return k

    rows = [(3, 200, 17), (255, 0, 255), (0, 0, 0), (128, 64, 32)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.select(
        "a", "b", "c",
        zorder_key_nd([F.col("a"), F.col("b"), F.col("c")]).alias("k"),
    ).collect()
    for r in got:
        assert r["k"] == py_morton_nd((r["a"], r["b"], r["c"]), 8)
    # 2-dim wrapper stays consistent with the N-dim form
    two = df.select(
        zorder_key(F.col("a"), F.col("b")).alias("k2"),
        zorder_key_nd([F.col("a"), F.col("b")]).alias("kn"),
    ).collect()
    assert all(r["k2"] == r["kn"] for r in two)
    with pytest.raises(ValueError):
        zorder_key_nd([F.col("a")] * 8, bits=8)  # 64 > 63-bit budget


def test_zorder_nd_int_columns_survive_high_bit_positions(spark):
    """Regression (r4 advice): IntegerType inputs with 3 dims x 16 bits
    place bits at positions up to 47; without the internal cast-to-long
    the Java int shift wraps mod 32 and silently corrupts the key. The
    int-typed and long-typed results must be identical."""
    from weighted_raster_overlay_service_toolbox_spark.operators.layout import (
        zorder_key_nd,
    )

    def py_morton_nd(vals, bits):
        k = 0
        for i in range(bits):
            for d, v in enumerate(vals):
                k |= ((v >> i) & 1) << (i * len(vals) + d)
        return k

    rows = [(40000, 1, 2), (65535, 65535, 65535), (0, 40000, 12345)]
    df = spark.createDataFrame(rows, "a int, b int, c int")
    got = df.select(
        "a", "b", "c",
        zorder_key_nd([F.col("a"), F.col("b"), F.col("c")], bits=16).alias("k"),
    ).collect()
    for r in got:
        assert r["k"] == py_morton_nd((r["a"], r["b"], r["c"]), 16), tuple(r)


def test_compact_parquet_recovers_from_mid_swap_crash(spark):
    """Regression (r4 advice): a crash between the two swap renames
    leaves the dataset path absent with bytes in .compact.old; the next
    call must restore and proceed instead of failing on a missing path."""
    from weighted_raster_overlay_service_toolbox_spark.operators.layout import (
        compact_parquet,
    )

    src = _bucketed_events(spark)
    path = os.path.join(_SCRATCH, "layout_recover")
    try:
        src.repartition(4).write.mode("overwrite").parquet(path)
        before = sorted(map(tuple, spark.read.parquet(path).collect()))
        # simulate the crash window: original moved aside, path missing
        os.rename(path, path + ".compact.old")
        assert not os.path.exists(path)
        n_after = compact_parquet(spark, path, target_file_bytes=10**9)
        assert n_after == 1
        assert sorted(map(tuple, spark.read.parquet(path).collect())) == before
        assert not os.path.exists(path + ".compact.old")
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path + ".compact.tmp", ignore_errors=True)
        shutil.rmtree(path + ".compact.old", ignore_errors=True)


def test_compact_parquet_reduces_file_count_preserving_rows(spark):
    from weighted_raster_overlay_service_toolbox_spark.operators.layout import (
        compact_parquet,
    )

    src = _bucketed_events(spark)
    path = os.path.join(_SCRATCH, "layout_compact")
    try:
        src.repartition(16).write.mode("overwrite").parquet(path)
        before = sorted(map(tuple, spark.read.parquet(path).collect()))
        n_before = len(glob.glob(os.path.join(path, "*.parquet")))
        assert n_before == 16
        n_after = compact_parquet(spark, path, target_file_bytes=10**9)
        assert n_after == 1
        assert len(glob.glob(os.path.join(path, "*.parquet"))) == 1
        assert not os.path.exists(path + ".compact.tmp")
        assert not os.path.exists(path + ".compact.old")
        assert sorted(map(tuple, spark.read.parquet(path).collect())) == before
        # sorted compaction restores a clustering key while compacting
        src.repartition(16).write.mode("overwrite").parquet(path)
        compact_parquet(spark, path, target_file_bytes=10**9, sort_col="bx")
        part = spark.read.parquet(path)
        assert sorted(map(tuple, part.collect())) == before
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path + ".compact.tmp", ignore_errors=True)
        shutil.rmtree(path + ".compact.old", ignore_errors=True)


def test_compact_parquet_sorted_multifile_honors_target_bytes(spark):
    """sort_col + target_file_bytes TOGETHER: a sub-total byte target
    must yield multiple range-partitioned files whose sort-key ranges
    are disjoint (round-5 nit: the unsorted repartition was built first
    and dead-assigned when sort_col was set; the branch is exclusive
    now, so the sorted path must still honor the file-count math)."""
    from weighted_raster_overlay_service_toolbox_spark.operators.layout import (
        compact_parquet,
    )
    import math

    src = _bucketed_events(spark)
    path = os.path.join(_SCRATCH, "layout_compact_sorted")
    try:
        src.repartition(16).write.mode("overwrite").parquet(path)
        before = sorted(map(tuple, spark.read.parquet(path).collect()))
        files = glob.glob(os.path.join(path, "*.parquet"))
        total = sum(os.path.getsize(f) for f in files)
        target = math.ceil(total / 4)  # expect ceil(total/target) == 4
        n_after = compact_parquet(
            spark, path, target_file_bytes=target, sort_col="bx"
        )
        out_files = glob.glob(os.path.join(path, "*.parquet"))
        # range partitions can be empty (repartitionByRange picks bounds
        # by SAMPLING, which on a small fixture can legally collapse to
        # one non-empty partition) -- so the hard contract is the upper
        # bound + row preservation + disjoint spans below, not a lower
        # file count; requiring >1 would be flaky, not strict (r6
        # advice).
        assert 1 <= n_after <= 4, n_after
        assert len(out_files) == n_after
        assert sorted(map(tuple, spark.read.parquet(path).collect())) == before
        # files tile DISJOINT bx ranges (the point of sorted compaction)
        spans = sorted(
            tuple(
                spark.read.parquet(f)
                .agg(F.min("bx"), F.max("bx"))
                .first()
            )
            for f in out_files
        )
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, spans
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path + ".compact.tmp", ignore_errors=True)
        shutil.rmtree(path + ".compact.old", ignore_errors=True)


def test_zorder_write_shrinks_file_bounding_boxes(spark):
    src = _bucketed_events(spark)
    z_path = os.path.join(_SCRATCH, "layout_zorder")
    flat_path = os.path.join(_SCRATCH, "layout_flat")
    try:
        write_zordered(
            src, z_path, zorder_key(F.col("bx"), F.col("by")), n_files=8
        )
        # unclustered control: same rows, hash-scattered into 8 files
        src.repartition(8).write.mode("overwrite").parquet(flat_path)

        # layout changed, data did not
        z = spark.read.parquet(z_path)
        assert sorted(map(tuple, z.collect())) == sorted(
            map(tuple, src.collect())
        )

        area_z = _file_stats_area(z_path)
        area_flat = _file_stats_area(flat_path)
        # hash scatter puts ~the full (bx, by) range in every file; the
        # z-ordered tiling must cut the advertised search area hard
        assert area_z < 0.5 * area_flat, (area_z, area_flat)
    finally:
        shutil.rmtree(z_path, ignore_errors=True)
        shutil.rmtree(flat_path, ignore_errors=True)
