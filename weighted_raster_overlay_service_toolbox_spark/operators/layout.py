"""Data-layout operators: multi-dimensional clustering for scan pruning.

The 100 TB read path lives or dies on file/row-group skipping: parquet
footers carry min/max per column, and the engine prunes any file whose
stats exclude the predicate. A single-column sort makes ONE column's
stats selective; interleaving the bits of two columns (Morton / Z-order
-- the technique behind Delta/Iceberg ``ZORDER BY``) makes BOTH
selective at once, so point/range predicates on either dimension skip
most files.

``zorder_key`` is a pure bitwise expression chain (whole-stage codegen,
no UDF, no shuffle); ``write_zordered`` pairs it with
``repartitionByRange`` (range-partition the keyspace so files tile the
curve) + ``sortWithinPartitions`` (row groups tile within each file).
tests/test_layout.py PROVES the effect from the written parquet footers:
the per-file bounding area over the two dimensions shrinks by an order
of magnitude vs an unclustered write of the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    Callers bucket raw values into [0, 2^bits) first (modulo or
    width-scaling); the chain stays inside whole-stage codegen."""
    return zorder_key_nd([x, y], bits)


def zorder_key_nd(cols: list[Column], bits: int = 8) -> Column:
    """N-dimensional Morton interleave (round-robin bit placement: bit i
    of column d lands at position i*N + d). 64-bit output bounds N*bits
    <= 63. Two dims cover the common (key, time) layout; 3-4 dims are
    the practical ceiling -- each added dimension halves the per-dim
    resolution at fixed key width, which is the standard Z-order
    trade-off."""
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key_nd needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds the 63-bit key budget")
    # Cast to long FIRST: shiftleft preserves the input's integer type,
    # and a Java int shift wraps mod 32 -- an IntegerType input with a
    # bit landing at position >= 32 (e.g. 3 dims x 16 bits) would
    # silently produce a wrong key. Long shifts honor the full 63-bit
    # budget regardless of the caller's column type.
    longs = [c.cast("long") for c in cols]
    key: Column | None = None
    for i in range(bits):
        for d, c in enumerate(longs):
            b = F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d)
            key = b if key is None else key + b
    assert key is not None
    return key


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dir into
    ``ceil(total_bytes / target_file_bytes)`` files; returns the new file
    count. The maintenance pass every streaming/incremental sink needs --
    micro-batches and per-executor writers leave file counts that grow
    without bound, and at 100 TB scan cost is driven by file COUNT
    (footer reads, task scheduling) as much as bytes.

    ``sort_col`` optionally re-sorts within files during the rewrite (the
    natural moment to restore a clustering key, e.g. a Z-order key --
    compaction and re-clustering share the same read+write).

    Crash-tolerant, not atomic: the rewrite lands in a sibling
    ``<path>.compact.tmp`` and swaps in via TWO renames (original ->
    ``.compact.old``, tmp -> original). A crash during the rewrite
    leaves the original untouched; a crash BETWEEN the renames leaves
    the dataset path briefly absent with the bytes preserved in
    ``.compact.old`` -- the recovery preamble below restores it on the
    next call, so a re-run always starts from intact data. (True
    single-rename atomicity needs a versioned-pointer scheme like
    sources/catalog_store.py; directory swap-in-place cannot have it.)"""
    import glob as _glob
    import math
    import os
    import shutil

    tmp, old = path + ".compact.tmp", path + ".compact.old"
    # Recovery: a previous run that crashed between its two renames left
    # the dataset absent and the original bytes in .compact.old.
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    shutil.rmtree(tmp, ignore_errors=True)

    files = _glob.glob(os.path.join(path, "*.parquet"))
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_col is not None:
        out = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(_glob.glob(os.path.join(path, "*.parquet")))


def write_zordered(
    df: DataFrame, path: str, key: Column, n_files: int
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by ``key``:
    range-partition the key space (files tile disjoint key ranges --
    a hash repartition would scatter the curve) then sort within each
    partition (row groups tile within the file). The key column is
    dropped before the write; only the layout changes, never the data."""
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
