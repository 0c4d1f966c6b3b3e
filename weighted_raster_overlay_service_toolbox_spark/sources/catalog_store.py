"""Catalog persistence: the reference's DDL / existence / introspection
surface (R6-R11) as a parquet-backed store.

The reference creates a mosaic dataset (``CreateMosaicDataset_management``,
``WROS/Weighted Raster Overlay Service.pyt:805``), adds its TEXT columns by
DDL (``AddFields_management``, ``.pyt:814``), drops-if-exists
(``Delete_management``, ``.pyt:794-796``), existence-checks with
``arcpy.Exists`` (``.pyt:284, 674, 765``), and validates schema-by-name
with ``ListFields`` (``.pyt:139-147, 441-449``). Here the catalog is a
parquet directory: DDL is writing an empty frame with the schema,
existence is a filesystem check, introspection is ``df.schema``, and the
keyed read-modify-write update cycle becomes read -> CASE override ->
atomic replace.

Scale: the catalog is layer-metadata-sized. The store keeps it a plain
parquet dir (snapshot-replace writes); at real scale the same API maps to
a table format with MERGE, without changing callers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: canonical catalog schema (``.pyt:592-603`` plus the system Name key).
CATALOG_SCHEMA = StructType(
    [
        StructField("Name", StringType()),
        StructField("Title", StringType()),
        StructField("Description", StringType()),
        StructField("Url", StringType()),
        StructField("InputRanges", StringType()),
        StructField("NoDataRanges", StringType()),
        StructField("RangeLabels", StringType()),
        StructField("NoDataRangeLabels", StringType()),
        StructField("OutputValues", StringType()),
        StructField("Metadata", StringType()),
        StructField("dataset_id", StringType()),
    ]
)

#: required columns each tool validates before touching a catalog
#: (``.pyt:139-147`` classification; ``.pyt:441-449`` layer info).
REQUIRED_CLASSIFICATION = ["Name", "Title", "RangeLabels", "InputRanges", "OutputValues"]
REQUIRED_LAYER_INFO = ["Name", "Title", "Description", "Url", "Metadata"]


def catalog_exists(path: str) -> bool:
    """R9 (``arcpy.Exists``): a catalog exists iff its dir has a footer."""
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def create_catalog(spark: SparkSession, path: str, overwrite: bool = False) -> None:
    """R6/R7/R8: create the empty catalog with the canonical schema;
    drop-if-exists only when asked (the reference's boolean param,
    ``.pyt:638-643, 794-796``)."""
    if catalog_exists(path):
        if not overwrite:
            raise FileExistsError(f"catalog already exists: {path}")
        shutil.rmtree(path)
    if overwrite:
        # a rebuilt store must start with a clean history even when the
        # live dir itself was already removed by the caller
        purge_history(path)
    spark.createDataFrame([], CATALOG_SCHEMA).write.parquet(path)


def _swap_paths(path: str) -> tuple[str, str]:
    base = path.rstrip("/")
    return base + ".tmp", base + ".old"


def _version_path(path: str, n: int) -> str:
    return path.rstrip("/") + f".v{n:05d}"


def catalog_versions(path: str) -> list[int]:
    """Retained historical snapshot numbers, ascending (empty when the
    store was never replaced with ``keep_history > 0``). The LIVE
    snapshot is always one newer than the highest retained version."""
    base = os.path.basename(path.rstrip("/")) + ".v"
    parent = os.path.dirname(path.rstrip("/")) or "."
    out = []
    if os.path.isdir(parent):
        for name in os.listdir(parent):
            if name.startswith(base) and name[len(base):].isdigit():
                out.append(int(name[len(base):]))
    return sorted(out)


def purge_history(path: str) -> None:
    """Remove every retained snapshot (used by ``create_catalog`` on
    overwrite so a rebuilt store starts with a clean history)."""
    for n in catalog_versions(path):
        shutil.rmtree(_version_path(path, n), ignore_errors=True)


def recover_catalog(path: str) -> None:
    """Finish or roll back a :func:`replace_catalog` interrupted mid-swap.

    The swap has one unsafe window: after the live dir is renamed to
    ``.old`` and before the new snapshot is renamed in, no catalog exists
    at ``path``. Detection is unambiguous: ``path`` missing + ``.old``
    present. Recovery rolls FORWARD to the new snapshot when its write
    completed (parquet ``_SUCCESS`` marker in ``.tmp``), else rolls BACK
    to the previous snapshot -- either way a complete catalog is restored
    and the leftovers are cleared. Called automatically by
    :func:`load_catalog` and :func:`replace_catalog`; no-op when a live
    catalog exists."""
    tmp, old = _swap_paths(path)
    if os.path.isdir(path) or not os.path.isdir(old):
        return
    if os.path.isfile(os.path.join(tmp, "_SUCCESS")):
        os.rename(tmp, path)
    else:
        os.rename(old, path)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def load_catalog(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the live catalog, or -- time travel -- a retained historical
    snapshot by number (see :func:`replace_catalog` ``keep_history``)."""
    recover_catalog(path)
    if version is not None:
        vpath = _version_path(path, version)
        if not os.path.isdir(vpath):
            raise FileNotFoundError(
                f"no snapshot v{version} at {path} "
                f"(retained: {catalog_versions(path)})"
            )
        return spark.read.parquet(vpath)
    if not catalog_exists(path):
        raise FileNotFoundError(f"no catalog at {path}")
    return spark.read.parquet(path)


def missing_columns(df: DataFrame, required: list[str]) -> list[str]:
    """R10 schema introspection: required-by-name validation."""
    have = set(df.columns)
    return [c for c in required if c not in have]


def append_rows(spark: SparkSession, path: str, rows: DataFrame) -> None:
    """R5 bulk load (``AddRastersToMosaicDataset``, ``.pyt:842``): align
    to the catalog schema by name, fill absent columns with NULL."""
    cat = load_catalog(spark, path)
    aligned = rows.select(
        *[
            F.col(c).cast("string").alias(c)
            if c in rows.columns
            else F.lit(None).cast("string").alias(c)
            for c in cat.columns
        ]
    )
    # ONE file per append (r15, guide section 6): the catalog is
    # layer-metadata-sized, but an un-coalesced write emits one tiny
    # part file per upstream partition plus per-file commit ceremony --
    # the small-files cost paid again on every subsequent load.
    # repartition(1), NOT coalesce(1): coalesce propagates the 1-task
    # constraint up through the aligning projection into the upstream
    # plan, serializing its computation (paired A/B on q_catalog_merge:
    # coalesce ~6.3s vs repartition ~1.9s); the keyless repartition is
    # a tiny exchange of metadata-sized rows that leaves the upstream
    # stage parallel.
    aligned.repartition(1).write.mode("append").parquet(path)


def merge_rows(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str = "Name",
    keep_history: int = 0,
) -> None:
    """MERGE (upsert) into the catalog: rows whose ``key`` matches an
    existing row replace it column-by-column (non-null update values
    win, nulls keep the current value); unmatched rows insert. Runs as
    one full-outer join + snapshot replace -- the WHEN MATCHED THEN
    UPDATE / WHEN NOT MATCHED THEN INSERT shape of a table format's
    MERGE, observable-equivalent over the plain-parquet store.

    Scale: the catalog is metadata-sized so snapshot-replace is fine; at
    real scale the identical call maps onto a format MERGE (copy-on-write
    or MoR) without changing callers."""
    cat = load_catalog(spark, path)
    aligned = updates.select(
        *[
            F.col(c).cast("string").alias(c)
            if c in updates.columns
            else F.lit(None).cast("string").alias(c)
            for c in cat.columns
        ]
    )
    u = aligned.select(
        F.col(key).alias("_uk"),
        *[F.col(c).alias(f"_u_{c}") for c in cat.columns if c != key],
    )
    merged = cat.join(u, cat[key] == u["_uk"], "full_outer").select(
        F.coalesce(cat[key], F.col("_uk")).alias(key),
        *[
            F.coalesce(F.col(f"_u_{c}"), cat[c]).alias(c)
            for c in cat.columns
            if c != key
        ],
    )
    replace_catalog(path, merged, keep_history=keep_history)


def catalog_diff(
    spark: SparkSession,
    path: str,
    v_from: int | None,
    v_to: int | None,
    key: str = "Name",
) -> DataFrame:
    """Change data feed between two snapshots (``None`` = live): one row
    per changed key with ``change_type`` insert/update/delete. A
    full-outer join on the key; an update is any key present in both
    whose non-key columns differ (null-safe compare). The row-level diff
    a downstream incremental consumer replays instead of re-reading the
    whole table."""
    a = load_catalog(spark, path, version=v_from)
    b = load_catalog(spark, path, version=v_to)
    cols = a.columns
    bb = b.select(
        F.col(key).alias("_bk"),
        *[F.col(c).alias(f"_b_{c}") for c in cols if c != key],
    )
    j = a.join(bb, a[key] == bb["_bk"], "full_outer")
    changed = None
    for c in cols:
        if c == key:
            continue
        ne = ~a[c].eqNullSafe(F.col(f"_b_{c}"))
        changed = ne if changed is None else (changed | ne)
    change = (
        F.when(a[key].isNull(), "insert")
        .when(F.col("_bk").isNull(), "delete")
        .when(changed, "update")
    )
    return j.select(
        F.coalesce(a[key], F.col("_bk")).alias(key),
        change.alias("change_type"),
        *[F.col(f"_b_{c}").alias(c) for c in cols if c != key],
    ).filter(F.col("change_type").isNotNull())


def replace_catalog(
    path: str, updated: DataFrame, keep_history: int = 0
) -> None:
    """Atomic-ish snapshot replace for keyed updates (R4): write the new
    snapshot beside the old, then swap. The reference's UpdateCursor
    mutates in place; snapshot-replace is the parquet-world equivalent
    with the same observable result.

    ``keep_history``: when > 0, the displaced snapshot is RETAINED as
    ``{path}.v{N}`` (N = one past the highest retained version) instead
    of deleted, and only the newest ``keep_history`` snapshots are kept
    -- the minimal table-format surface: snapshot isolation (readers of
    a version dir never see the swap) and time travel
    (``load_catalog(..., version=N)``; ``catalog_versions``). At real
    scale the same API maps to a format with a metadata log (Delta/
    Iceberg); the store keeps the layout a plain parquet dir per
    snapshot.

    Crash safety: a crash inside the two-rename window leaves ``path``
    missing but ``.old`` (and a complete ``.tmp``) present;
    :func:`recover_catalog` -- run here and on every load -- rolls the
    swap forward or back, so the LIVE catalog is never lost. One honest
    caveat: recovery clears ``.old`` without archiving it, so the
    displaced snapshot of the interrupted replace is dropped from
    HISTORY (older retained versions are untouched) -- durability of the
    live table wins over completeness of the version log, the same
    priority a metadata-log format makes."""
    recover_catalog(path)
    tmp, old = _swap_paths(path)
    shutil.rmtree(tmp, ignore_errors=True)
    # ONE file per snapshot commit (r15, VERDICT r14 #6 / guide section
    # 6): the merged/updated relation arrives with join-output
    # partitioning (mostly empty tasks at catalog size), and every
    # versioned replace used to commit that many part files. A single
    # file per snapshot cuts write-task and per-file commit overhead
    # per MERGE/replace and keeps history dirs one-file-per-version.
    # repartition(1), NOT coalesce(1): coalesce folds the full-outer
    # MERGE join itself into one task (paired A/B on q_catalog_merge:
    # ~6.3s vs ~1.9s); the keyless repartition exchanges only the
    # metadata-sized snapshot rows and keeps the join parallel. Values
    # and MERGE semantics untouched.
    updated.repartition(1).write.parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    if keep_history > 0:
        versions = catalog_versions(path)
        os.rename(old, _version_path(path, (versions[-1] if versions else 0) + 1))
        for stale in catalog_versions(path)[:-keep_history]:
            shutil.rmtree(_version_path(path, stale), ignore_errors=True)
    else:
        shutil.rmtree(old, ignore_errors=True)
