"""Fixture-table loaders.

The reference accesses its catalog through geodatabase cursors with explicit
field lists and where clauses (``WROS/Weighted Raster Overlay Service.pyt:122,
152``); here every scan is a parquet read whose projection and predicates
Catalyst pushes into the scan (``PushedFilters`` / ``ReadSchema``).

At 100 TB the same call reads a partitioned parquet/Delta layout; nothing in
the API changes -- partition pruning comes from Catalyst, not from code here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Pin the runtime confs query correctness depends on. The driver may
    hand us a session built elsewhere (not via ``session.get_spark``):
    hour()/unix_timestamp() answers follow the session time zone, and the
    DuckDB oracles assume UTC. Pinned once per session (conf.set is a
    py4j round trip; load_table is called several times per query)."""
    if getattr(spark, "_wros_confs_pinned", False):
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark._wros_confs_pinned = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan -- column pruning and
    predicate pushdown are applied by Catalyst at the call sites.

    If ``sf_dir`` carries a ``_layout.json`` manifest (written by
    sources/layout.py write_layout -- the SURVEY section-4 100 TB
    posture: date/type-partitioned events, order-key-bucketed
    lineitem/orders, Z-ordered documents), the table resolves from that
    layout instead: same data contract, different physical plan. Every
    registry query runs unchanged against either storage."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    from .layout import layout_manifest, load_layout_table

    manifest = layout_manifest(sf_dir)
    if manifest is not None and manifest.get(name, {}).get("kind", "flat") != "flat":
        return load_layout_table(spark, sf_dir, name, manifest[name])
    if name == "events":
        # ts encoding differs across fixture generations: TIMESTAMP(NANOS)
        # (no Spark type -- read nanos-as-long, truncate to micros the way
        # DuckDB does; integer division, double loses precision at 1.7e18)
        # or plain TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ -- cast to the
        # session-zone timestamp; session tz is pinned UTC so instants are
        # unchanged and downstream window/watermark types stay stable).
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
