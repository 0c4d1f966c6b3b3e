"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``weighted_raster_overlay_service_toolbox_spark``;
this module just re-exports the declared-query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weighted_raster_overlay_service_toolbox_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style grouped aggregate, SURVEY.md section
    2.2 q_agg_group) on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_agg_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each query. As of late round 5 EVERY
    registered query is oracle-backed -- the last rows-only holdout
    (q_multimodal_struct) now serializes its binary/struct columns at
    the query boundary so the driver can hash them."""
    return dict(ORACLES)
