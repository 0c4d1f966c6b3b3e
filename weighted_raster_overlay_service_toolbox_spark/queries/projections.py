"""Projection / filter / predicate queries (SURVEY.md section 2.2).

Reference anchors: layer filter pipeline (R23, ``WROS/Weighted Raster
Overlay Service.pyt:710-745``), URL prefix check (R27, ``.pyt:485-491``),
blank->null coercion (R29, ``.pyt:278-279, 535-543``).

All predicates are Catalyst-native column expressions -- no Python UDFs --
so they stay inside whole-stage codegen and push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import duck_round

from ..sources import load_table
from .registry import money, query


@query(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(ROUND(l_quantity * 2.54, 2) AS DOUBLE) AS qty_cm
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection: exact decimal money product + rounded double."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (money("l_extendedprice") * (F.lit(1) - money("l_discount")))
        .cast("double")
        .alias("revenue"),
        duck_round(F.col("l_quantity") * 2.54, 2).cast("double").alias("qty_cm"),
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P') OR o_totalprice BETWEEN 100000 AND 150000)
      AND NOT (o_orderpriority LIKE '5%')
      AND o_custkey <> 42
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN + LIKE in one predicate tree."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (
            F.col("o_orderstatus").isin("F", "P")
            | F.col("o_totalprice").between(100000, 150000)
        )
        & ~F.col("o_orderpriority").like("5%")
        & (F.col("o_custkey") != 42)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q_filter_null",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_coalesced
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL with nullif/coalesce -- the reference's blank->null
    coercion (R29, ``.pyt:278-279``) as column expressions."""
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_coalesced"),
    ).filter(F.col("status_or_null").isNotNull())


@query(
    "q_filter_string_preds",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE starts_with(p_brand, 'Brand#1')
       OR p_type LIKE '%ANODIZED'
       OR contains(p_name, 'widget')
    """,
)
def q_filter_string_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """startswith/endswith/contains (R23 name-pattern filters, R27 URL
    prefix validation)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").startswith("Brand#1")
        | F.col("p_type").endswith("ANODIZED")
        | F.col("p_name").contains("widget")
    ).select("p_partkey", "p_name", "p_brand", "p_type")
