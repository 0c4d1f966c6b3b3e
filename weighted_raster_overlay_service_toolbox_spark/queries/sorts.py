"""Sort / limit / top-k queries (SURVEY.md section 2.2).

Scale notes: a global ``orderBy`` is a range-partitioned sort (sampling
pass + shuffle); ``orderBy().limit(k)`` is NOT that -- Spark plans
``TakeOrderedAndProject``: each partition keeps its local top-k, the
driver merges k*partitions rows. Top-k per group uses a window rank,
one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query(
    "q_sort_multi",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column asc/desc global sort (hash is order-insensitive; this
    query exists for plan coverage of the range-partitioned sort)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", "s_nationkey", "s_acctbal").orderBy(
        F.col("s_nationkey").asc(), F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by price with a unique-key tiebreak (LIMIT is order
    sensitive -- SURVEY section 2.2 conventions). Plans as
    TakeOrderedAndProject: no global sort ever materializes."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rk
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey ASC)
                   AS rk
        FROM customer
    )
    WHERE rk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per market segment via row_number + filter.
    Rank filter pushes a per-partition limit under the window at runtime
    (WindowGroupLimit), so the shuffle carries only candidate rows."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )
