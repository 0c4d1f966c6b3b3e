"""Set operations (SURVEY.md section 2.2). Reference anchor: bulk append
R5 (``WROS/Weighted Raster Overlay Service.pyt:842``).

UNION ALL is free (no shuffle -- partitions concatenate); DISTINCT /
INTERSECT / EXCEPT shuffle on the full row as the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


def _split_halves(spark: SparkSession, sf_dir: str):
    """Two overlapping customer slices to make set ops non-trivial."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    lo = c.filter(F.col("c_custkey") <= 1000)
    hi = c.filter(F.col("c_custkey") >= 500)
    return lo, hi


@query(
    "q_union_all",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 1000
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey >= 500
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName keeps duplicates (append semantics, R5)."""
    lo, hi = _split_halves(spark, sf_dir)
    return lo.unionByName(hi)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 1000
    UNION
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey >= 500
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): append + dedup shuffle."""
    lo, hi = _split_halves(spark, sf_dir)
    return lo.unionByName(hi).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 1000
    INTERSECT
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey >= 500
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) -- rows in both slices."""
    lo, hi = _split_halves(spark, sf_dir)
    return lo.intersect(hi)


@query(
    "q_except",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 1000
    EXCEPT ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey >= 500
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL -- multiset difference (keeps multiplicity)."""
    lo, hi = _split_halves(spark, sf_dir)
    return lo.exceptAll(hi)


def _multiset_halves(spark: SparkSession, sf_dir: str):
    """Two overlapping lineitem slices with REPEATED (orderkey, flag)
    rows, so the ALL-variants genuinely differ from the distinct ones."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    lo = li.filter(F.col("l_orderkey") <= 2000)
    hi = li.filter(F.col("l_orderkey") >= 1000)
    return lo, hi


@query(
    "q_intersect_all",
    oracle="""
    SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_orderkey <= 2000
    INTERSECT ALL
    SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_orderkey >= 1000
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL -- multiset intersection (min of the two
    multiplicities per row). One shuffle keyed by the full row with
    per-side counts; rows repeated k times in both slices appear k
    times, which plain INTERSECT collapses to one."""
    lo, hi = _multiset_halves(spark, sf_dir)
    return lo.intersectAll(hi)


@query(
    "q_except_distinct",
    oracle="""
    SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_orderkey <= 2000
    EXCEPT
    SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_orderkey >= 1000
    """,
)
def q_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) -- set difference with dedup, the complement of
    q_except's EXCEPT ALL: a row present 5 times on the left and 0 on
    the right appears once here, 5 times there."""
    lo, hi = _multiset_halves(spark, sf_dir)
    return lo.subtract(hi)
