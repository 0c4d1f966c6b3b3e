"""Window-function queries (SURVEY.md section 2.2 "Window functions").

Reference anchors: lead-based range construction (R18/R19,
``WROS/Weighted Raster Overlay Service.pyt:1119-1138``) and contiguity
checks (R25, ``.pyt:199-217``) are genuinely window-shaped.

Scale notes: every window here partitions by a real key (order, segment,
user), so the sort is per-partition after one hash shuffle -- no global
sort, no single-partition window over data-sized input (the empty-
partitionBy window in ``q_win_running`` runs over supplier, a fixed
100-row dimension, by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import duck_round

from ..sources import load_table
from .registry import query


@query(
    "q_win_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rk,
           DENSE_RANK() OVER w AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per customer with unique tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@query(
    "q_win_lead_lag",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           LAG(l_quantity) OVER w AS prev_qty,
           LEAD(l_quantity) OVER w AS next_qty,
           LEAD(l_quantity, 2, -1.0) OVER w AS next2_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey)
    """,
)
def q_win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag with offset + default -- the reference's range-pairing and
    contiguity idioms (R19/R25)."""
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the fixture data --
    # l_partkey/l_suppkey complete a unique ordering (ROWS frames and
    # lead/lag are only deterministic under a total order).
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.lead("l_quantity", 2, -1.0).over(w).alias("next2_qty"),
    )


@query(
    "q_win_running",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) OVER (
               ORDER BY s_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_bal
    FROM supplier
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum, unbounded-preceding..current. Global ordering over
    the fixed-size supplier dimension (100 rows at every sf) -- a
    data-sized cumulative sum would partition by key instead."""
    s = load_table(spark, sf_dir, "supplier")
    w = (
        Window.orderBy("s_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.sum(F.col("s_acctbal").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_bal"),
    )


@query(
    "q_win_frame_rows",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,4))) OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey
               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
           ), 2) AS DOUBLE) AS smooth_qty
    FROM lineitem
    """,
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding rows frame (-1..+1 moving average) within each order."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
        .rowsBetween(-1, 1)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.avg(F.col("l_quantity").cast("decimal(18,4)")).over(w), 2)
        .cast("double")
        .alias("smooth_qty"),
    )


@query(
    "q_win_frame_range",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING
           ) AS n_similar
    FROM orders
    """,
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: how many of the customer's orders fall within +-10k of
    this one's price (value-based frame, not row-based)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar"),
    )


@query(
    "q_win_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(c_custkey) OVER w AS richest_key,
           LAST_VALUE(c_custkey) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS poorest_key
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def q_win_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + first/last value. last_value needs the full-partition frame
    (the default frame stops at CURRENT ROW in both engines)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_custkey").over(w).alias("richest_key"),
        F.last("c_custkey").over(w_full).alias("poorest_key"),
    )


@query(
    "q_win_percent_rank",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(ROUND(PERCENT_RANK() OVER w, 6) AS DOUBLE) AS pct_rank,
           CAST(ROUND(CUME_DIST() OVER w, 6) AS DOUBLE)    AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over a unique total order -- computed by
    the TWO-PASS range-partitioned rank (operators/rank.py global_rank),
    not ``Window.orderBy`` with no partition spec (re-planned round 14,
    VERDICT r13 #3: the unpartitioned window moves the whole orders
    table through ONE reducer -- the last scale-killer class).

    The semantics are global by definition, but over the UNIQUE order
    (o_totalprice, o_orderkey) both functions are pure expressions of
    the global row_number r and the total count n:
    ``percent_rank = (r - 1) / (n - 1)`` (ties impossible, so the
    min-rank-of-tie-group definition collapses to row_number) and
    ``cume_dist = r / n`` (rows ordered <= current == r). global_rank
    reproduces row_number exactly for a unique order (rank is invariant
    to where the sampled range boundaries fall), so VALUES ARE UNCHANGED
    and the oracle stays the window-function SQL. n arrives as a literal
    from the offsets pass -- no second scan. Plan pinned single-
    partition-window-free by tests/test_plans.py."""
    from ..operators.rank import global_rank

    o = load_table(spark, sf_dir, "orders")
    ranked, n = global_rank(
        o.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        rank_col="_r",
    )
    return ranked.select(
        "o_orderkey",
        "o_totalprice",
        duck_round((F.col("_r") - 1) / F.lit(float(max(n - 1, 1))), 6)
        .cast("double")
        .alias("pct_rank"),
        duck_round(F.col("_r") / F.lit(float(max(n, 1))), 6)
        .cast("double")
        .alias("cume"),
    )


@query(
    "q_win_time_range",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_trailing_hour,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE)
               AS sum_trailing_hour
    FROM events
    WHERE user_id < 50
    WINDOW w AS (
        PARTITION BY user_id
        ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour RANGE frame per user: count and value of each
    event's preceding 60 minutes -- the event-level rolling feature
    (rate limiting, burst detection, trailing spend) that a grouped
    tumbling window cannot express because every row needs its OWN
    trailing interval.

    Engine alignment: both sides order by floor(epoch seconds) so the
    value-based frame boundary is identical despite microsecond
    timestamps. Scale: one shuffle keyed by user_id; the frame is
    evaluated in a single sorted pass per partition (no self-join --
    the naive ts-range self-join is quadratic per user)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).over(w), 2)
        .cast("double")
        .alias("sum_trailing_hour"),
    )
