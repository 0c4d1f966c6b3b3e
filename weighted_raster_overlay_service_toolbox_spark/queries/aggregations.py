"""Aggregation queries (SURVEY.md section 2.2 "Aggregations").

Reference anchors: per-raster min/max and full statistics
(``WROS/Weighted Raster Overlay Service.pyt:303-304, 853-855, 897-900``),
cardinality checks (``.pyt:1052-1055``), duplicate detection
(``.pyt:738-740, 1151-1155``).

Scale notes: every groupBy below is a hash aggregate with map-side partial
aggregation (one shuffle of the *partially aggregated* data, not the raw
rows); group keys are low-cardinality strings/ints so the shuffle is tiny
even at 100 TB. ``countDistinct`` expands to a two-phase distinct+agg plan;
``approx_count_distinct`` (HLL) is the 100 TB path and is registered as its
own query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pinning import pin_corpus

from ..functions.rounding import duck_round

from ..sources import load_table
from .registry import davg, dsum, money, oavg, osum, query


@query(
    "q_agg_group",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity', 'sum_qty')},
           {osum('l_extendedprice', 'sum_base_price')},
           CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))
                * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2)
                AS DOUBLE) AS sum_charge,
           {oavg('l_quantity', 'avg_qty')},
           {oavg('l_extendedprice', 'avg_price')},
           {oavg('l_discount', 'avg_disc', 4)},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style grouped aggregate; the flagship ``entry()`` query.

    Plan shape: parquet scan (shipdate predicate pushed to row groups) ->
    partial hash agg -> single shuffle on 2 tiny keys -> final hash agg.
    Survives 100x scale: shuffle volume is O(groups), not O(rows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (
        money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    ).cast("decimal(18,4)")
    charge = disc_price * (F.lit(1) + money("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", cast=False),
            dsum(charge, "sum_charge", cast=False),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc", 4),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {osum('l_quantity', 'total_qty')},
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           {oavg('l_extendedprice', 'avg_price')}
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (keyless) aggregate -- count/sum/min/max/avg in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", "total_qty"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
        davg("l_extendedprice", "avg_price"),
    )


@query(
    "q_agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           {oavg('l_quantity', 'avg_qty')},
           CAST(ROUND(STDDEV_POP(l_quantity), 2) AS DOUBLE) AS std_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group count/min/max/avg/stddev -- the reference's
    ``CalculateStatistics_management`` (R14, ``.pyt:853-855``) as a grouped
    aggregate over the long cell table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        davg("l_quantity", "avg_qty"),
        duck_round(F.stddev_pop("l_quantity"), 2).cast("double").alias("std_qty"),
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group. Spark plans this as expand + two-phase
    aggregate; distinct-key shuffle is bounded by |custkey| not |rows|."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 12
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter -- the reference's duplicate-name detection
    (R22, ``.pyt:738-740``) generalized: groupBy + count + HAVING."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


@query(
    "q_agg_filtered",
    oracle=f"""
    SELECT l_linestatus,
           {osum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END",
                 'returned_revenue')},
           COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_high_discount,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: sum(when(...)) / count(when(...))."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        dsum(
            F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(
                F.lit(0.0)
            ),
            "returned_revenue",
        ),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias(
            "n_high_discount"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity', 'sum_qty')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (flag, status) including grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity', 'sum_qty')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations via CUBE."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS -- by flag only and by status only."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "q_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_2pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) -- the 100 TB path for
    distinct counting: mergeable sketches, no distinct-key shuffle.

    The raw sketch value is engine-specific, so the oracle-checkable
    statement is the accuracy *bound*: emit the exact count plus a boolean
    ``|approx - exact| / exact <= 2%`` (HLL rsd=0.01 gives ~1% stddev, so
    2% is a safe deterministic bound at fixture scale); DuckDB asserts the
    same exact count and a literal TRUE. The exact count here is the
    verification yardstick, not the production path -- at 100 TB only the
    sketch runs."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.count_distinct("l_partkey")
    approx = F.approx_count_distinct("l_partkey", 0.01)
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            / exact.cast("double")
            <= F.lit(0.02)
        ).alias("approx_within_2pct"),
    )


@query(
    "q_agg_argmax",
    oracle="""
    SELECT o_custkey,
           (MAX({'p': o_totalprice, 'k': o_orderkey})).k AS top_orderkey,
           (MAX({'p': o_totalprice, 'k': o_orderkey})).p AS top_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max via struct ordering: the orderkey of each customer's
    priciest order. MAX over a (value, unique-key) struct is the
    tie-safe form -- bare max_by/arg_max pick arbitrarily on equal
    values, which is not cross-engine deterministic."""
    o = load_table(spark, sf_dir, "orders")
    best = F.max(F.struct(F.col("o_totalprice"), F.col("o_orderkey")))
    return o.groupBy("o_custkey").agg(
        best.getField("o_orderkey").alias("top_orderkey"),
        best.getField("o_totalprice").alias("top_price"),
    )


@query(
    "q_agg_approx_quantile",
    oracle="""
    WITH r AS (
        SELECT l_returnflag, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber,
                            l_partkey, l_suppkey)        AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag,
           MAX(CASE WHEN rn = CEIL(0.5 * n) THEN l_extendedprice END)
               AS p50_exact,
           TRUE AS approx_within_5pct
    FROM r GROUP BY l_returnflag
    """,
)
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK quantile summaries) -- the 100 TB path for
    percentiles: mergeable sketches, no global sort. Same oracle pattern
    as q_agg_approx_distinct: the sketch value is engine-specific, so
    what is checked is the exact nearest-rank anchor plus the boolean
    accuracy bound |approx - exact| / exact <= 5% (accuracy=1000 gives
    ~0.1% rank error; 5% value tolerance is safely loose)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    wn = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    exact = F.max(
        F.when(
            F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")),
            F.col("l_extendedprice"),
        )
    )
    approx = F.expr("approx_percentile(l_extendedprice, 0.5, 1000)")
    return r.groupBy("l_returnflag").agg(
        exact.alias("p50_exact"),
        (F.abs(approx - exact) / exact <= F.lit(0.05)).alias(
            "approx_within_5pct"
        ),
    )


@query(
    "q_hll_rollup",
    oracle="""
    SELECT n.n_regionkey,
           COUNT(DISTINCT o.o_custkey) AS exact_customers,
           TRUE AS merge_within_5pct
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_regionkey
    """,
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch rollup: per-(region, nation) HLL sketches of
    ordering customers, UNIONed up to region level with
    ``hll_union_agg`` -- the pattern that makes distinct-count rollups
    cheap at 100 TB (pre-aggregate sketches once, merge for any coarser
    grain; never re-scan raw data). Checked as exact count + accuracy
    bound, same contract as q_agg_approx_distinct.

    Scale: the sketch build shuffles once on the fine grain; the merge
    shuffles sketch BYTES (KBs per group), not rows. The sketch leg and
    the exact yardstick leg share ONE scan+join (non-eager
    localCheckpoint on the 3-column joined projection) -- a
    test-harness cost only, since in production just the sketch leg
    runs."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_regionkey", "c_nationkey", "o_custkey")
        .transform(pin_corpus)
    )
    fine = joined.groupBy("n_regionkey", "c_nationkey").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk")
    )
    rolled = fine.groupBy("n_regionkey").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    # exact leg: the verification yardstick only -- at 100 TB only the
    # sketch path runs (the whole point of mergeability)
    exact = joined.groupBy("n_regionkey").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    return exact.join(F.broadcast(rolled), "n_regionkey").select(
        "n_regionkey",
        "exact_customers",
        (
            F.abs(
                F.col("est").cast("double")
                - F.col("exact_customers").cast("double")
            )
            / F.col("exact_customers").cast("double")
            <= F.lit(0.05)
        ).alias("merge_within_5pct"),
    )


@query(
    "q_agg_salted",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n, SUM(l_quantity) AS total
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-stage aggregation
    (``operators/skew.py:salted_count_sum``): stage 1 groups by
    (key, salt) so a hot key's rows combine on many reducers; stage 2
    combines the per-salt partials. Values are identical to the direct
    groupBy -- the oracle IS the direct groupBy, so the hash match proves
    the decomposition. (l_quantity is whole-valued, so the double sum is
    exact under any grouping order; fractional measures would go through
    the DECIMAL helpers like every money aggregate here.)

    Scale: map-side partial agg runs in both stages; the extra shuffle
    moves only n_salts rows per key, and the one-key-one-reducer
    straggler disappears."""
    from ..operators.skew import salted_count_sum

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    return salted_count_sum(li, key="l_suppkey", value="l_quantity", n_salts=16)


@query(
    "q_histogram_numeric",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 600000 THEN 21
                ELSE CAST(floor(o_totalprice / 30000.0) + 1 AS INT) END AS bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram: 20 buckets of 30k over [0, 600k)
    (overflow bucket 21), with per-bucket count and observed min/max --
    the distribution profile a data-quality dashboard draws, and the
    boundary logic NDV/selectivity estimators share. The bucket id is
    the SAME floor-division arithmetic in both engines (IEEE double
    division + floor -- bit-identical), written out manually because
    width_bucket is not universally available.

    Scale: one scan, one shuffle on <=21 bucket keys with map-side
    partials -- output is bucket-count-sized regardless of row count."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 600000, F.lit(21))
        .otherwise((F.floor(F.col("o_totalprice") / 30000.0) + 1).cast("int"))
        .cast("int")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


@query(
    "q_histogram_equidepth",
    oracle="""
    WITH r AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey)      AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(((rn - 1) * 4) // n + 1 AS INTEGER) AS bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM r
    GROUP BY o_orderpriority, CAST(((rn - 1) * 4) // n + 1 AS INTEGER)
    """,
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile) histogram per order priority: each bucket
    holds ~n/4 rows and the observed [lo, hi] spans are the varying-
    width boundaries -- the histogram shape optimizers use for
    selectivity on skewed columns, where equi-width buckets collapse.

    The bucket id is pure integer arithmetic on the unique rank
    (((rn-1)*4) DIV n + 1), identical in both engines -- NOT ntile
    (remainder placement is implementation-defined) and NOT
    interpolated percentile boundaries (cross-engine float trap, see
    q_agg_percentile).

    Scale: one window shuffle on the group key + one grouped
    aggregation -- this is the exact anchor; at 100 TB the scale path
    computes approximate boundaries (approx_percentile, mergeable
    sketches) and assigns buckets in a single scan without the global
    per-group sort."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bucket = F.expr("CAST(((rn - 1) * 4) DIV n + 1 AS INT)").alias("bucket")
    return r.groupBy("o_orderpriority", bucket).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )
