"""Extended relational surface: pivot/unpivot, exact percentiles, the
spark.sql front end, and catalog CSV decode.

Reference anchors: the overlay's long->wide layer pivot is the shape of
R40 (``WROS/Weighted Raster Overlay Service.pyt`` README overlay
semantics); CSV decode is R32 (``.pyt:161-175, 1328-1332``) -- the
reference parses its own catalog TEXT columns back into parallel lists on
every tool invocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.wro import wro_catalog, wro_catalog_sql
from ..sources import load_table
from .registry import query


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (l_linestatus = 'F'), 2) AS DOUBLE) AS qty_f,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (l_linestatus = 'O'), 2) AS DOUBLE) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot on a bounded key set (R40's layer pivot shape).

    Values are enumerated explicitly -- an un-enumerated pivot needs an
    extra distinct pass over the data at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2).cast("double"))
    )
    return piv.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
    FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt): the inverse of the layer pivot; the
    wro_cells fixture itself is this shape."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


@query(
    "q_agg_percentile",
    oracle="""
    WITH r AS (
        SELECT l_returnflag, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber,
                            l_partkey, l_suppkey)                  AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag)           AS n
        FROM lineitem
    )
    SELECT l_returnflag,
           MAX(CASE WHEN rn = CEIL(0.5  * n) THEN l_extendedprice END) AS p50,
           MAX(CASE WHEN rn = CEIL(0.9  * n) THEN l_extendedprice END) AS p90,
           MAX(CASE WHEN rn = CEIL(0.99 * n) THEN l_extendedprice END) AS p99
    FROM r
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (nearest-rank) percentiles: the value at row
    ceil(q * n) of the uniquely-ordered group. Interpolated percentiles
    are NOT cross-engine hash-stable -- a median that lands between two
    2-decimal values is an .XX5 rounding boundary where Spark and DuckDB
    differ in the last ulp -- so the exact anchor picks real data values
    instead. At 100 TB use approx_percentile; this is the correctness
    anchor."""
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

    def at_q(q: float, alias: str):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("l_extendedprice")
            )
        ).alias(alias)

    return r.groupBy("l_returnflag").agg(
        at_q(0.5, "p50"), at_q(0.9, "p90"), at_q(0.99, "p99")
    )


@query(
    "q_sql_api",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql front end over registered temp views -- the same
    declarative text a SQL-first user would run; Catalyst plans it
    identically to the DataFrame form."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS revenue
        FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )


@query(
    "q_wro_decode_ranges",
    oracle=f"""
    WITH {wro_catalog_sql()},
    split AS (
        SELECT Name, string_split(InputRanges, ',') AS bounds,
               string_split(OutputValues, ',') AS outs
        FROM wro_catalog
    )
    SELECT Name,
           CAST(i AS INT)                                   AS range_idx,
           CAST(bounds[2 * i + 1] AS DOUBLE)                AS lo,
           CAST(bounds[2 * i + 2] AS DOUBLE)                AS hi,
           CAST(outs[i + 1] AS INT)                         AS out
    FROM split, unnest(range(0, len(bounds) // 2)) t(i)
    """,
)
def q_wro_decode_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R32/R33 (``.pyt:161-175``): decode the catalog's CSV-encoded
    classification back into (range_idx, lo, hi, out) rows -- the
    reference re-parses these TEXT columns on every tool invocation
    (InputRanges/OutputValues are unquoted numerics, so a plain split is
    the reference's own parse; quoted labels go through from_csv)."""
    cat = wro_catalog(spark)
    split = cat.select(
        "Name",
        F.split("InputRanges", ",").alias("bounds"),
        F.split("OutputValues", ",").alias("outs"),
    )
    return split.select(
        "Name",
        F.explode(
            F.sequence(F.lit(0), (F.size("bounds") / 2 - 1).cast("int"))
        ).alias("range_idx"),
        "bounds",
        "outs",
    ).select(
        "Name",
        F.col("range_idx").cast("int").alias("range_idx"),
        F.element_at("bounds", F.col("range_idx").cast("int") * 2 + 1)
        .cast("double")
        .alias("lo"),
        F.element_at("bounds", F.col("range_idx").cast("int") * 2 + 2)
        .cast("double")
        .alias("hi"),
        F.element_at("outs", F.col("range_idx").cast("int") + 1).cast("int").alias("out"),
    )


@query(
    "q_subquery_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery through the SQL front end -- Catalyst
    decorrelates it into a left-semi join (no per-row re-execution, which
    is what makes correlated subqueries viable at scale)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        """
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE 2 * o_totalprice * (SELECT COUNT(*) FROM orders)
          > 3 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 FROM orders)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subqueries: evaluated once, broadcast into the
    filter (not re-run per row).

    The "price > 1.5x average" predicate is multiplied through
    (2 * price * N > 3 * SUM) so the threshold is exact on both engines: a
    double AVG differs across engines in the last ulp, and a row sitting
    on the boundary would flip the hash."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_v
        WHERE 2 * o_totalprice * (SELECT COUNT(*) FROM orders_v)
              > 3 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                     FROM orders_v)
        """
    )


@query(
    "q_agg_corr",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(corr(l_quantity, l_extendedprice), 4) AS DOUBLE)
               AS qty_price_corr
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group (bounded [-1,1], so 4dp rounding is
    cross-engine stable where raw co-moment sums would not be)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4)
        .cast("double")
        .alias("qty_price_corr")
    )


@query(
    "q_embed_centroid",
    oracle="""
    WITH flat AS (
        SELECT label,
               unnest([{'pos': i, 'val': CAST(embedding[i + 1] AS DOUBLE)}
                       for i in range(0, len(embedding))]) AS u
        FROM embeddings
    )
    SELECT label, CAST(u.pos AS INT) AS pos,
           CAST(ROUND(AVG(u.val), 4) + 0.0 AS DOUBLE) AS centroid_val
    FROM flat
    GROUP BY label, u.pos
    """,
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of embeddings, one row per (label, dimension) --
    the k-means/IVF training primitive.

    Scale: posexplode makes the aggregation a plain (label, pos)-keyed
    groupBy with map-side partials -- no driver-side vector math, no
    per-row UDF; 100 TB of vectors is just 64x the row count."""
    v = load_table(spark, sf_dir, "embeddings")
    return (
        v.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"))
        .groupBy("label", "pos")
        # + 0.0 normalizes IEEE negative zero: ROUND can yield -0.0 on one
        # engine and 0.0 on the other, which hash-mismatches despite ==
        .agg((F.round(F.avg("val"), 4) + F.lit(0.0)).cast("double").alias("centroid_val"))
        .select("label", F.col("pos").cast("int").alias("pos"), "centroid_val")
    )


_RECURSIVE_MONTHS = """
    WITH RECURSIVE months(m) AS (
        SELECT CAST('1995-01-01 00:00:00' AS TIMESTAMP)
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < CAST('1998-11-01 00:00:00' AS TIMESTAMP)
    )
    SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
    FROM months LEFT JOIN {orders}
         ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
    GROUP BY m
"""


@query("q_cte_recursive", oracle=_RECURSIVE_MONTHS.format(orders="orders"))
def q_cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate the month series
    spanning the order dates, then left-join order counts per month --
    months with zero orders still appear. Identical SQL text runs on both
    engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(_RECURSIVE_MONTHS.format(orders="orders_v"))
