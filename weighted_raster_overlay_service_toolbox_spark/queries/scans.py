"""Scan / source / sink queries (SURVEY.md section 2.2).

Reference anchors: cursor scans with explicit field lists (R1,
``WROS/Weighted Raster Overlay Service.pyt:122, 152``), where-clause
pushdown (R2/R3, ``.pyt:152, 290``), bulk load (R5, ``.pyt:842``).

Scale notes: the point of these queries is the *plan*, checked in
``tests/test_plans.py`` -- projection must reach the parquet ``ReadSchema``
and key predicates must appear in ``PushedFilters`` so at 100 TB the scan
reads only the needed columns/row groups. Sinks write partitioned,
splittable formats; CSV/JSON round-trips carry explicit schemas (schema
inference at 100 TB means a full extra pass).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

#: scratch dir for sink round-trips (inside the repo per sandbox rules).
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


def _scratch(name: str) -> str:
    path = os.path.join(SCRATCH, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    return path


@query(
    "q_scan_full",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM orders
    """,
)
def q_scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table parquet scan, all columns (R1)."""
    return load_table(spark, sf_dir, "orders")


@query(
    "q_scan_prune",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def q_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection pushdown: 2 of 11 columns; ReadSchema must shrink (R1)."""
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "q_scan_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_orderkey <= 200
    """,
)
def q_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key predicate pushed into the scan (R2/R3: the reference pushes
    ``Name = 'x'`` / ``SourceOID = id`` where clauses into its cursors)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 200)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query("q_sink_parquet", oracle="SELECT * FROM supplier")
def q_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink + readback (R5/R6 create-and-load). Snappy parquet,
    written with an explicit partition count -- at 100 TB this would be
    ``partitionBy`` on a natural key. The round-trip is lossless, so the
    oracle is simply the source table: any encode/decode defect flips the
    value hash."""
    path = _scratch("sink_parquet")
    df = load_table(spark, sf_dir, "supplier")
    df.repartition(4).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@query("q_sink_csv_roundtrip", oracle="SELECT * FROM nation")
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink/source with explicit schema on read (no inference pass).
    Timestamp handling is the lossy edge: write ISO-8601, read back with
    the same schema so values survive exactly. Lossless round-trip ->
    the oracle is the source table itself."""
    path = _scratch("sink_csv")
    df = load_table(spark, sf_dir, "nation")
    df.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(df.schema).option("header", "true").csv(path)


@query("q_sink_json_roundtrip", oracle="SELECT * FROM region")
def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink/source with explicit schema on read. Lossless
    round-trip -> the oracle is the source table itself."""
    path = _scratch("sink_json")
    df = load_table(spark, sf_dir, "region")
    df.write.mode("overwrite").json(path)
    return spark.read.schema(df.schema).json(path)


@query(
    "q_sink_partitioned",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + PARTITION-PRUNED readback.

    ``partitionBy(o_orderpriority)`` lays out one directory per value; the
    readback filter on the partition column must prune to ONE directory
    (PartitionFilters in the scan node, pinned in tests/test_plans.py) --
    at 100 TB this is the difference between listing/reading 1/5th of the
    table and all of it. The round-trip is lossless so the oracle is the
    equivalent filtered source select."""
    path = _scratch("sink_partitioned")
    df = load_table(spark, sf_dir, "orders")
    df.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    # explicit schema on readback: a partitioned sink of ZERO rows writes
    # no files, and schema inference then fails -- readers of
    # possibly-empty partitioned datasets must supply the schema (the
    # production convention; partition values still come from dir names)
    back = spark.read.schema(df.schema).parquet(path).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    # partitionBy moves the partition column last on readback; restore the
    # declared order (driver compare is order-insensitive, readers are not)
    return back.select(*df.columns)


@query("q_sink_orc_roundtrip", oracle="SELECT * FROM part")
def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source round-trip (the other columnar format Spark ships
    natively; same predicate-pushdown/column-pruning surface as parquet).
    Lossless -> the oracle is the source table itself."""
    path = _scratch("sink_orc")
    df = load_table(spark, sf_dir, "part")
    df.write.mode("overwrite").orc(path)
    return spark.read.schema(df.schema).orc(path)


@query(
    "q_custom_source",
    oracle="""
    SELECT i AS doc_id, md5(CAST(i AS VARCHAR)) AS payload
    FROM range(0, 1000) t(i)
    """,
)
def q_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (Spark 4 datasource API,
    ``sources/synthetic.py``): explicit input partitions, lazy
    per-partition row generators -- the connector surface for formats
    Spark does not ship. Output is a pure function of doc_id, so DuckDB
    re-derives it from ``range()`` and the hash check proves the
    partition sharding loses/duplicates nothing."""
    from ..sources.synthetic import SyntheticDocsSource

    try:
        spark.dataSource.register(SyntheticDocsSource)
    except Exception:
        pass  # already registered in this session
    return (
        spark.read.format("synthetic_docs")
        .option("n", "1000")
        .option("partitions", "8")
        .load()
    )


@query(
    "q_scan_dpp",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
           'returned' AS flag_label
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
    """,
)
def q_scan_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is partitioned by
    l_returnflag; the filter lives on the DIM side (flag_label), so no
    static partition filter exists -- Spark injects
    ``dynamicpruningexpression(l_returnflag IN dynamicpruning#N)`` into
    the fact scan's PartitionFilters, reusing the broadcast result to
    skip whole directories at runtime (pinned in tests/test_plans.py).

    Scale: this is THE mechanism that keeps star-schema joins from
    scanning a 100 TB fact table when the dim predicate only selects a
    few partitions; static pruning (q_sink_partitioned) cannot see
    through a join."""
    fact_path = _scratch("dpp_fact")
    dim_path = _scratch("dpp_dim")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(fact_path)
    spark.createDataFrame(
        [("A", "returned"), ("R", "returned"), ("N", "live")],
        "l_returnflag string, flag_label string",
    ).write.mode("overwrite").parquet(dim_path)
    # explicit schema: same empty-partitioned-sink readback rule as
    # q_sink_partitioned (zero rows -> zero files -> inference fails)
    fact = spark.read.schema(li.schema).parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("flag_label") == "returned")
    return fact.join(dim, "l_returnflag").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "flag_label"
    )


@query(
    "q_scan_bucket_pruned",
    oracle="""
    SELECT l_orderkey, COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_qty
    FROM lineitem WHERE l_orderkey = 128
    GROUP BY l_orderkey
    """,
)
def q_scan_bucket_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket PRUNING on a keyed lookup-aggregate: the equality predicate
    on the bucketing column lets the scan read 1 of the 8 bucket files
    and skip the other 7 before any I/O, and the bucket-keyed aggregation
    needs no exchange (the bucketed layout IS the required distribution).
    The plan advertises ``SelectedBucketsCount: 1 out of 8`` with zero
    Exchange nodes (pinned in tests/test_plans.py). A bare filter scan
    would NOT prune: Spark's auto-bucketed-scan disables bucketed reading
    when nothing downstream uses the distribution, so the aggregate here
    is what keeps pruning live -- the realistic shape anyway (point
    lookups aggregate).

    Scale: at 100 TB a keyed lookup against a bucketed fact table
    touches total_bytes/n_buckets, independent of cluster size; layered
    under partitioning it composes with partition pruning. Values are
    layout-independent, so the oracle runs on the plain parquet source."""
    import os as _os
    import shutil as _shutil

    spark.sql("DROP TABLE IF EXISTS q_bp_lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    _shutil.rmtree(_os.path.join(warehouse, "q_bp_lineitem"), ignore_errors=True)
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("q_bp_lineitem")
    return (
        spark.table("q_bp_lineitem")
        .filter(F.col("l_orderkey") == 128)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "q_schema_evolution",
    oracle="""
    WITH split AS (
        SELECT CAST(MAX(p_partkey) // 2 AS BIGINT) AS k FROM part
    )
    SELECT p_partkey, p_name, p_retailprice,
           CASE WHEN p_partkey < k THEN NULL ELSE p_brand END AS p_brand,
           CASE WHEN p_partkey < k THEN NULL ELSE p_size END AS p_size
    FROM part, split
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across writer generations: generation 1 wrote
    3 columns, generation 2 added two more; ``mergeSchema`` unifies the
    dataset on read with NULLs for the columns a generation never had --
    the long-lived-dataset reality at 100 TB, where rewriting history
    to the newest schema is not an option.

    The generation split is half the max partkey, so BOTH generations
    are non-empty at every SF (a fixed constant left generation 2
    empty at sf0.001, which would only exercise empty-file footers).
    The staged dataset is written once per (sf_dir) into a keyed
    scratch dir and marked done -- re-invocations reuse it, so a
    still-lazy DataFrame from an earlier invocation never has its
    files deleted out from under it, and schema-only registry sweeps
    pay the write once.

    Scale: mergeSchema reconciles parquet FOOTERS (per-file metadata,
    not data) at planning time and is enabled per-read here, not
    globally -- footer merging across millions of files is a planning
    cost you opt into only where generations actually diverge."""
    p = load_table(spark, sf_dir, "part")
    path = os.path.join(
        SCRATCH, f"schema_evolution_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    marker = os.path.join(path, "_STAGED")
    if not os.path.isfile(marker):
        # Concurrency-safe staging: build the two generations in a
        # per-process temp dir, mark it complete, then publish with ONE
        # atomic rename. Two processes that both miss the marker each
        # stage privately -- they can never interleave writes into the
        # published path (which would duplicate generation-2 rows and
        # pin the corruption under the marker forever); the rename loser
        # just discards its stage.
        if os.path.isdir(path) and not os.path.isfile(marker):
            # Partial legacy write (dir without marker). The marker is
            # re-checked HERE, immediately before the rmtree: between
            # the outer isfile() miss and this point another process
            # may have completed its atomic publish, and deleting a
            # marker-bearing dataset would let concurrent readers see
            # the path vanish mid-read. Residual race: a publish landing
            # between this re-stat and the rmtree is still deleted (and
            # identically re-published by our own rename) -- only the
            # repo's no-concurrent-Spark-tests convention closes that
            # last window.
            shutil.rmtree(path, ignore_errors=True)
        stage = f"{path}.stage.{os.getpid()}"
        shutil.rmtree(stage, ignore_errors=True)
        # exact integer division, matching the oracle's MAX(...) // 2
        k = p.agg(F.expr("CAST(MAX(p_partkey) DIV 2 AS BIGINT)")).first()[0]
        gen1 = p.filter(F.col("p_partkey") < k).select(
            "p_partkey", "p_name", "p_retailprice"
        )
        gen2 = p.filter(F.col("p_partkey") >= k).select(
            "p_partkey", "p_name", "p_retailprice", "p_brand", "p_size"
        )
        gen1.write.mode("overwrite").parquet(stage)
        gen2.write.mode("append").parquet(stage)
        with open(os.path.join(stage, "_STAGED"), "w") as f:
            f.write("ok")
        try:
            os.rename(stage, path)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.select("p_partkey", "p_name", "p_retailprice", "p_brand", "p_size")
