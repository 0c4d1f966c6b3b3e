"""Scale-posture operators: salted aggregation/join equivalence, and
bucketed tables joining without a shuffle (the co-located join path for
repeated join keys at 100 TB)."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.operators.skew import (
    salted_count_sum,
    salted_join_hot_keys,
)
from weighted_raster_overlay_service_toolbox_spark.sources import load_table

from .conftest import SF_SMOKE


def test_salted_agg_matches_direct(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    direct = {
        r["l_returnflag"]: (r["n"], round(r["t"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity")).alias("t"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], round(r["total"], 2))
        for r in salted_count_sum(li, "l_returnflag", "l_quantity").collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    sup = load_table(spark, SF_SMOKE, "supplier")
    direct = li.join(sup, li.l_suppkey == sup.s_suppkey).count()
    fact = li.withColumnRenamed("l_suppkey", "k")
    dim = sup.withColumnRenamed("s_suppkey", "k")
    hot = [r["k"] for r in fact.groupBy("k").count().orderBy(F.desc("count")).limit(2).collect()]
    salted = salted_join_hot_keys(fact, dim, "k", hot_keys=hot).count()
    assert salted == direct


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed on the join key sort-merge WITHOUT an exchange:
    the physical plan must contain no shuffle between scan and join."""
    # default warehouse (spark-warehouse/, gitignored) -- warehouse.dir is
    # a static conf and cannot be set on a live session. DROP TABLE alone
    # is not enough across sessions: the in-memory catalog forgets the
    # table but its directory survives, so clear both.
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, "b_orders"), ignore_errors=True)
    shutil.rmtree(os.path.join(warehouse, "b_lineitem"), ignore_errors=True)

    load_table(spark, SF_SMOKE, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "b_lineitem"
    )

    # disable auto-broadcast so the join would OTHERWISE shuffle both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == load_table(spark, SF_SMOKE, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
