"""Join queries (SURVEY.md section 2.2 "Joins").

Reference anchors: keyed lookup (R2, ``WROS/Weighted Raster Overlay
Service.pyt:151-152``), label-matching nested-loop equi-join (R20,
``.pyt:1059-1068``), catalog-vs-stats join (R26, ``.pyt:281-314``).

Scale notes per query are inline; the general posture: dimension tables
(region/nation/supplier/customer at TPC-H ratios) broadcast automatically
under the 10 MB threshold; fact-fact joins sort-merge on the join key and
AQE converts to broadcast/skew-split at runtime when stats allow. Plan
shapes asserted in ``tests/test_plans.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..operators.asof import asof_join
from ..sources import load_table
from .registry import query


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash equi-join orders x customer. Customer is the build side;
    at fixture ratios Catalyst broadcasts it (checked in plan tests)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_join_multikey",
    oracle="""
    WITH last_line AS (
        SELECT l_orderkey, MAX(l_linenumber) AS l_linenumber
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
           o.o_orderstatus, c.c_mktsegment
    FROM lineitem l
    JOIN last_line x
      ON l.l_orderkey = x.l_orderkey AND l.l_linenumber = x.l_linenumber
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key join (orderkey, linenumber) + 3-table chain.

    The "last line per order" relation is computed as a window max over
    l_orderkey rather than a groupBy + self-join: a derived aggregate
    joined back to its own fact table re-reads the fact (column pruning
    gives the two branches different schemas, defeating AQE exchange
    reuse -- same lesson as the TPC-H Q2/Q15/Q20 partsupp rewrites,
    pinned by test_tpch_derived_partsupp_scans_fact_once). The window
    form scans lineitem ONCE and shuffles it once on l_orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("l_orderkey")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("_max_ln", F.max("l_linenumber").over(w))
        .filter(F.col("l_linenumber") == F.col("_max_ln"))
        .drop("_max_ln")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "l_orderkey", "l_linenumber", "l_extendedprice",
            "o_orderstatus", "c_mktsegment",
        )
    )


_OUTER_ORACLE = """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c {kind} JOIN
         (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON c.c_custkey = o.o_custkey
"""


def _outer(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, kind).select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query("q_join_left", oracle=_OUTER_ORACLE.format(kind="LEFT"))
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, nulls where no 'P' order exists."""
    return _outer(spark, sf_dir, "left")


@query("q_join_right", oracle=_OUTER_ORACLE.format(kind="RIGHT"))
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer (kept side is the filtered orders)."""
    return _outer(spark, sf_dir, "right")


@query("q_join_full", oracle=_OUTER_ORACLE.format(kind="FULL"))
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join. Note: full outer cannot broadcast -- sort-merge."""
    return _outer(spark, sf_dir, "full")


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi = EXISTS: customers having a >250k order. Semi joins never
    duplicate the probe side and broadcast the distinct keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti = NOT EXISTS -- the reference's orphan/duplicate checks
    (R22) as a join: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny dims (5 x 25). Only ever sane when one
    side is broadcastable -- which Catalyst does here."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_theta",
    oracle="""
    SELECT a.s_suppkey AS s1, b.s_suppkey AS s2,
           a.s_acctbal AS bal1, b.s_acctbal AS bal2
    FROM supplier a JOIN supplier b
      ON a.s_acctbal < b.s_acctbal AND a.s_nationkey = b.s_nationkey
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: supplier pairs in the same nation where one
    balance strictly exceeds the other. The equi conjunct (nationkey) lets
    Spark hash-partition; the inequality evaluates as a post-join filter --
    without the equi key this would degrade to BNL join."""
    s = load_table(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    return a.join(
        b,
        (F.col("a.s_acctbal") < F.col("b.s_acctbal"))
        & (F.col("a.s_nationkey") == F.col("b.s_nationkey")),
    ).select(
        F.col("a.s_suppkey").alias("s1"),
        F.col("b.s_suppkey").alias("s2"),
        F.col("a.s_acctbal").alias("bal1"),
        F.col("b.s_acctbal").alias("bal2"),
    )


#: literal suitability ranges -- min-inclusive / max-exclusive, the
#: reference's remap convention (``.pyt:1119-1138``).
_RANGES = [(0.0, 50.0, 1), (50.0, 100.0, 3), (100.0, 150.0, 5), (150.0, 260.0, 9)]
_RANGES_SQL = ", ".join(f"({lo}, {hi}, {out})" for lo, hi, out in _RANGES)


@query(
    "q_join_range",
    oracle=f"""
    SELECT e.event_id, e.value, r.out AS suitability
    FROM events e
    JOIN (VALUES {_RANGES_SQL}) AS r(lo, hi, out)
      ON e.value >= r.lo AND e.value < r.hi
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-in-range join -- the WRO remap (R39) expressed as a join
    against a ranges table instead of a CASE chain. The ranges side is a
    handful of rows: broadcast + band predicate, no shuffle of events."""
    e = load_table(spark, sf_dir, "events")
    r = spark.createDataFrame(_RANGES, "lo double, hi double, out int")
    return e.join(
        broadcast(r), (e.value >= r.lo) & (e.value < r.hi)
    ).select("event_id", "value", F.col("out").alias("suitability"))


@query(
    "q_join_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hints on both dims: the snowflake pattern at
    100 TB -- fact stays in place, dims ship to every executor."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "q_join_asof",
    oracle="""
    WITH r AS (
        SELECT user_id, ts, MAX_BY(value, event_id) AS ref_value
        FROM events WHERE event_type = 'signup'
        GROUP BY user_id, ts
    ), p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.ts,
           r.ts AS ts_ref, r.ref_value AS ref_value_ref
    FROM p ASOF LEFT JOIN r
      ON p.user_id = r.user_id AND p.ts >= r.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each 'error' event, the user's most recent 'signup'
    at-or-before it. Spark side uses the union+window single-shuffle
    operator (``operators/asof.py``); oracle uses DuckDB's native ASOF
    LEFT JOIN. Reference rows deduped per (user, ts) for determinism."""
    ev = load_table(spark, sf_dir, "events")
    ref = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("ref_value"))
    )
    probe = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(probe, ref, on=["user_id"], ts="ts", ref_value_cols=["ref_value"])


@query(
    "q_join_bucketed",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed tables: both sides written with
    ``bucketBy(8, key).sortBy(key)``, then joined with NO exchange in the
    physical plan (pinned in tests/test_scale_ops.py and test_plans.py) --
    the sort-merge reads pre-bucketed files directly.

    Scale: at 100 TB a fact-fact join shuffles BOTH sides every query;
    bucketing pays the shuffle once at write time and every subsequent
    join on the bucket key is shuffle-free. Values are unchanged by the
    layout, so the oracle is the plain join on the parquet sources."""
    import shutil as _shutil
    import os as _os

    spark.sql("DROP TABLE IF EXISTS q_b_orders")
    spark.sql("DROP TABLE IF EXISTS q_b_lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    _shutil.rmtree(_os.path.join(warehouse, "q_b_orders"), ignore_errors=True)
    _shutil.rmtree(_os.path.join(warehouse, "q_b_lineitem"), ignore_errors=True)
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("q_b_orders")
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("q_b_lineitem")
    li = spark.table("q_b_lineitem")
    o = spark.table("q_b_orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderstatus"
    )


@query(
    "q_join_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, s.s_name, s.s_nationkey
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join via explicit hot-key salting
    (``operators/skew.py:salted_join_hot_keys``): the declared hot keys'
    fact rows fan out over ``n_salts`` tasks while the matching dim rows
    replicate ``n_salts`` times; every other key joins against a single
    dim replica with salt 0.

    Salting is purely physical, so the oracle is the PLAIN join -- the
    hash match is the proof that fan-out + replication loses nothing and
    duplicates nothing. Scale: AQE's skew split handles moderate runtime
    skew; explicit salting is for the pathological key known in advance
    (the "the" token, the mega-customer) where one reducer would
    otherwise own a large fraction of all rows."""
    from ..operators.skew import salted_join_hot_keys

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey"
    )
    joined = salted_join_hot_keys(li, s, "l_suppkey", hot_keys=[0, 1, 2], n_salts=8)
    return joined.select(
        "l_orderkey", "l_linenumber", "l_suppkey", "s_name", "s_nationkey"
    )


@query(
    "q_join_asof_forward",
    oracle="""
    WITH r AS (
        SELECT user_id, ts, MAX_BY(value, event_id) AS ref_value
        FROM events WHERE event_type = 'signup'
        GROUP BY user_id, ts
    ), p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), m AS (
        SELECT p.event_id, p.user_id, p.ts, MIN(r.ts) AS ts_ref
        FROM p LEFT JOIN r
          ON r.user_id = p.user_id
         AND r.ts >= p.ts AND r.ts <= p.ts + INTERVAL 1 HOUR
        GROUP BY p.event_id, p.user_id, p.ts
    )
    SELECT m.event_id, m.user_id, m.ts, m.ts_ref,
           r2.ref_value AS ref_value_ref
    FROM m LEFT JOIN r r2
      ON r2.user_id = m.user_id AND r2.ts = m.ts_ref
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: for each 'error' event, the
    user's NEXT 'signup' within the following hour (the
    pandas-merge_asof direction='forward' + tolerance surface). Same
    single-shuffle union+window operator as q_join_asof -- only the
    window's sort order flips, and the tolerance nulls matches beyond
    the gap after the nearest-match fill (equivalent to restricting the
    join window, since the nearest match within tolerance IS the overall
    nearest when one exists). The oracle computes the same thing as a
    min-forward join restricted to the hour window."""
    ev = load_table(spark, sf_dir, "events")
    ref = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("ref_value"))
    )
    probe = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        probe, ref, on=["user_id"], ts="ts", ref_value_cols=["ref_value"],
        direction="forward", tolerance_seconds=3600,
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH a AS (
        SELECT o_orderkey, nullif(o_custkey % 10, 7) AS k
        FROM orders WHERE o_orderkey <= 2000
    ),
    b AS (
        SELECT nullif(c_custkey % 10, 7) AS k, COUNT(*) AS n_dim
        FROM customer WHERE c_custkey <= 100
        GROUP BY 1
    )
    SELECT a.o_orderkey, a.k, b.n_dim
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi-join (``<=>`` / IS NOT DISTINCT FROM): null keys
    MATCH each other instead of silently dropping -- the semantics trap
    in every dimension join where the key is optional (a plain ``=``
    discards all null-keyed facts; an outer join keeps them but without
    their null-keyed dimension row). The nullable key is synthesized
    with nullif because the TPC-H fixtures carry no null keys.

    Scale: Spark plans eqNullSafe as an ordinary hash join (null hashes
    to a regular bucket) -- same shuffle/broadcast shapes as ``=``, no
    nested-loop fallback."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    a = o.select(
        "o_orderkey", F.nullif(F.col("o_custkey") % 10, F.lit(7)).alias("k")
    )
    b = (
        c.select(F.nullif(F.col("c_custkey") % 10, F.lit(7)).alias("bk"))
        .groupBy("bk")
        .agg(F.count(F.lit(1)).alias("n_dim"))
    )
    return a.join(broadcast(b), F.col("k").eqNullSafe(F.col("bk"))).select(
        "o_orderkey", "k", "n_dim"
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH ev AS (
        SELECT event_id, user_id, ts, event_type, value FROM events
    ),
    r AS (
        SELECT user_id, ts, MAX_BY(value, event_id) AS ref_value
        FROM ev WHERE event_type = 'signup'
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error'
    ),
    b AS (
        SELECT p.event_id, MAX(r.ts) AS ts_b
        FROM p JOIN r
          ON r.user_id = p.user_id
         AND r.ts <= p.ts AND r.ts >= p.ts - INTERVAL 1 HOUR
        GROUP BY p.event_id
    ),
    f AS (
        SELECT p.event_id, MIN(r.ts) AS ts_f
        FROM p JOIN r
          ON r.user_id = p.user_id
         AND r.ts >= p.ts AND r.ts <= p.ts + INTERVAL 1 HOUR
        GROUP BY p.event_id
    ),
    m AS (
        SELECT p.event_id, p.user_id, p.ts,
               CASE WHEN b.ts_b IS NOT NULL AND (f.ts_f IS NULL OR
                         epoch_us(p.ts) - epoch_us(b.ts_b)
                         <= epoch_us(f.ts_f) - epoch_us(p.ts))
                    THEN b.ts_b ELSE f.ts_f END AS ts_ref
        FROM p LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
    )
    SELECT m.event_id, m.user_id, m.ts, m.ts_ref,
           r2.ref_value AS ref_value_ref
    FROM m LEFT JOIN r r2
      ON r2.user_id = m.user_id AND r2.ts = m.ts_ref
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join with tolerance: for each 'error' event, the
    user's CLOSEST 'signup' within one hour on either side -- the
    pandas merge_asof direction='nearest' surface, completing the
    backward (q_join_asof) / forward (q_join_asof_forward) family.
    Ties (equidistant matches) resolve BACKWARD -- documented, and
    encoded identically in both engines as dt_back <= dt_forward.

    Built as a composition: the backward and forward legs each run the
    single-shuffle union+window asof operator (operators/asof.py), and
    the nearest pick is a pure integer-microsecond comparison (no float
    time anywhere) over two event_id-keyed left joins. The projected
    events base is pinned once, so both legs (probe + reference on
    each side) read ONE events scan.

    Scale: each leg is the documented one-shuffle-per-leg asof plan
    keyed on (user_id); the combine joins are keyed on event_id
    (uniform); the final reference-value lookup is an equi-join on
    (user_id, matched ts). Nothing exceeds the probe relation's
    cardinality after the legs."""
    from ..plans.pinning import pin_corpus

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .transform(pin_corpus)  # one scan feeds probe + ref on both legs
    )
    ref = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("ref_value"))
    )
    probe = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    bk = asof_join(
        probe, ref, on=["user_id"], ts="ts", ref_value_cols=["ref_value"],
        direction="backward", tolerance_seconds=3600,
    ).select(
        "event_id",
        F.col("ts_ref").alias("ts_b"),
        F.col("ref_value_ref").alias("v_b"),
    )
    fw = asof_join(
        probe, ref, on=["user_id"], ts="ts", ref_value_cols=["ref_value"],
        direction="forward", tolerance_seconds=3600,
    ).select(
        "event_id",
        F.col("ts_ref").alias("ts_f"),
        F.col("ref_value_ref").alias("v_f"),
    )
    pick_b = F.col("ts_b").isNotNull() & (
        F.col("ts_f").isNull()
        | (
            (F.unix_micros("ts") - F.unix_micros("ts_b"))
            <= (F.unix_micros("ts_f") - F.unix_micros("ts"))
        )
    )
    return (
        probe.join(bk, "event_id", "left")
        .join(fw, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(pick_b, F.col("ts_b")).otherwise(F.col("ts_f")).alias("ts_ref"),
            F.when(pick_b, F.col("v_b")).otherwise(F.col("v_f")).alias(
                "ref_value_ref"
            ),
        )
    )
