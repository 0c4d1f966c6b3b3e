"""Scalar function library (SURVEY.md section 2.2 "Scalar functions").

Reference anchors: string surgery R30 (``WROS/Weighted Raster Overlay
Service.pyt:1187-1222``), RFC-4180 codec R31/R32 (``.pyt:1308-1332``),
split/join R33/R34 (``.pyt:163-165, 994-995``), null coercion R29
(``.pyt:278-279, 535-543``), conditional defaults R38 (``.pyt:1258-1280``),
regex-style char validation R28 (``.pyt:677-681``).

Everything is built-in ``pyspark.sql.functions`` -- JVM-side, inside
whole-stage codegen. The only Python UDFs live in the three declared
UDF-machinery smokes (q_udf_scalar / q_udaf_grouped / q_udtf_flatmap),
which exist to cover the UDF surface itself; their semantics are mirrored
by pure-SQL oracles so the driver still hash-checks them.

Cross-engine parity notes (why some expressions look defensive):
- Spark ``floor``/``ceil`` return BIGINT, DuckDB return DOUBLE -> cast both.
- Spark double->int CAST truncates, DuckDB rounds -> go through FLOOR.
- Spark ``signum`` returns DOUBLE -> cast both to INT.
- DuckDB ``list_distinct`` does not guarantee order -> always wrap
  ``array_distinct`` in ``array_sort`` on both sides.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import duck_round, duck_round_np
from pyspark.sql.functions import pandas_udf

from ..functions.csvcodec import csv_encode, csv_encode_py, csv_encode_sql
from ..sources import load_table
from .registry import query

# --------------------------------------------------------------------------
# strings (R30/R28)
# --------------------------------------------------------------------------


@query(
    "q_str_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_type)                                   AS type_up,
           lower(p_brand)                                  AS brand_lo,
           substr(p_name, 1, 5)                            AS name5,
           p_brand || '/' || p_type                        AS brand_type,
           trim('  ' || p_name || ' ')                     AS name_trim,
           CAST(length(p_name) AS INT)                     AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_pad,
           replace(p_name, ' ', '_')                       AS name_us,
           reverse(p_brand)                                AS brand_rev
    FROM part
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/concat/trim/length/lpad/replace/reverse (R30)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@query(
    "q_str_split_index",
    oracle="""
    WITH paths AS (
        SELECT p_partkey,
               '/data/rasters/' || p_brand || '/' ||
               replace(p_name, ' ', '_') || '.tif' AS path
        FROM part
    )
    SELECT p_partkey, path,
           regexp_extract(path, '[^/]+$', 0)                    AS basename,
           regexp_replace(regexp_extract(path, '[^/]+$', 0),
                          '\\.[^.]*$', '')                      AS stem,
           string_split(path, '/')[3]                           AS top_dir
    FROM paths
    """,
)
def q_str_split_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R30 basename/extension surgery (``.pyt:1187-1222``): rfind-substring
    to basename and endswith-strip of the extension, as column exprs."""
    p = load_table(spark, sf_dir, "part")
    path = F.concat(
        F.lit("/data/rasters/"),
        F.col("p_brand"),
        F.lit("/"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")),
        F.lit(".tif"),
    )
    df = p.select("p_partkey", path.alias("path"))
    basename = F.substring_index("path", "/", -1)
    return df.select(
        "p_partkey",
        "path",
        basename.alias("basename"),
        F.regexp_replace(basename, r"\.[^.]*$", "").alias("stem"),
        F.split("path", "/").getItem(2).alias("top_dir"),
    )


@query(
    "q_str_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, 'Brand#(\\d+)', 1)  AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g')  AS name_novowel,
           regexp_matches(p_name, '^[a-m]')            AS first_half,
           NOT regexp_matches(p_name,
               '[ ~`!@#$%^&*(){{}}\\[\\]\\-+=<>,.?|]') AS name_ok
    FROM part
    """.replace("{{", "{").replace("}}", "}"),
)
def q_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract/replace/match; last column is the reference's dataset
    name character validation R28 (``.pyt:677-681``)."""
    p = load_table(spark, sf_dir, "part")
    bad = r"[ ~`!@#$%^&*(){}\[\]\-+=<>,.?|]"
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.col("p_name").rlike("^[a-m]").alias("first_half"),
        (~F.col("p_name").rlike(bad)).alias("name_ok"),
    )


@query(
    "q_csv_encode",
    oracle=f"""
    SELECT p_partkey,
           {csv_encode_sql("p_name", "p_type || ', ' || p_brand",
                           'p_brand || ' + repr(' says "hi"'))} AS csv_line
    FROM part
    WHERE p_partkey < 100
    """,
)
def q_csv_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R31 RFC-4180 encode (``.pyt:1308-1325``) as pure column expressions;
    second field forces comma-quoting, third forces quote-doubling."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        csv_encode(
            F.col("p_name"),
            F.concat(F.col("p_type"), F.lit(", "), F.col("p_brand")),
            F.concat(F.col("p_brand"), F.lit(' says "hi"')),
        ).alias("csv_line"),
    )


# --------------------------------------------------------------------------
# dates / timestamps
# --------------------------------------------------------------------------


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT)          AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)         AS mo,
           CAST(EXTRACT(day FROM o_orderdate) AS INT)           AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)  AS month_start,
           CAST(datediff('day', DATE '1995-01-01',
                    CAST(o_orderdate AS DATE)) AS INT)          AS days_since,
           CAST(o_orderdate AS DATE) + 7                        AS plus_week
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/datediff/date_add."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias("days_since"),
        F.date_add(F.to_date("o_orderdate"), 7).alias("plus_week"),
    )


@query(
    "q_ts_funcs",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(hour FROM ts) AS INT)     AS hr,
           CAST(EXTRACT(minute FROM ts) AS INT)   AS mi,
           CAST(FLOOR(epoch(ts)) AS BIGINT)       AS epoch_s,
           date_trunc('hour', ts)                 AS hour_start,
           CAST(to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS TIMESTAMP)
                                                  AS from_epoch
    FROM events
    """,
)
def q_ts_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hour/minute/unix-epoch round trip (session tz pinned UTC)."""
    e = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    return e.select(
        "event_id",
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
        epoch_s.alias("epoch_s"),
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.timestamp_seconds(epoch_s).alias("from_epoch"),
    )


# --------------------------------------------------------------------------
# math / conditionals / casts (R29/R38)
# --------------------------------------------------------------------------


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(sqrt(l_extendedprice), 4) AS DOUBLE)  AS price_sqrt,
           CAST(FLOOR(l_discount * 100) AS BIGINT)          AS disc_pct_floor,
           CAST(CEIL(l_tax * 100) AS BIGINT)                AS tax_pct_ceil,
           CAST(ROUND(abs(l_tax - 0.05), 4) AS DOUBLE)      AS tax_dev,
           CAST(pow(l_quantity, 2) AS DOUBLE)               AS qty_sq,
           CAST(ROUND(ln(l_extendedprice), 6) AS DOUBLE)    AS price_ln,
           CAST(FLOOR(l_quantity) AS BIGINT) % 7            AS qty_mod7,
           CAST(sign(l_discount - 0.05) AS INT)             AS disc_sign
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/pow/sqrt/ln/mod/sign."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        duck_round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct_floor"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        duck_round(F.abs(F.col("l_tax") - 0.05), 4).alias("tax_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        duck_round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.floor("l_quantity") % 7).alias("qty_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "q_cond_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'pending' END            AS status_word,
           COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'),
                    'DEFAULT')                              AS prio_or_default,
           GREATEST(o_totalprice, 100000.0)                 AS price_floor100k,
           LEAST(o_totalprice, 200000.0)                    AS price_cap200k,
           CASE WHEN o_totalprice > 150000 THEN 9
                WHEN o_totalprice > 50000  THEN 5
                ELSE 1 END                                  AS price_class
    FROM orders
    """,
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif/greatest/least -- the reference's blank->null
    coercion R29 (``.pyt:535-543``) and default fallback R38 shape
    (``.pyt:1258-1280``; suitability default 5, ``.pyt:86-87``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_word"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("DEFAULT"))
        .alias("prio_or_default"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("price_floor100k"),
        F.least("o_totalprice", F.lit(200000.0)).alias("price_cap200k"),
        F.when(F.col("o_totalprice") > 150000, 9)
        .when(F.col("o_totalprice") > 50000, 5)
        .otherwise(1)
        .alias("price_class"),
    )


@query(
    "q_cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey AS VARCHAR)                     AS key_str,
           CAST(FLOOR(l_quantity) AS INT)                  AS qty_int,
           CAST('42' AS INT)                               AS lit_int,
           CAST(l_linenumber AS DOUBLE)                    AS line_dbl,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR)       AS ship_day,
           TIMESTAMP '2024-01-01 12:30:00'                 AS lit_ts
    FROM lineitem
    """,
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string<->int<->double<->timestamp casts (cross-engine-stable set:
    double->int goes through FLOOR because Spark truncates and DuckDB
    rounds on the bare cast)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.lit("42").cast("int").alias("lit_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.to_date("l_shipdate").cast("string").alias("ship_day"),
        F.to_timestamp(F.lit("2024-01-01 12:30:00")).alias("lit_ts"),
    )


# --------------------------------------------------------------------------
# arrays / maps / json (R33/R34)
# --------------------------------------------------------------------------


@query(
    "q_array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT)                              AS n_toks,
           list_contains(toks, 'spark')                        AS has_spark,
           array_to_string(list_sort(toks), ' ')               AS toks_sorted,
           array_to_string(list_sort(list_distinct(toks)), ' ') AS toks_uniq,
           array_to_string(toks[1:3], ' ')                     AS first3
    FROM t
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split->array, size, contains, sort, distinct, slice (R33/R34,
    ``.pyt:163-165, 994-995``). array_distinct is order-unstable across
    engines, hence the array_sort wrap on both sides. Array-typed
    intermediates are exercised in full; the OUTPUT serializes them via
    array_join because the driver's pandas canonicalizer cannot
    sort/hash list cells (CORRECTNESS_r04 regression)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.array_sort(toks), " ").alias("toks_sorted"),
        F.array_join(F.array_sort(F.array_distinct(toks)), " ").alias("toks_uniq"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
    )


@query(
    "q_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 100
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnest array to rows -- the engine's table-generating op."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@query(
    "q_array_agg",
    oracle="""
    SELECT lang, source,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids,
           COUNT(*)                                      AS n_docs
    FROM documents
    GROUP BY lang, source
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is partition-order nondeterministic, so determinism
    comes from array_sort -- same convention as the oracle's list_sort.
    Output serialized with array_join (driver canonicalizer cannot hash
    list cells); the collect_list/array_sort semantics are unchanged."""
    d = load_table(spark, sf_dir, "documents")
    ids = F.array_sort(F.collect_list("doc_id"))
    return d.groupBy("lang", "source").agg(
        F.array_join(F.transform(ids, lambda x: x.cast("string")), ",")
        .alias("doc_ids"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT p_partkey,
           '{"brand":"' || p_brand || '","type":"' || p_type
               || '","size":"' || CAST(p_size AS VARCHAR) || '"}' AS meta_json,
           p_brand AS brand_val,
           'brand,type,size' AS meta_keys
    FROM part
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map create/lookup (Metadata grab-bag model, SURVEY.md section 1.2).

    The map COLUMN itself has no cross-engine canonical form, so the
    oracle-comparable output is its deterministic JSON serialization
    (``to_json`` preserves ``create_map`` key order; fixture values
    contain no JSON metacharacters) plus a lookup and the key list
    (array_join-serialized -- the driver cannot hash list cells)."""
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("type"), F.col("p_type"),
        F.lit("size"), F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        F.to_json(m).alias("meta_json"),
        F.element_at(m, "brand").alias("brand_val"),
        F.array_join(F.map_keys(m), ",").alias("meta_keys"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                    AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT)       AS k_int
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from events.props."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
    )


# --------------------------------------------------------------------------
# UDF / UDAF / UDTF machinery smokes (SURVEY.md section 2.2 tail)
# --------------------------------------------------------------------------


@query(
    "q_udf_scalar",
    oracle=f"""
    SELECT p_partkey,
           {csv_encode_sql("p_name", "p_type || ', ' || p_brand",
                           'p_brand || ' + repr(' says "hi"'))} AS csv_line
    FROM part
    WHERE p_partkey < 100
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python scalar UDF mirroring R31 (``.pyt:1308-1325``) -- same rows
    and oracle as q_csv_encode, so the UDF path itself is hash-checked.
    UDFs are the slow path; this exists to cover the machinery."""
    encode = F.udf(lambda a, b, c: csv_encode_py([a, b, c]), "string")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        encode(
            F.col("p_name"),
            F.concat(F.col("p_type"), F.lit(", "), F.col("p_brand")),
            F.concat(F.col("p_brand"), F.lit(' says "hi"')),
        ).alias("csv_line"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(l_quantity) / COUNT(*), 2) AS DOUBLE) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-agg UDF (Arrow batch transfer). l_quantity is
    integer-valued, so the float sum is exact and matches SUM/COUNT in
    DuckDB bit-for-bit after ROUND."""

    @pandas_udf("double")
    def mean_qty(v: pd.Series) -> float:
        return float(v.mean())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        duck_round(mean_qty("l_quantity"), 2).alias("avg_qty")
    )


@query(
    "q_udtf_flatmap",
    oracle="""
    SELECT o_orderkey, unnest(string_split(o_orderpriority, '-')) AS prio_token
    FROM orders
    """,
)
def q_udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating mapInPandas: one output row per '-'-separated
    token of o_orderpriority (Arrow-batched, never per-row pickling).
    Oracle-backed (promoted from rows-only in r5): the Python row
    expansion is deterministic, so the unnest rewrite hash-checks the
    whole mapInPandas machinery, not just its row count."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["o_orderpriority"].str.split("-")
            out = pdf.loc[pdf.index.repeat(toks.str.len()), ["o_orderkey"]]
            out["prio_token"] = [t for ts in toks for t in ts]
            yield out

    o = load_table(spark, sf_dir, "orders")
    return o.mapInPandas(expand, "o_orderkey long, prio_token string")


@query(
    "q_udf_grouped_map",
    oracle="""
    SELECT o_orderkey, c_mktsegment,
           -- + 0.0 folds IEEE negative zero (a raw z of -4e-03 rounds to
           -- -0.0 under DuckDB's sign-preserving double ROUND; the driver
           -- hash distinguishes the sign bit -- the q_collocations class)
           (CAST(ROUND(
               (o_totalprice - AVG(o_totalprice) OVER (PARTITION BY c_mktsegment))
               / STDDEV_POP(o_totalprice) OVER (PARTITION BY c_mktsegment), 2)
           AS DOUBLE) + 0.0) AS z
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the third Pandas-UDF eval type next to
    grouped-agg and mapInPandas): per-segment z-score of order totals,
    one Arrow batch per group. The oracle is the window-function rewrite.

    Scale: one shuffle on the group key; each group must fit one worker's
    memory -- for data-sized groups use the window form instead (also
    shown in the oracle)."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["o_totalprice"]
        mu = x.mean()
        sd = ((x - mu) ** 2).mean() ** 0.5
        # duck_round_np (not Series.round, which is half-even with its own
        # scaled arithmetic) keeps the rounding bit-identical to the
        # oracle's ROUND; + 0.0 folds -0.0 to match the oracle's fold.
        z = duck_round_np((x - mu).to_numpy() / sd, 2) + 0.0
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "z": z,
            }
        )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_mktsegment", "o_totalprice"
    )
    return joined.groupBy("c_mktsegment").applyInPandas(
        zscore, "o_orderkey long, c_mktsegment string, z double"
    )


@query(
    "q_str_levenshtein",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 30 AND b.p_partkey < 30
      AND levenshtein(a.p_name, b.p_name) <= 5
    """,
)
def q_str_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance pairs (bounded block) -- the fuzzy-matching scalar
    that backs typo-level near-dup detection."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 30)
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .filter(dist <= 5)
        .select("key_a", "key_b", dist.cast("int").alias("edit_dist"))
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1)  AS all_small_disc,
           bool_or(l_quantity >= 50)    AS any_max_qty,
           COUNT(*) FILTER (l_tax = 0)  AS n_tax_free
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any) + filtered count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_small_disc"),
        F.bool_or(F.col("l_quantity") >= 50).alias("any_max_qty"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_tax_free"),
    )


@query(
    "q_udtf_lateral",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) - 1 AS INT)
               AS idx
    FROM documents WHERE doc_id < 20
    """,
)
def q_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 ``@udtf``) applied via LATERAL join -- the
    SQL-registrable table function surface, distinct from the
    ``mapInPandas`` flat-map (q_udtf_flatmap). One output row per token
    with its position; the oracle zips DuckDB's parallel unnest.

    UDTFs are row-at-a-time Python -- machinery coverage, not a hot
    path; the JVM-native twin of this exact expansion is posexplode
    (q_explode)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, idx int")
    class SplitWords:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield (t, i)

    spark.udtf.register("split_words_q", SplitWords)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        "SELECT d.doc_id, s.tok, s.idx "
        "FROM docs_udtf_v d, LATERAL split_words_q(d.text) s"
    )


@query(
    "q_bitwise_funcs",
    oracle="""
    SELECT l_returnflag,
           BIT_AND(l_orderkey) AS all_and,
           BIT_OR(l_linenumber) AS any_or,
           BIT_XOR(l_suppkey) AS xor_key,
           CAST(SUM(l_orderkey & 255) AS BIGINT) AS sum_low_byte,
           CAST(SUM(l_orderkey >> 4) AS BIGINT) AS sum_shifted
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface: &, >>, and the bit_and /
    bit_or / bit_xor aggregates (integer-exact in both engines, so the
    hash check is trivial). Bit tricks back the engine's sketch/bucket
    operators (hyperplane buckets, simhash bands); this pins the raw
    function layer itself."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_orderkey").alias("all_and"),
        F.bit_or("l_linenumber").alias("any_or"),
        F.bit_xor("l_suppkey").alias("xor_key"),
        F.sum(F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("sum_low_byte"),
        F.sum(F.shiftright("l_orderkey", 4)).alias("sum_shifted"),
    )


@query(
    "q_hof_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 200)
    SELECT doc_id,
           array_to_string(list_transform(toks, x -> length(x)), ',')
                                                               AS tok_lens,
           array_to_string(list_sort(list_filter(toks, x -> length(x) > 4)),
                           ' ')                                AS long_toks,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS INT)
                                                               AS total_chars,
           len(list_filter(toks, x -> length(x) > 6)) > 0      AS any_long,
           len(list_filter(toks, x -> length(x) > 10)) = 0     AS all_short
    FROM t
    """,
)
def q_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions -- transform / filter / aggregate /
    exists / forall as lambda expressions evaluated INSIDE the JVM per
    row (Catalyst lambda variables), the idiomatic replacement for a
    Python UDF over array columns. DuckDB expresses exists/forall via
    list_filter cardinality; values match exactly.

    Scale: all five are narrow per-row expressions -- no shuffle, no
    Python; this is the pattern the MinHash signature builder and the
    quantizer use in their hot paths. Array outputs are array_join-
    serialized (driver canonicalizer cannot hash list cells)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(toks, lambda t: F.length(t).cast("string")), ","
        ).alias("tok_lens"),
        F.array_join(
            F.array_sort(F.filter(toks, lambda t: F.length(t) > 4)), " "
        ).alias("long_toks"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
        ).alias("total_chars"),
        F.exists(toks, lambda t: F.length(t) > 6).alias("any_long"),
        F.forall(toks, lambda t: F.length(t) <= 10).alias("all_short"),
    )


@query(
    "q_json_typed",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven JSON parse: ``from_json(props, 'k INT')`` turns the
    payload column into a typed struct in one pass (JacksonParser with a
    target schema -- the semi-structured ingest path), then aggregates
    by the extracted key. Differs from q_json_extract's per-path
    extraction: ONE parse populates every declared field, which is the
    right shape when several fields are read (per-path re-parses the
    document each time).

    Scale: parse is a narrow per-row expression; the aggregation
    shuffles on the (bounded-cardinality) extracted key with map-side
    partials. At 100 TB, parse-once-into-struct then prune columns."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        F.from_json("props", "k INT").alias("p"),
        F.col("value"),
    )
    return parsed.groupBy(F.col("p.k").alias("k")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


@query(
    "q_str_funcs2",
    oracle="""
    SELECT doc_id,
           reverse(lang)                       AS lang_rev,
           repeat(lang, 2)                     AS lang_twice,
           lpad(lang, 6, '_')                  AS lang_lpad,
           rpad(lang, 6, '.')                  AS lang_rpad,
           translate(lang, 'aeiou', 'AEIOU')   AS lang_vowels,
           left(source, 3)                     AS src_left,
           right(source, 1)                    AS src_right,
           ascii(lang)                         AS lang_ascii
    FROM documents WHERE doc_id < 200
    """,
)
def q_str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function sweep: reverse / repeat / lpad / rpad /
    translate / left / right / ascii -- the remaining R30-family surface
    beyond q_str_funcs. All JVM scalar expressions inside whole-stage
    codegen."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.reverse("lang").alias("lang_rev"),
        F.repeat("lang", 2).alias("lang_twice"),
        F.lpad("lang", 6, "_").alias("lang_lpad"),
        F.rpad("lang", 6, ".").alias("lang_rpad"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_vowels"),
        F.substring("source", 1, 3).alias("src_left"),
        F.substring("source", -1, 1).alias("src_right"),
        F.ascii("lang").alias("lang_ascii"),
    )


@query(
    "q_seasonality_matrix",
    oracle="""
    SELECT CAST(EXTRACT(dow FROM ts) + 1 AS INT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INT)    AS hod,
           COUNT(*)                              AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_seasonality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality heat-map: event counts and value by (day-of-week,
    hour-of-day) -- the time-profile rollup behind capacity planning and
    anomaly baselines. Day-of-week conventions differ across engines
    (Spark dayofweek is 1=Sunday; DuckDB EXTRACT(dow) is 0=Sunday), so
    the oracle aligns explicitly with +1.

    Scale: one scan, one shuffle on a 7x24-key grid with map-side
    partials -- the aggregate is grid-sized regardless of event count."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_value"),
    )
