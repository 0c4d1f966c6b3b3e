"""The 100 TB storage layout, stood up end-to-end (VERDICT r8 #5).

SURVEY section 4's posture -- partition the event stream by date, bucket
the fact tables on their repeated join key, cluster the corpus on its
filter columns -- previously existed only as per-operator demonstrations
(q_sink_partitioned, q_join_bucketed, q_scan_dpp, q_zorder_layout). This
module makes it a STANDING layout the whole engine can run against:

- :func:`write_layout` writes a fixture SF once in the posture and drops
  a ``_layout.json`` manifest beside it;
- ``sources.tables.load_table`` consults the manifest, so EVERY registry
  query transparently resolves tables from the laid-out storage -- no
  query changes, which is exactly the point: the layout must pay for
  itself on the existing workload, not on queries written for it.

The posture (and why each piece matters at 100 TB):

- ``events``: hive-partitioned by ``(event_date, event_type)``.
  event_date is the derived operational partition (retention, backfill,
  time-bounded scans); event_type is a 5-value enum that several
  standing queries filter literally (the asof family's signup/error
  legs) -- those get directory-level PartitionFilters for free. The
  derived event_date is dropped on read, so the table contract is
  byte-identical to the flat fixture.
- ``lineitem`` + ``orders``: bucketed INTO 32 BUCKETS on the order key,
  sorted within buckets. Order-key joins (TPC-H q3/q4/q12/q18, the q21
  lineitem self-joins) and order-key aggregations read pre-shuffled
  data: the exchanges those plans pay on flat storage disappear
  (SortMergeJoin over bucketed scans, SelectedBucketsCount in the scan).
  Bucket metadata lives in the session catalog; the manifest carries the
  DDL so any session re-registers the SAME files as an external bucketed
  table -- nothing is rewritten per session.
- ``documents``: Z-ordered on (lang, source) via operators/layout.py --
  both enums are standing filter columns (en-only paths, the src0
  contamination pair); Morton interleaving keeps row-group min/max
  selective for EITHER column alone, where a plain compound sort serves
  only its leading column.
- dimensions + embeddings: flat copies (small; nation/region broadcast
  anyway, embeddings are consumed whole by design).

Non-goal: date-derived pruning for filters written against raw ``ts``.
Spark cannot infer ``event_date = date(ts)``; queries that want date
pruning at 100 TB filter the partition column -- that is a QUERY
convention, documented here rather than faked with a rewrite rule.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_layout.json"

_LANGS = ["en", "zh", "es", "fr", "de"]


def _src_bytes(path: str) -> int:
    """Source-size estimator for the bytes/leaf arithmetic. The fixture
    tables are single parquet FILES; if one ever ships as a
    directory-style parquet, ``os.path.getsize`` would return the inode
    size (~4 KB) and silently force the coarsest scheme (ADVICE r10), so
    sum the part files instead and fail loudly on anything else."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
        if total == 0:
            raise ValueError(f"no parquet part files under {path}")
        return total
    raise FileNotFoundError(path)


def _doc_zkey():
    from ..operators.layout import zorder_key_nd

    lang_code = F.lit(None).cast("int")
    for i, lg in enumerate(_LANGS):
        lang_code = F.when(F.col("lang") == lg, i).otherwise(lang_code)
    src_code = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    return zorder_key_nd([F.coalesce(lang_code, F.lit(31)), src_code], bits=5)


def write_layout(
    spark: SparkSession, sf_dir: str, out_dir: str,
    target_leaf_bytes: int = 128 << 20,
) -> dict:
    """Write ``sf_dir``'s tables into ``out_dir`` in the SURVEY section-4
    posture and return the manifest (also persisted as _layout.json).

    Partition granularity is SIZE-AWARE (round 10, VERDICT r9 #4): the
    r9 rehearsal measured the fixed (event_date, event_type) scheme
    LOSING the whole-headline bench at fixture scale (67.9s vs 55.6s
    flat, PLANS.md) because ~hundreds of hive leaves each holding a
    KB-sized file turn every events scan into directory listing. The
    100 TB discipline is leaves >= ~128 MB, so the writer now picks the
    FINEST candidate scheme -- (event_date, event_type) > (event_date)
    > (event_month) -- whose estimated bytes/leaf clears
    ``target_leaf_bytes`` (one countDistinct agg over the derived keys;
    source bytes from the fixture file). event_month is the floor, not
    "no partitioning": a dozen month dirs cost ~nothing to list, keep
    the manifest-dispatch path honest at every scale, and retention/
    backfill still prune on the leading time key. At 100 TB the fine
    scheme clears the bar and nothing changes. One file per leaf by
    construction (repartition on the partition cols)."""
    from .tables import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    manifest: dict = {}

    ev = load_table(spark, sf_dir, "events")
    ev_bytes = _src_bytes(os.path.join(sf_dir, "events.parquet"))
    evd = ev.withColumn("event_date", F.to_date("ts")).withColumn(
        "event_month", F.trunc("ts", "month")
    )
    leaves = evd.agg(
        F.countDistinct("event_date", "event_type").alias("fine"),
        F.countDistinct("event_date").alias("date"),
        F.countDistinct("event_month").alias("month"),
    ).collect()[0]
    candidates = [
        (["event_date", "event_type"], leaves["fine"]),
        (["event_date"], leaves["date"]),
        (["event_month"], leaves["month"]),
    ]
    part_cols, part_leaves = candidates[-1]
    for cols, n_leaves in candidates:
        if ev_bytes / max(n_leaves, 1) >= target_leaf_bytes:
            part_cols, part_leaves = cols, n_leaves
            break
    derived = [c for c in ("event_date", "event_month") if c in part_cols]
    (
        evd.drop(*[c for c in ("event_date", "event_month") if c not in part_cols])
        .repartition(*part_cols)
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(f"{out_dir}/events")
    )
    manifest["events"] = {
        "kind": "partitioned",
        "partition": part_cols,
        "derived": derived,
        "columns": ev.columns,
        "leaf_bytes_est": int(ev_bytes / max(part_leaves, 1)),
    }

    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        df = load_table(spark, sf_dir, name)
        loc = os.path.abspath(f"{out_dir}/{name}")
        shutil.rmtree(loc, ignore_errors=True)
        tag = hashlib.md5(loc.encode()).hexdigest()[:8]
        tbl = f"layout_{name}_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.bucketBy(32, key)
            .sortBy(key)
            .option("path", loc)
            .mode("overwrite")
            .saveAsTable(tbl, format="parquet")
        )
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
        manifest[name] = {
            "kind": "bucketed",
            "table": tbl,
            "key": key,
            "buckets": 32,
            "location": loc,
            "ddl": ddl,
        }

    from ..operators.layout import write_zordered

    docs = load_table(spark, sf_dir, "documents")
    # Size-aware file count, same discipline as the events scheme: files
    # target ``target_leaf_bytes`` each, with a floor of 8 so fixture-
    # scale scans keep task parallelism (the r9 rehearsal's honest
    # negative: a single-row-group file caps the scan at one task).
    doc_bytes = _src_bytes(os.path.join(sf_dir, "documents.parquet"))
    n_files = max(8, -(-doc_bytes // max(target_leaf_bytes, 1)))
    write_zordered(docs, f"{out_dir}/documents", _doc_zkey(), n_files=n_files)
    manifest["documents"] = {
        "kind": "zorder",
        "cluster": ["lang", "source"],
        "n_files": int(n_files),
    }

    for name in TABLES:
        if name in manifest:
            continue
        shutil.copyfile(f"{sf_dir}/{name}.parquet", f"{out_dir}/{name}.parquet")
        manifest[name] = {"kind": "flat"}

    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    # Invalidate-on-write (ADVICE r9): a dir probed via load_table BEFORE
    # its layout existed has a cached None; a re-laid-out dir has a stale
    # manifest. The writer is the only mutation path, so it owns the
    # cache entry.
    _MANIFESTS[os.path.abspath(out_dir)] = manifest
    return manifest


_MANIFESTS: dict[str, dict | None] = {}


def layout_manifest(sf_dir: str) -> dict | None:
    """The dir's layout manifest, or None for a flat fixture dir.
    Cached per abspath -- fixture dirs are immutable once written, and
    :func:`write_layout` (the only in-session mutation path) updates the
    entry on write."""
    key = os.path.abspath(sf_dir)
    if key not in _MANIFESTS:
        p = os.path.join(sf_dir, MANIFEST)
        _MANIFESTS[key] = json.load(open(p)) if os.path.isfile(p) else None
    return _MANIFESTS[key]


def load_layout_table(
    spark: SparkSession, sf_dir: str, name: str, spec: dict
) -> DataFrame:
    """Resolve one table from a laid-out dir per its manifest entry.
    Returns the SAME logical contract (columns, order, types) as the
    flat fixture read -- the layout changes plans, never data."""
    if spec["kind"] == "partitioned":
        df = spark.read.parquet(f"{sf_dir}/{name}")
        if name == "events":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.select(*spec["columns"])
    if spec["kind"] == "bucketed":
        tbl = spec["table"]
        if not spark.catalog.tableExists(tbl):
            # Re-register the SAME files as an external bucketed table:
            # bucket ids are parsed from the bucketBy-written filenames,
            # so a fresh session pays one DDL, zero rewrites.
            spark.sql(
                f"CREATE TABLE {tbl} ({spec['ddl']}) USING PARQUET"
                f" CLUSTERED BY ({spec['key']}) SORTED BY ({spec['key']})"
                f" INTO {spec['buckets']} BUCKETS"
                f" LOCATION '{spec['location']}'"
            )
        return spark.table(tbl)
    # zorder: plain dir read -- clustering lives in row-group stats
    return spark.read.parquet(f"{sf_dir}/{name}")
