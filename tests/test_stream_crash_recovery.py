"""Streaming crash-recovery witness (VERDICT r8 'Next round' #6).

The upsert sink's exactly-once story is claimed but was never
failure-tested: offsets are WAL-ed to the checkpoint at batch START and
the commit marker is written only after ``foreachBatch`` returns, so a
crash between "state merged" and "commit recorded" forces Structured
Streaming to REPLAY that batch on restart -- exactly-once output then
rests entirely on the merge being idempotent per (batch content, state).

This test runs the q_stream_upsert merge (same groupBy-max_by + anti-join
+ crash-safe snapshot swap, plus a checkpointLocation) in a CHILD process
that SIGKILLs its whole process group -- Python driver AND the JVM --
right after batch 1's merge completes, i.e. in the redelivery window
after the state swap but before the commit marker. A second child resumes
from the same checkpoint: Spark replays batch 1 from its offset WAL (same
files, deterministic), the merge re-applies as a no-op, batches 2..3
complete, and the final state must hash-match the batch oracle
(latest-per-user over ALL events) in DuckDB.

Subprocesses run SEQUENTIALLY and stage into their own content-addressed
dir, so this respects the no-two-concurrent-Spark-processes rule; the
parent never opens a Spark session (DuckDB reads the state parquet
directly).
"""

from __future__ import annotations

import os
import pathlib
import shutil
import signal
import subprocess
import sys

import duckdb

REPO = pathlib.Path(__file__).resolve().parents[1]
SF_SMOKE = "/root/testdata/sf0.001"
SCRATCH = REPO / ".scratch"
STATE = SCRATCH / "crashrec_state"
CKPT = SCRATCH / "crashrec_ckpt"

# The child: the q_stream_upsert merge with a checkpoint, killing the
# whole process group after batch CRASH_AT's merge (swap done, commit
# marker not yet written). crash_at < 0 = run to completion.
_CHILD = r"""
import os, signal, sys
sf_dir, state, ckpt, crash_at = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
from pyspark.sql import functions as F
from weighted_raster_overlay_service_toolbox_spark.session import get_spark
from weighted_raster_overlay_service_toolbox_spark.sources.catalog_store import (
    replace_catalog,
)
from weighted_raster_overlay_service_toolbox_spark.streaming.engine import (
    read_event_stream,
    stage_event_files,
)

spark = get_spark("crashrec-child", cpus=4)
staged = stage_event_files(spark, sf_dir, "crashrec")
stream = read_event_stream(spark, staged, files_per_trigger=1)

def upsert(batch_df, batch_id):
    latest = (
        batch_df.groupBy("user_id")
        .agg(
            F.max_by("ts", F.struct("ts", "event_id")).alias("last_ts"),
            F.max_by("event_type", F.struct("ts", "event_id")).alias("last_type"),
            F.max_by("value", F.struct("ts", "event_id")).alias("last_value"),
        )
    )
    if not os.path.isdir(state):
        latest.write.parquet(state)
    else:
        current = batch_df.sparkSession.read.parquet(state)
        keep = current.join(latest, "user_id", "left_anti")
        replace_catalog(state, keep.unionByName(latest))
    if batch_id == crash_at:
        # merge applied, commit marker NOT yet written: the redelivery
        # window. Kill driver + JVM together (own process group).
        os.killpg(0, signal.SIGKILL)

q = (
    stream.writeStream.foreachBatch(upsert)
    .outputMode("update")
    .option("checkpointLocation", ckpt)
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
"""


def _run_child(crash_at: int) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, "-c", _CHILD, SF_SMOKE, str(STATE), str(CKPT),
         str(crash_at)],
        cwd=str(REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        start_new_session=True,  # own pgid so killpg(0) is self-contained
    )


def test_sigkill_between_merge_and_commit_still_matches_oracle():
    for p in (STATE, CKPT):
        shutil.rmtree(p, ignore_errors=True)
    for suffix in (".tmp", ".old"):
        shutil.rmtree(str(STATE) + suffix, ignore_errors=True)

    # Run 1: SIGKILL after batch 1's merge. availableNow over 4 staged
    # files at maxFilesPerTrigger=1 would run batches 0..3; we die at 1.
    r1 = _run_child(crash_at=1)
    assert r1.returncode == -signal.SIGKILL, (r1.returncode, r1.stderr[-2000:])
    # The crash window is real: batch 1's offset is WAL-ed but its commit
    # marker is absent, so the resume MUST replay batch 1.
    offsets = {f for f in os.listdir(CKPT / "offsets") if not f.startswith(".")}
    commits = {f for f in os.listdir(CKPT / "commits") if not f.startswith(".")}
    assert "1" in offsets and "1" not in commits, (offsets, commits)
    # State already holds batch 1's merge -- the double-apply hazard.
    assert os.path.isdir(STATE)

    # Run 2: resume from the same checkpoint; replay + remaining batches.
    r2 = _run_child(crash_at=-1)
    assert r2.returncode == 0, r2.stderr[-4000:]
    commits = {f for f in os.listdir(CKPT / "commits") if not f.startswith(".")}
    assert {"0", "1", "2", "3"} <= commits, commits

    # Exactly-once check: final state == latest-per-user over ALL events,
    # bit-for-bit (the q_stream_upsert oracle), despite batch 1 having
    # been merged twice.
    con = duckdb.connect()
    got = con.execute(
        f"SELECT user_id, last_ts, last_type, last_value"
        f" FROM '{STATE}/*.parquet' ORDER BY user_id"
    ).fetchall()
    want = con.execute(
        f"""
        WITH r AS (
            SELECT user_id, ts, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM '{SF_SMOKE}/events.parquet'
        )
        SELECT user_id, ts AS last_ts, event_type AS last_type,
               value AS last_value
        FROM r WHERE rn = 1 ORDER BY user_id
        """
    ).fetchall()
    assert got == want, (len(got), len(want), got[:3], want[:3])


# Second witness, complementary crash point: the upsert test dies INSIDE
# a batch (redelivery window -- proves merge idempotence); this one dies
# at the START of batch 2, AFTER batch 1 committed -- so the resume
# starts at batch 2 with the per-user running (count, cents) state
# restorable ONLY from the state store (files 0-1 are never re-read:
# the offset log says they are done). If state recovery were broken,
# batch-2 emissions would restart the running totals from zero and the
# oracle compare below would catch it immediately.
_CHILD_STATEFUL = r"""
import json, os, signal, sys
sf_dir, log_path, ckpt, crash_at = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from weighted_raster_overlay_service_toolbox_spark.session import get_spark
from weighted_raster_overlay_service_toolbox_spark.streaming.engine import (
    read_event_stream,
    stage_event_files,
)

spark = get_spark("crashrec-stateful", cpus=4)
staged = stage_event_files(spark, sf_dir, "crashrec_stateful")

def update(key, pdfs, state: GroupState):
    import pandas as pd
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, int(cents)))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_value": [cents / 100.0]})

out = (
    read_event_stream(spark, staged, files_per_trigger=1)
    .groupBy("user_id")
    .applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
)

def sink(batch_df, batch_id):
    if batch_id == crash_at:
        os.killpg(0, signal.SIGKILL)  # BEFORE reading: batch not logged
    rows = [
        [batch_id, r["user_id"], r["n_events"], r["sum_value"]]
        for r in batch_df.collect()
    ]
    with open(log_path, "a") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")

q = (
    out.writeStream.foreachBatch(sink)
    .outputMode("update")
    .option("checkpointLocation", ckpt)
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
"""

STATEFUL_LOG = SCRATCH / "crashrec_stateful_log.jsonl"
STATEFUL_CKPT = SCRATCH / "crashrec_stateful_ckpt"


def _run_stateful_child(crash_at: int) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, "-c", _CHILD_STATEFUL, SF_SMOKE, str(STATEFUL_LOG),
         str(STATEFUL_CKPT), str(crash_at)],
        cwd=str(REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        start_new_session=True,
    )


def test_sigkill_between_batches_restores_running_state_from_store():
    import json

    shutil.rmtree(STATEFUL_CKPT, ignore_errors=True)
    STATEFUL_LOG.unlink(missing_ok=True)

    r1 = _run_stateful_child(crash_at=2)
    assert r1.returncode == -signal.SIGKILL, (r1.returncode, r1.stderr[-2000:])
    commits = {
        f for f in os.listdir(STATEFUL_CKPT / "commits") if not f.startswith(".")
    }
    assert {"0", "1"} <= commits and "2" not in commits, commits

    r2 = _run_stateful_child(crash_at=-1)
    assert r2.returncode == 0, r2.stderr[-4000:]

    got = sorted(
        tuple(json.loads(line)) for line in open(STATEFUL_LOG)
    )
    # each batch logged exactly once across the two runs
    assert sorted({b for b, *_ in got}) == [0, 1, 2, 3], got[:5]

    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH ranked AS (
                SELECT user_id, value,
                       ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
                       COUNT(*) OVER () AS total
                FROM '{SF_SMOKE}/events.parquet'
            ),
            b AS (
                SELECT user_id, value,
                       CAST((rn - 1) // (total // 4 + 1) AS INTEGER) AS batch_id
                FROM ranked
            ),
            pb AS (
                SELECT user_id, batch_id, COUNT(*) AS c,
                       SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
                FROM b GROUP BY user_id, batch_id
            )
            SELECT batch_id, user_id,
                   CAST(SUM(c) OVER w AS BIGINT) AS n_events,
                   CAST(SUM(cents) OVER w / 100.0 AS DOUBLE) AS sum_value
            FROM pb
            WINDOW w AS (PARTITION BY user_id ORDER BY batch_id)
            """
        ).fetchall()
    )
    assert got == want, (len(got), len(want), got[:3], want[:3])


# Third witness (round 11, VERDICT r10 #3): the near-dup ingest pipeline
# on the ROCKSDB state store provider. Crash point = inside foreachBatch
# AFTER batch 1's survivor partition is written but BEFORE the commit
# marker (the replay window): the resume must (a) restore the band-key
# claim state from RocksDB, (b) replay batch 1 against state version 1
# (not the post-crash state), and (c) overwrite batch_id=1 byte-
# identically -- so the final survivor set still hash-matches the batch
# oracle. This is the production-posture witness for q_stream_near_dup:
# RocksDB provider + parquet sink + SIGKILL, end to end.
_CHILD_NEARDUP = r"""
import os, signal, sys
sf_dir, sink, ckpt, crash_at = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
from weighted_raster_overlay_service_toolbox_spark.session import get_spark
from weighted_raster_overlay_service_toolbox_spark.queries.llm import TOKS
from weighted_raster_overlay_service_toolbox_spark.queries.streaming import (
    _SND_BANDS, _SND_K,
)
from weighted_raster_overlay_service_toolbox_spark.streaming.engine import (
    read_document_stream, stage_document_files,
)
from weighted_raster_overlay_service_toolbox_spark.streaming.near_dup import (
    near_dup_band_keys, run_near_dup_ingest,
)

spark = get_spark("crashrec-neardup", cpus=4)
staged = stage_document_files(spark, sf_dir, "crashrec_neardup")
docs = read_document_stream(spark, staged, files_per_trigger=1)
keys = near_dup_band_keys(docs, TOKS(), k=_SND_K, bands=_SND_BANDS)

def boom(batch_id):
    if batch_id == crash_at:
        os.killpg(0, signal.SIGKILL)

run_near_dup_ingest(
    spark, keys, _SND_BANDS, sink, ckpt,
    use_rocksdb=True, _on_batch_end=boom,
)
"""

NEARDUP_SINK = SCRATCH / "crashrec_neardup_sink"
NEARDUP_CKPT = SCRATCH / "crashrec_neardup_ckpt"


def _run_neardup_child(crash_at: int) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, "-c", _CHILD_NEARDUP, SF_SMOKE, str(NEARDUP_SINK),
         str(NEARDUP_CKPT), str(crash_at)],
        cwd=str(REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        start_new_session=True,
    )


def test_neardup_sigkill_on_rocksdb_still_matches_oracle():
    from weighted_raster_overlay_service_toolbox_spark.queries.streaming import (
        _SND_BANDS,
        _SND_K,
        _stream_near_dup_oracle,
    )

    shutil.rmtree(NEARDUP_SINK, ignore_errors=True)
    shutil.rmtree(NEARDUP_CKPT, ignore_errors=True)

    # Run 1: die inside foreachBatch after batch 1's sink write -- the
    # batch_id=1 partition exists but its commit marker does not.
    r1 = _run_neardup_child(crash_at=1)
    assert r1.returncode == -signal.SIGKILL, (r1.returncode, r1.stderr[-2000:])
    offsets = {
        f for f in os.listdir(NEARDUP_CKPT / "offsets") if not f.startswith(".")
    }
    commits = {
        f for f in os.listdir(NEARDUP_CKPT / "commits") if not f.startswith(".")
    }
    assert "1" in offsets and "1" not in commits, (offsets, commits)
    assert (NEARDUP_SINK / "batch_id=1").is_dir()  # replay-window hazard

    # Run 2: resume from the same RocksDB checkpoint; batch 1 replays
    # (claim state restored at version 1), batches 2..3 complete.
    r2 = _run_neardup_child(crash_at=-1)
    assert r2.returncode == 0, r2.stderr[-4000:]
    commits = {
        f for f in os.listdir(NEARDUP_CKPT / "commits") if not f.startswith(".")
    }
    assert {"0", "1", "2", "3"} <= commits, commits

    # Exactly-once check: survivors across all batch partitions ==
    # the registry oracle (batch replay of the claim rule) in DuckDB.
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    want = sorted(
        con.execute(_stream_near_dup_oracle(_SND_K, _SND_BANDS)).fetchall()
    )
    got = sorted(
        con.execute(
            f"SELECT CAST(regexp_extract(filename, 'batch_id=(\\d+)', 1)"
            f" AS INTEGER) AS batch_id, doc_id"
            f" FROM read_parquet('{NEARDUP_SINK}/batch_id=*/*.parquet',"
            f" filename=true)"
        ).fetchall()
    )
    assert got == want, (len(got), len(want), got[:5], want[:5])


# Fourth witness (round 12, VERDICT r11 #3): a STREAM-STREAM join's
# buffer state on the RocksDB provider -- the round-12 generalization of
# the near-dup posture to the rest of the stateful family (the provider
# now defaults to RocksDB on engine.stream_session's clone, so the child
# below sets NOTHING; the layout assertion proves the default engaged).
# Crash point = start of batch 2, AFTER batches 0-1 committed: clicks
# and purchases buffered in batches 0-1 whose partners arrive in batches
# 2-3 can only match if the join buffers are restored from the state
# store (the offset log marks files 0-1 done; they are never re-read).
# Final joined set across both runs must equal the batch inner join.
_CHILD_SSJOIN = r"""
import json, os, signal, sys
sf_dir, log_path, ckpt, crash_at = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
from pyspark.sql import functions as F
from weighted_raster_overlay_service_toolbox_spark.session import get_spark
from weighted_raster_overlay_service_toolbox_spark.streaming.engine import (
    read_event_stream,
    stage_event_files,
)

spark = get_spark("crashrec-ssjoin", cpus=4)
staged_a = stage_event_files(spark, sf_dir, "crashrec_ssj_a")
staged_b = stage_event_files(spark, sf_dir, "crashrec_ssj_b")

clicks = (
    read_event_stream(spark, staged_a, files_per_trigger=1)
    .filter(F.col("event_type") == "click")
    .select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    .withWatermark("click_ts", "2 hours")
)
purchases = (
    read_event_stream(spark, staged_b, files_per_trigger=1)
    .filter(F.col("event_type") == "purchase")
    .select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    .withWatermark("purchase_ts", "2 hours")
)
joined = clicks.join(
    purchases,
    (F.col("user_id") == F.col("p_user_id"))
    & (F.col("purchase_ts") >= F.col("click_ts"))
    & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 1 hour")),
    "inner",
).select("click_id", "purchase_id")

def sink(batch_df, batch_id):
    if batch_id == crash_at:
        os.killpg(0, signal.SIGKILL)  # BEFORE reading: batch not logged
    rows = [[batch_id, r["click_id"], r["purchase_id"]]
            for r in batch_df.collect()]
    with open(log_path, "a") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")

q = (
    joined.writeStream.foreachBatch(sink)
    .outputMode("append")
    .option("checkpointLocation", ckpt)
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
"""

SSJOIN_LOG = SCRATCH / "crashrec_ssjoin_log.jsonl"
SSJOIN_CKPT = SCRATCH / "crashrec_ssjoin_ckpt"


def _run_ssjoin_child(crash_at: int) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, "-c", _CHILD_SSJOIN, SF_SMOKE, str(SSJOIN_LOG),
         str(SSJOIN_CKPT), str(crash_at)],
        cwd=str(REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        start_new_session=True,
    )


def test_ssjoin_sigkill_restores_join_buffers_from_rocksdb():
    import json

    shutil.rmtree(SSJOIN_CKPT, ignore_errors=True)
    SSJOIN_LOG.unlink(missing_ok=True)

    r1 = _run_ssjoin_child(crash_at=2)
    assert r1.returncode == -signal.SIGKILL, (r1.returncode, r1.stderr[-2000:])
    commits = {
        f for f in os.listdir(SSJOIN_CKPT / "commits") if not f.startswith(".")
    }
    assert {"0", "1"} <= commits and "2" not in commits, commits

    # the stream_session RocksDB DEFAULT engaged (the child sets no
    # provider conf): a heap-backed checkpoint would hold .delta files.
    state_root = SSJOIN_CKPT / "state"
    deltas = [
        f
        for root, _dirs, files in os.walk(state_root)
        for f in files
        if f.endswith(".delta")
    ]
    assert not deltas, (
        f"heap-backed provider engaged (found {len(deltas)} .delta files)"
    )

    r2 = _run_ssjoin_child(crash_at=-1)
    assert r2.returncode == 0, r2.stderr[-4000:]

    got_rows = [tuple(json.loads(line)) for line in open(SSJOIN_LOG)]
    got = sorted((c, p) for _b, c, p in got_rows)
    # exactly-once: no pair emitted twice across the crash boundary
    assert len(got) == len(set(got)), "duplicate join emissions"

    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT a.event_id AS click_id, b.event_id AS purchase_id
            FROM '{SF_SMOKE}/events.parquet' a
            JOIN '{SF_SMOKE}/events.parquet' b
              ON a.user_id = b.user_id
             AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
            WHERE a.event_type = 'click' AND b.event_type = 'purchase'
            """
        ).fetchall()
    )
    assert got == want, (len(got), len(want), got[:3], want[:3])
