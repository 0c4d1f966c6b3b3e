"""State posture pins for the streaming near-dup index (VERDICT r10 #5).

Three claims the operator's docstrings make become tests here:

1. **Growth law**: the claim store holds EXACTLY one entry per distinct
   band key the corpus presents -- ``rows == |distinct (band_idx,
   band_key)| <= bands x |docs|`` -- verified by reading the actual
   state store back through Spark's ``statestore`` data source after a
   full run on the RocksDB provider. State tracks corpus NOVELTY: a
   second presentation of a key never adds an entry.

2. **TTL transitions** (the bounding knob): driven deterministically
   through ``make_claim_fn`` with a fake GroupState -- fresh key claims
   for the in-batch minimum doc_id and arms the timeout; an existing
   claim is refreshed, never re-assigned; a timed-out invocation REMOVES
   the claim (the key becomes claimable again) and emits nothing.

3. **Sink layout**: survivors land partitioned by batch_id with
   per-batch overwrite (the idempotent-replay contract the crash test
   exercises end-to-end).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.queries.llm import TOKS
from weighted_raster_overlay_service_toolbox_spark.queries.streaming import (
    _SND_BANDS,
    _SND_K,
)
from weighted_raster_overlay_service_toolbox_spark.sources import load_table
from weighted_raster_overlay_service_toolbox_spark.streaming.engine import (
    read_document_stream,
    stage_document_files,
)
from weighted_raster_overlay_service_toolbox_spark.streaming.near_dup import (
    make_claim_fn,
    near_dup_band_keys,
    near_dup_index_snapshot,
    run_near_dup_ingest,
)

from .conftest import SF_SMOKE

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".scratch")


def test_state_rows_equal_distinct_band_keys(spark):
    sink = os.path.join(SCRATCH, "neardup_state_sink")
    ckpt = os.path.join(SCRATCH, "neardup_state_ckpt")
    for p in (sink, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    staged = stage_document_files(spark, SF_SMOKE, "neardup_state")
    docs = read_document_stream(spark, staged, files_per_trigger=1)
    keys = near_dup_band_keys(docs, TOKS(), k=_SND_K, bands=_SND_BANDS)
    surv = run_near_dup_ingest(
        spark, keys, _SND_BANDS, sink, ckpt, use_rocksdb=True
    )
    assert surv.count() > 0

    # the same band keys, computed in batch over the same table
    batch_docs = load_table(spark, SF_SMOKE, "documents")
    batch_keys = near_dup_band_keys(
        batch_docs, TOKS(), k=_SND_K, bands=_SND_BANDS
    )
    n_distinct = (
        batch_keys.select("band_idx", "band_key").distinct().count()
    )
    n_docs = batch_docs.count()

    state = (
        spark.read.format("statestore").option("path", ckpt).load()
    )
    n_state = state.count()
    assert n_state == n_distinct, (n_state, n_distinct)
    assert n_state <= _SND_BANDS * n_docs
    # one state entry per key, none empty (the Python stateful op stores
    # the user tuple under value.groupState)
    assert state.filter(F.col("value").isNull()).count() == 0

    # the RocksDB provider actually engaged: its checkpoint layout has
    # no HDFSBackedStateStore .delta version files. (Caught live in
    # r11: setting the provider conf on the CALLER's session silently
    # left the stream -- which runs on engine.stream_session's clone --
    # on the default heap provider.)
    state_root = os.path.join(ckpt, "state")
    deltas = [
        f
        for root, _dirs, files in os.walk(state_root)
        for f in files
        if f.endswith(".delta")
    ]
    assert not deltas, (
        f"heap-backed provider engaged (found {len(deltas)} .delta files)"
    )

    # sink layout: one batch_id=<n> partition per staged file
    parts = {
        d for d in os.listdir(sink) if d.startswith("batch_id=")
    }
    assert parts == {f"batch_id={i}" for i in range(4)}, parts


class _FakeState:
    """Minimal GroupState stand-in for driving make_claim_fn."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.timeout_set = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("state does not exist")
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None
        self.removed = True

    def setTimeoutDuration(self, ms):  # noqa: N802 (GroupState API name)
        self.timeout_set = ms


def _batch(ids):
    return iter([pd.DataFrame({"doc_id": ids})])


def test_ttl_fresh_key_claims_min_and_arms_timeout():
    claim = make_claim_fn(ttl_ms=60_000)
    st = _FakeState()
    out = pd.concat(list(claim(("0", "k"), _batch([7, 3, 9]), st)))
    assert st.get == (3,)
    assert st.timeout_set == 60_000
    assert sorted(zip(out["doc_id"], out["owned"])) == [
        (3, True), (7, False), (9, False),
    ]


def test_ttl_existing_claim_is_refreshed_never_reassigned():
    claim = make_claim_fn(ttl_ms=60_000)
    st = _FakeState(value=(3,))
    out = pd.concat(list(claim(("0", "k"), _batch([1, 3]), st)))
    # doc 1 < owner 3 but the claim is first-wins, not min-over-time
    assert st.get == (3,)
    assert st.timeout_set == 60_000  # refreshed on every presentation
    assert sorted(zip(out["doc_id"], out["owned"])) == [
        (1, False), (3, True),
    ]


def test_ttl_timeout_removes_claim_and_emits_nothing():
    claim = make_claim_fn(ttl_ms=60_000)
    st = _FakeState(value=(3,), timed_out=True)
    assert list(claim(("0", "k"), iter([]), st)) == []
    assert st.removed and not st.exists
    # the key is claimable again: the next presenter wins it
    st2 = _FakeState()
    pd.concat(list(claim(("0", "k"), _batch([8]), st2)))
    assert st2.get == (8,)


def test_no_ttl_never_touches_timeout_api():
    claim = make_claim_fn(ttl_ms=None)
    st = _FakeState()
    pd.concat(list(claim(("0", "k"), _batch([5]), st)))
    assert st.get == (5,)
    assert st.timeout_set is None


def test_snapshot_preload_equals_continuous_stream(spark):
    """The compaction knob (VERDICT r10 #5): snapshot the claim index
    after an ingest window, then run a FRESH stream (empty state, new
    checkpoint) over the REMAINING corpus with the snapshot as
    claimed_index_path -- survivors must equal the single continuous
    run's, batch for batch. This is what makes periodic state
    compaction safe: suppression only needs claim EXISTENCE, which the
    anti-join preserves exactly."""
    import glob

    base = os.path.join(SCRATCH, "neardup_split")
    for d in ("a", "b", "full", "sink_a", "sink_b", "sink_f",
              "ckpt_a", "ckpt_b", "ckpt_f", "idx"):
        shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    staged = stage_document_files(spark, SF_SMOKE, "neardup_splitsrc")
    parts = sorted(glob.glob(os.path.join(staged, "batch_*.parquet")))
    assert len(parts) == 4, parts
    half_a = os.path.join(base, "a")
    half_b = os.path.join(base, "b")
    for dst, srcs in ((half_a, parts[:2]), (half_b, parts[2:])):
        os.makedirs(dst, exist_ok=True)
        for p in srcs:
            shutil.copytree(p, os.path.join(dst, os.path.basename(p)))

    def ingest(staged_dir, tag, index_path=None):
        docs = read_document_stream(spark, staged_dir, files_per_trigger=1)
        keys = near_dup_band_keys(docs, TOKS(), k=_SND_K, bands=_SND_BANDS)
        return run_near_dup_ingest(
            spark, keys, _SND_BANDS,
            os.path.join(base, f"sink_{tag}"),
            os.path.join(base, f"ckpt_{tag}"),
            use_rocksdb=True,
            claimed_index_path=index_path,
        )

    # continuous reference over all 4 batches
    full = {
        (r.batch_id, r.doc_id) for r in ingest(staged, "f").collect()
    }
    # window A (batches 0-1) -> snapshot -> fresh window B (batches 2-3)
    surv_a = {
        (r.batch_id, r.doc_id) for r in ingest(half_a, "a").collect()
    }
    idx_path = os.path.join(base, "idx")
    near_dup_index_snapshot(spark, os.path.join(base, "ckpt_a")).write.parquet(
        idx_path
    )
    surv_b = {
        (r.batch_id + 2, r.doc_id)
        for r in ingest(half_b, "b", index_path=idx_path).collect()
    }
    assert surv_a | surv_b == full, (
        sorted(surv_a | surv_b), sorted(full),
    )
    # and the fresh window's live state holds ONLY post-snapshot novelty
    n_b = (
        spark.read.format("statestore")
        .option("path", os.path.join(base, "ckpt_b"))
        .load()
        .count()
    )
    n_idx = spark.read.parquet(idx_path).count()
    n_full = (
        spark.read.format("statestore")
        .option("path", os.path.join(base, "ckpt_f"))
        .load()
        .count()
    )
    assert n_b + n_idx == n_full, (n_b, n_idx, n_full)


def test_bloom_routed_preload_equals_plain_anti_join(spark):
    """bloom_route must be pure routing: the survivor set of a preloaded
    window is identical with and without the Bloom front (the sketch
    decides who pays the join, never the answer -- the q_dedup_bloom
    contract, restated for the stream-static preload)."""
    import glob

    base = os.path.join(SCRATCH, "neardup_bloom")
    for d in ("b1", "b2", "sink_b1", "sink_b2", "ckpt_b1", "ckpt_b2"):
        shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    # reuse the split fixture's window A snapshot + window B staging
    split_base = os.path.join(SCRATCH, "neardup_split")
    idx_path = os.path.join(split_base, "idx")
    half_b = os.path.join(split_base, "b")
    if not (os.path.isdir(idx_path) and os.path.isdir(half_b)):
        # the split test has not run in this session: build the inputs
        staged = stage_document_files(spark, SF_SMOKE, "neardup_splitsrc")
        parts = sorted(glob.glob(os.path.join(staged, "batch_*.parquet")))
        os.makedirs(half_b, exist_ok=True)
        for p in parts[2:]:
            dst = os.path.join(half_b, os.path.basename(p))
            if not os.path.isdir(dst):
                shutil.copytree(p, dst)
        half_a = os.path.join(split_base, "a")
        os.makedirs(half_a, exist_ok=True)
        for p in parts[:2]:
            dst = os.path.join(half_a, os.path.basename(p))
            if not os.path.isdir(dst):
                shutil.copytree(p, dst)
        shutil.rmtree(os.path.join(split_base, "ckpt_a"), ignore_errors=True)
        docs_a = read_document_stream(spark, half_a, files_per_trigger=1)
        run_near_dup_ingest(
            spark,
            near_dup_band_keys(docs_a, TOKS(), k=_SND_K, bands=_SND_BANDS),
            _SND_BANDS,
            os.path.join(split_base, "sink_a"),
            os.path.join(split_base, "ckpt_a"),
        )
        near_dup_index_snapshot(
            spark, os.path.join(split_base, "ckpt_a")
        ).write.mode("overwrite").parquet(idx_path)

    def ingest_b(tag, bloom):
        docs = read_document_stream(spark, half_b, files_per_trigger=1)
        keys = near_dup_band_keys(docs, TOKS(), k=_SND_K, bands=_SND_BANDS)
        return run_near_dup_ingest(
            spark, keys, _SND_BANDS,
            os.path.join(base, f"sink_{tag}"),
            os.path.join(base, f"ckpt_{tag}"),
            claimed_index_path=idx_path,
            bloom_route=bloom,
        )

    with_bloom = sorted(map(tuple, ingest_b("b1", True).collect()))
    without = sorted(map(tuple, ingest_b("b2", False).collect()))
    assert with_bloom == without, (len(with_bloom), len(without))
    # survivors may legitimately be empty at this SF (window A's claims
    # cover window B densely); the routing equivalence must also hold
    # for the STATE the two runs build -- same novelty, same count.
    n1 = (
        spark.read.format("statestore")
        .option("path", os.path.join(base, "ckpt_b1")).load().count()
    )
    n2 = (
        spark.read.format("statestore")
        .option("path", os.path.join(base, "ckpt_b2")).load().count()
    )
    assert n1 == n2 > 0, (n1, n2)
