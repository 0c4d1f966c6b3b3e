"""Semantics pins for the training-batch prep operators
(operators/packing.py): chunk coverage/overlap properties and the greedy
packing invariants, independent of the DuckDB oracle."""

import pyspark.sql.functions as F
import pytest

from weighted_raster_overlay_service_toolbox_spark.operators.packing import (
    chunk_tokens,
    pack_greedy,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(150))
    out = chunk_tokens(
        _docs(spark, [(1, text)]),
        "doc_id",
        F.split("text", " "),
        chunk_size=64,
        stride=48,
    ).collect()
    # starts at 0,48,96,144 -> ceil(150/48) = 4 chunks
    assert [r["chunk_start"] for r in sorted(out, key=lambda r: r["chunk_idx"])] == [
        0, 48, 96, 144,
    ]
    # windows overlap by 16 and the tail is short
    assert [r["n_chunk_tokens"] for r in sorted(out, key=lambda r: r["chunk_idx"])] == [
        64, 64, 54, 6,
    ]
    covered = set()
    for r in out:
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["n_chunk_tokens"]
        start = r["chunk_start"]
        assert toks == [f"t{i}" for i in range(start, start + len(toks))]
        covered.update(range(start, start + len(toks)))
    assert covered == set(range(150))


def test_chunk_short_doc_is_single_chunk(spark):
    out = chunk_tokens(
        _docs(spark, [(1, "a b c")]),
        "doc_id",
        F.split("text", " "),
        chunk_size=64,
        stride=48,
    ).collect()
    assert len(out) == 1
    assert out[0]["chunk_idx"] == 0 and out[0]["chunk_text"] == "a b c"


def test_chunk_plan_has_no_shuffle(spark):
    df = chunk_tokens(
        _docs(spark, [(1, "a b c")]),
        "doc_id",
        F.split("text", " "),
        chunk_size=4,
        stride=2,
    )
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


def test_chunk_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_tokens(
            _docs(spark, [(1, "a")]), "doc_id", F.split("text", " "), 0, 1
        )


def _sized(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, shard string, n int")


def test_pack_greedy_invariants(spark):
    rows = [(i, "s", 100 + (i * 37) % 200) for i in range(40)]
    out = sorted(
        pack_greedy(_sized(spark, rows), "shard", "doc_id", "n", budget=512)
        .collect(),
        key=lambda r: r["doc_id"],
    )
    sizes = {i: n for i, _, n in rows}
    # bin ids are contiguous and nondecreasing in doc order
    bins = [r["bin_id"] for r in out]
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # no bin exceeds budget (no oversized docs in this fixture)
    fills: dict[int, int] = {}
    for r in out:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + sizes[r["doc_id"]]
    assert all(v <= 512 for v in fills.values())
    # greedy: the doc that OPENED bin k would not have fit in bin k-1
    first_in_bin = {}
    for r in out:
        first_in_bin.setdefault(r["bin_id"], r["doc_id"])
    for b, doc in first_in_bin.items():
        if b > 0:
            assert fills[b - 1] + sizes[doc] > 512
    # bin_fill is the running fill, ending at the bin total
    last_fill = {r["bin_id"]: r["bin_fill"] for r in out}  # last doc wins
    assert last_fill == fills


def test_pack_oversized_doc_gets_own_bin(spark):
    rows = [(1, "s", 100), (2, "s", 900), (3, "s", 100)]
    out = {
        r["doc_id"]: r
        for r in pack_greedy(
            _sized(spark, rows), "shard", "doc_id", "n", budget=512
        ).collect()
    }
    assert (out[1]["bin_id"], out[2]["bin_id"], out[3]["bin_id"]) == (0, 1, 2)
    assert out[2]["bin_fill"] == 900


def test_pack_shards_are_independent(spark):
    rows = [(1, "a", 300), (2, "b", 300), (3, "a", 300), (4, "b", 300)]
    out = {
        r["doc_id"]: r["bin_id"]
        for r in pack_greedy(
            _sized(spark, rows), "shard", "doc_id", "n", budget=512
        ).collect()
    }
    # each shard packs from bin 0 as if the other didn't exist
    assert out == {1: 0, 2: 0, 3: 1, 4: 1}


# ---------------------------------------------------------------------------
# property tests: Spark operators vs pure-Python reimplementations
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _pack_reference(sizes: list[int], budget: int) -> list[tuple[int, int]]:
    """Pure-Python greedy first-fit-in-order packer (the spec)."""
    out, bin_id, fill = [], 0, 0
    for size in sizes:
        if fill and fill + size > budget:
            bin_id += 1
            fill = 0
        fill += size
        out.append((bin_id, fill))
    return out


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=700), min_size=1,
                   max_size=40),
    budget=st.integers(min_value=50, max_value=600),
)
@settings(max_examples=10, deadline=None)
def test_pack_greedy_matches_pure_python(spark, sizes, budget):
    rows = [(i, "s", n) for i, n in enumerate(sizes)]
    got = sorted(
        (r["doc_id"], r["bin_id"], r["bin_fill"])
        for r in pack_greedy(
            _sized(spark, rows), "shard", "doc_id", "n", budget=budget
        ).collect()
    )
    want = [
        (i, b, f) for i, (b, f) in enumerate(_pack_reference(sizes, budget))
    ]
    assert got == want


def _chunk_reference(
    toks: list[str], chunk_size: int, stride: int
) -> list[tuple[int, int, list[str]]]:
    out = []
    start, idx = 0, 0
    while start < len(toks):
        out.append((idx, start, toks[start : start + chunk_size]))
        idx += 1
        start += stride
    return out


@given(
    n_tokens=st.integers(min_value=1, max_value=200),
    chunk_size=st.integers(min_value=1, max_value=50),
    stride=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=10, deadline=None)
def test_chunk_tokens_matches_pure_python(spark, n_tokens, chunk_size, stride):
    toks = [f"t{i}" for i in range(n_tokens)]
    got = sorted(
        (r["chunk_idx"], r["chunk_start"], r["chunk_text"])
        for r in chunk_tokens(
            _docs(spark, [(1, " ".join(toks))]),
            "doc_id",
            F.split("text", " "),
            chunk_size=chunk_size,
            stride=stride,
        ).collect()
    )
    want = [
        (i, s, " ".join(c))
        for i, s, c in _chunk_reference(toks, chunk_size, stride)
    ]
    assert got == want
