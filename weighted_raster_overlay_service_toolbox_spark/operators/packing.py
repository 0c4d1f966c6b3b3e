"""Sequence packing and token-window chunking for LLM training pipelines.

Two ops a corpus-to-training-batches pipeline needs between curation and
the data loader:

- :func:`chunk_tokens` -- split each document into fixed-size token
  windows with overlap (context-length chunking). Pure column
  expressions: a per-row ``sequence``/``explode``/``slice`` chain, no
  shuffle, fully whole-stage-codegen'd.
- :func:`pack_greedy` -- greedy first-fit-in-order packing of documents
  into fixed token-budget bins (batch packing). Packing is inherently
  sequential *within one bin stream*, so the scale design is the one real
  pipelines use: partition the corpus into independent streams (a shard
  key -- language, domain, or a hash bucket), pack each stream greedily,
  and parallelize across streams. Implemented with Arrow-batched
  ``applyInPandas`` per stream: one shuffle on the shard key, O(n) Python
  per group, deterministic given the in-stream order column.

At 100 TB: chunking stays narrow (scales with input splits); packing's
only shuffle is the shard partitioning, and bin ids are stream-local --
global bin ids, if needed, are (shard, bin_id) pairs, which avoids any
cross-shard coordination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    chunk_size: int,
    stride: int,
) -> DataFrame:
    """Fixed-size token windows with overlap: starts at 0, stride,
    2*stride, ... while start < n_tokens (every token is covered; the
    last window may be short). Returns one row per (doc, chunk) with the
    window re-joined to text -- scalar columns only, per the
    driver-hashability convention.
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError(f"{chunk_size=} and {stride=} must be positive")
    n = F.size(tokens_col)
    n_chunks = F.ceil(n.cast("double") / stride).cast("int")
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col.alias("tk"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("tk"), F.col("chunk_idx") * stride + 1, chunk_size
    )
    return t.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * stride).cast("int").alias("chunk_start"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_greedy(
    docs: DataFrame,
    shard_col: str,
    order_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Greedy first-fit-in-order packing within each shard.

    Rule (mirrored exactly by the recursive-CTE oracle in
    queries/llm.py): walk the shard's docs in ``order_col`` order; a doc
    joins the current bin iff ``fill + size <= budget``, else it opens
    the next bin (an oversized doc therefore gets a bin of its own).
    Returns the input keys plus ``bin_id`` (stream-local, 0-based) and
    ``bin_fill`` (the bin's running fill after this doc).
    """
    if budget <= 0:
        raise ValueError(f"{budget=} must be positive")
    schema = (
        f"{order_col} long, {shard_col} string, {size_col} int, "
        "bin_id int, bin_fill int"
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort")
        bin_id, fill = 0, 0
        bins, fills = [], []
        for size in pdf[size_col]:
            size = int(size)
            if fill and fill + size > budget:
                bin_id += 1
                fill = 0
            fill += size
            bins.append(bin_id)
            fills.append(fill)
        return pd.DataFrame(
            {
                order_col: pdf[order_col].values,
                shard_col: pdf[shard_col].values,
                size_col: pdf[size_col].astype("int32").values,
                "bin_id": pd.array(bins, dtype="int32"),
                "bin_fill": pd.array(fills, dtype="int32"),
            }
        )

    return (
        docs.select(order_col, shard_col, F.col(size_col).cast("int"))
        .groupBy(shard_col)
        .applyInPandas(pack, schema)
    )
