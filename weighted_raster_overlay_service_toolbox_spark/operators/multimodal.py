"""Multimodal column operators: decode, feature-extract, resize,
frame-sample over opaque binary payloads.

Model (SURVEY.md section 2.2 "multimodal"): media travels as a ``binary``
column plus a typed metadata struct; per-item processing runs in
Arrow-batched ``mapInPandas`` so bytes move Python-side once per batch,
never per row.

STUBS, clearly marked: this container has no media libraries (PIL,
librosa, av), so the pixel/sample math is a deterministic fake derived
from the payload hash. Everything Spark-side is real and is what a true
decoder would use unchanged: the input/output schemas, the Arrow batch
iteration, the partition-preserving shape (one output row per input for
decode/resize, N rows per input for frame sampling). Swap the body of
``_fake_*`` for real decode calls and nothing else changes.

Scale: mapInPandas is narrow (no shuffle); payload bytes stay columnar in
Arrow; batch size is governed by ``spark.sql.execution.arrow.
maxRecordsPerBatch`` -- size it so batch_bytes ~ payload * records fits
the worker heap.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """STUB for a real image decode: deterministic dims from the hash."""
    h = hashlib.md5(payload).digest()
    return (
        int.from_bytes(h[:2], "big") % 1920 + 1,
        int.from_bytes(h[2:4], "big") % 1080 + 1,
    )


def decode_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """binary -> (id, n_bytes, width, height): one output row per input."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_dims(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": pdf[payload_col].str.len().astype("int64"),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(run, "id long, n_bytes long, width int, height int")


def resize(
    df: DataFrame, id_col: str, payload_col: str, max_side: int
) -> DataFrame:
    """binary -> (id, width, height, scale): aspect-preserving shrink so
    the longest side is ``max_side`` (scale 1.0 when already smaller).
    One output row per input; a real implementation would also emit the
    resized payload bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                w, h = _fake_dims(p)
                scale = min(1.0, max_side / max(w, h))
                out_rows.append(
                    (i, int(round(w * scale)), int(round(h * scale)), round(scale, 6))
                )
            yield pd.DataFrame(
                out_rows, columns=["id", "width", "height", "scale"]
            )

    return df.mapInPandas(run, "id long, width int, height int, scale double")


def frame_sample(
    df: DataFrame, id_col: str, payload_col: str, every_n_bytes: int
) -> DataFrame:
    """binary -> one row per sampled "frame": byte-offset sampling stands
    in for video frame extraction (N output rows per input -- the
    table-generating shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, checks = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                for k, off in enumerate(range(0, len(p), every_n_bytes)):
                    chunk = p[off : off + every_n_bytes]
                    ids.append(i)
                    idxs.append(k)
                    offs.append(off)
                    checks.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "frame_checksum": checks,
                }
            )

    return df.mapInPandas(
        run, "id long, frame_idx int, byte_offset long, frame_checksum string"
    )
