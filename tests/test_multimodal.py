"""Multimodal operator tests: the PPM decode is REAL -- width/height/
channel-means/checksum are checked against ground truth computed
independently in pure Python from the same fixture text, and malformed
payloads must raise. The Spark mechanics (Arrow batching, row shapes)
are pinned alongside."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
    decode_ppm_features,
    frame_sample,
    parse_ppm,
    ppm_payload,
    resize,
)
from weighted_raster_overlay_service_toolbox_spark.sources import load_table

from .conftest import SF_SMOKE


def _ppm_sources(spark):
    return load_table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        "text",
        ((F.col("doc_id") % 6) + 2).cast("int").alias("w"),
        ((F.col("doc_id") % 4) + 2).cast("int").alias("h"),
    )


def _payloads(spark):
    return _ppm_sources(spark).select(
        "doc_id", ppm_payload("w", "h", "text").alias("payload")
    )


def _expected_raster(text: str, n: int, pad: str = "pixel") -> bytes:
    """Replicates rpad(text, n, 'pixel') -- truncate or pad by repeating
    the pad string."""
    if len(text) >= n:
        return text[:n].encode("ascii")
    need = n - len(text)
    return (text + (pad * (need // len(pad) + 1))[:need]).encode("ascii")


def test_parse_ppm_exact_known_image():
    # 2x1 image, red then green pixel; comment in header per netpbm spec
    raster = bytes([255, 0, 0, 0, 255, 0])
    img = b"P6\n# a comment\n2 1\n255\n" + raster
    meta = parse_ppm(img)
    assert meta["width"] == 2 and meta["height"] == 1 and meta["maxval"] == 255
    assert (meta["mean_r"], meta["mean_g"], meta["mean_b"]) == (127.5, 127.5, 0.0)
    assert meta["checksum"] == hashlib.md5(raster).hexdigest()


@pytest.mark.parametrize(
    "bad",
    [
        b"P5\n2 1\n255\n" + bytes(6),  # wrong magic (greyscale PGM)
        b"P6\n2 1\n255\n" + bytes(3),  # short raster
        b"P6\n2 1\n70000\n" + bytes(6),  # maxval needs 2-byte samples
        b"P6\nx 1\n255\n" + bytes(6),  # non-numeric width
        b"P6\n2 1",  # truncated header
    ],
)
def test_parse_ppm_rejects_malformed(bad):
    with pytest.raises(ValueError):
        parse_ppm(bad)


def test_decode_matches_independent_ground_truth(spark):
    """The decoded features must equal values computed WITHOUT Spark or
    the parser: dims from the doc_id formula, means/checksum from a
    pure-Python reconstruction of the raster bytes."""
    got = {
        r["id"]: r.asDict()
        for r in decode_ppm_features(_payloads(spark), "doc_id", "payload").collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet' "
        "ORDER BY doc_id LIMIT 25"
    ).fetchall()
    assert docs
    for doc_id, text in docs:
        w, h = (doc_id % 6) + 2, (doc_id % 4) + 2
        raster = _expected_raster(text, w * h * 3)
        r = got[doc_id]
        assert (r["width"], r["height"], r["maxval"]) == (w, h, 255)
        assert r["checksum"] == hashlib.md5(raster).hexdigest()
        for ch, name in enumerate(("mean_r", "mean_g", "mean_b")):
            expect = round(sum(raster[ch::3]) / (w * h), 6)
            assert abs(r[name] - expect) < 1e-9, (doc_id, name)


def test_decode_one_row_per_input_and_deterministic(spark):
    src = _payloads(spark)
    out = decode_ppm_features(src, "doc_id", "payload")
    assert out.columns == [
        "id", "width", "height", "maxval", "mean_r", "mean_g", "mean_b", "checksum",
    ]
    assert out.count() == src.count()
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, decode_ppm_features(src, "doc_id", "payload").collect())
    )


def test_resize_respects_max_side_with_real_dims(spark):
    out = resize(_payloads(spark), "doc_id", "payload", max_side=4)
    rows = out.collect()
    assert rows
    for r in rows:
        w, h = (r["id"] % 6) + 2, (r["id"] % 4) + 2
        assert max(r["width"], r["height"]) <= 4
        assert 0 < r["scale"] <= 1.0
        assert r["width"] == int(round(w * r["scale"]))
        assert r["height"] == int(round(h * r["scale"]))


def test_frame_sample_expands_rows(spark):
    src = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    out = frame_sample(src, "doc_id", "payload", every_n_bytes=40)
    n_in = src.count()
    n_out = out.count()
    assert n_out > n_in  # table-generating: multiple frames per doc
    # offsets are aligned and frame indexes dense per doc
    sample = out.filter(F.col("id") == 0).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in sample] == list(range(len(sample)))
    assert all(r["byte_offset"] == r["frame_idx"] * 40 for r in sample)


def _ppm_bytes(w: int, h: int, pixels: bytes) -> bytes:
    assert len(pixels) == w * h * 3
    return f"P6\n{w} {h}\n255\n".encode() + pixels


def test_ahash_exact_known_image(spark):
    """Hand-computed aHash: a 4x1 image whose 4 pixels gray to
    (30, 30, 300, 300) under r+g+b. n=4, bits=16 => pixel i lands in
    block 4i (blocks 0,4,8,12); total=660, per-block n_j=1, so
    bit = (gray * 4 >= 660) => pixels 2,3 set => phash =
    (1<<8) | (1<<12) = 4352."""
    from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
        ahash_ppm,
    )

    px = bytes([10, 10, 10, 10, 10, 10, 100, 100, 100, 100, 100, 100])
    df = spark.createDataFrame(
        [(1, _ppm_bytes(4, 1, px))], "id long, payload binary"
    )
    rows = ahash_ppm(df, "id", "payload").collect()
    assert [(r.id, r.phash) for r in rows] == [(1, (1 << 8) | (1 << 12))]


def test_ahash_brightness_shift_invariance(spark):
    """The aHash mean-threshold rule is EXACTLY invariant to a uniform
    brightness shift: adding c to every gray value adds c*n_j*n to both
    sides of sum_j * n >= total * n_j. A re-exposed copy of an image
    therefore hashes identically -- the property that makes perceptual
    dedup catch what checksum dedup cannot."""
    from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
        ahash_ppm,
    )

    base = bytes([7, 3, 12, 40, 2, 9, 99, 98, 97, 20, 21, 22,
                  5, 5, 5, 80, 70, 60])  # 6 pixels, 2x3
    shifted = bytes(min(255, b + 10) for b in base)
    assert max(base) + 10 <= 255  # the shift stayed uniform (no clamp)
    df = spark.createDataFrame(
        [(1, _ppm_bytes(2, 3, base)), (2, _ppm_bytes(2, 3, shifted))],
        "id long, payload binary",
    )
    got = {r.id: r.phash for r in ahash_ppm(df, "id", "payload").collect()}
    assert got[1] == got[2], got


def test_ahash_rejects_malformed(spark):
    from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
        ahash_ppm,
    )

    df = spark.createDataFrame(
        [(1, b"P5\n2 2\n255\n" + b"x" * 12)], "id long, payload binary"
    )
    with pytest.raises(Exception, match="P6|PPM"):
        ahash_ppm(df, "id", "payload").collect()


def test_phash_components_merges_within_radius_and_chains(spark):
    from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
        phash_components,
    )

    # 0b0 -- 0b111 (d=3: merged) -- 0b1111 (d=1 from 0b111: chains in,
    # even though d=4 from 0b0); 0xF0F0 is isolated (d > 3 from all).
    hashes = spark.createDataFrame(
        [(0,), (0b111,), (0b1111,), (0xF0F0,)], "phash int"
    )
    comp = {
        r["phash"]: r["component"]
        for r in phash_components(hashes, bits=16, radius=3).collect()
    }
    assert comp[0] == comp[0b111] == comp[0b1111] == 0
    assert comp[0xF0F0] == 0xF0F0


def test_phash_components_rejects_lossy_band_geometry(spark):
    import pytest

    from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
        phash_components,
    )

    hashes = spark.createDataFrame([(0,)], "phash int")
    with pytest.raises(ValueError):
        phash_components(hashes, bits=16, radius=4, bands=4)
    with pytest.raises(ValueError):
        phash_components(hashes, bits=16, radius=2, bands=5)


def test_wav_codec_roundtrip_and_validation():
    from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
        parse_wav,
        wav_payload_bytes,
    )

    pcm = bytes(range(0, 200, 7))
    p = wav_payload_bytes(pcm, sample_rate=8000)
    # canonical WAVE form: 44-byte header, declared sizes match
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE" and len(p) == 44 + len(pcm)
    rate, got = parse_wav(p)
    assert (rate, got) == (8000, pcm)

    import pytest

    with pytest.raises(ValueError):
        parse_wav(b"RIFX" + p[4:])  # bad magic
    with pytest.raises(ValueError):
        parse_wav(p[:40])  # truncated header
    bad_bits = bytearray(p)
    bad_bits[34] = 16  # declare 16-bit samples
    with pytest.raises(ValueError):
        parse_wav(bytes(bad_bits))
    short_data = p[:-3]  # declared n, missing bytes
    with pytest.raises(ValueError):
        parse_wav(short_data)
    with pytest.raises(ValueError):
        parse_wav(p + b"JUNK")  # trailing bytes after the data chunk

    # RIFF word alignment: an odd-sized data chunk may carry exactly
    # one zero pad byte (standard encoders emit it) -- accepted; a
    # non-zero trailer or a pad on an EVEN chunk stays rejected.
    odd = bytes(range(101))
    p_odd = wav_payload_bytes(odd)
    assert parse_wav(p_odd) == (8000, odd)          # unpadded odd ok
    assert parse_wav(p_odd + b"\x00") == (8000, odd)  # padded odd ok
    with pytest.raises(ValueError):
        parse_wav(p_odd + b"\x01")  # non-zero trailer
    even = bytes(range(100))
    p_even = wav_payload_bytes(even)
    with pytest.raises(ValueError):
        parse_wav(p_even + b"\x00")  # pad byte on an even-sized chunk


def test_audio_features_hand_computed(spark):
    from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
        audio_features,
        wav_payload,
    )

    # n=7, text 'abc' -> pcm = 'abcaudi' (rpad with cyclic 'audio')
    df = spark.createDataFrame([(1, "abc", 7)], "doc_id long, text string, n int")
    payloads = wav_payload(df, "doc_id", "n", "text")
    row = audio_features(payloads, "id", "payload").collect()[0]
    pcm = b"abcaudi"
    assert row["n_samples"] == 7 and row["sample_rate"] == 8000
    assert row["peak_amp"] == max(pcm)
    assert row["mean_amp"] == sum(pcm) / 7


def test_frame_signatures_and_scene_change_hand_computed(spark):
    from pyspark.sql import functions as F

    from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
        frame_signatures,
    )

    # 3 frames of 4 bytes: [1,1,1,1], [1,1,1,1], [100,100,100,100]
    payload = bytearray([1] * 8 + [100] * 4)
    df = spark.createDataFrame([(7, payload)], "doc_id long, stream binary")
    sigs = frame_signatures(df, "doc_id", "stream", every_n_bytes=4)
    rows = {r["frame_idx"]: r["sig"] for r in sigs.collect()}
    assert rows == {0: 4, 1: 4, 2: 400}
    # the cut is frame 1 -> 2 only
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("frame_idx")
    cuts = (
        sigs.withColumn("delta", F.abs(F.col("sig") - F.lag("sig").over(w)))
        .filter(F.col("delta") > 200)
        .collect()
    )
    assert [(r["frame_idx"], r["delta"]) for r in cuts] == [(2, 396)]


def test_frame_signatures_tail_frame_is_partial(spark):
    from weighted_raster_overlay_service_toolbox_spark.operators.multimodal import (
        frame_signatures,
    )

    df = spark.createDataFrame(
        [(1, bytearray([10] * 5))], "doc_id long, stream binary"
    )
    rows = {r["frame_idx"]: r["sig"]
            for r in frame_signatures(df, "doc_id", "stream", 4).collect()}
    assert rows == {0: 40, 1: 10}
