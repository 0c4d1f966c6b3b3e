"""Property-based tests for the RFC-4180 codec (SURVEY.md section 5.4):
the reference's own oracle is stdlib ``csv`` (``WROS/Weighted Raster
Overlay Service.pyt:22, 1332``), so encode must round-trip through
``csv.reader`` and agree with ``csv`` module encoding semantics."""

from __future__ import annotations

import csv
import io

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from weighted_raster_overlay_service_toolbox_spark.functions.csvcodec import (
    csv_encode_py,
    encode_field_py,
)

# values the reference actually encodes: labels/numbers, no embedded
# newlines (single-line TEXT columns), already-stripped or strippable.
field = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Zs"), blacklist_characters="\r\n"
    ),
    max_size=30,
)


@given(st.lists(field, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_roundtrip_through_csv_reader(values):
    """encode -> csv.reader decodes to the stripped originals
    (the reference strips each value before encoding, .pyt:1317)."""
    line = csv_encode_py(values)
    expected = [v.strip() for v in values]
    if line == "":
        # a single all-whitespace field encodes to an empty line, which
        # csv.reader reads as zero fields -- the reference's own behavior
        # (.pyt:1317 strips, then joins); nothing to round-trip.
        assert expected == [""]
        return
    decoded = next(csv.reader(io.StringIO(line)))
    assert decoded == expected


@given(st.lists(field, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_matches_stdlib_writer(values):
    """Field-level agreement with csv.writer QUOTE_MINIMAL on the
    pre-stripped values (modulo the writer also quoting bare spaces --
    it does not, so outputs are directly comparable)."""
    stripped = [v.strip() for v in values]
    # csv.writer quotes a lone empty field ('""') to distinguish it from an
    # empty row; the reference writes it bare (.pyt:1311-1313) -- exclude
    # that one known divergence.
    assume(not (len(stripped) == 1 and stripped[0] == ""))
    buf = io.StringIO()
    csv.writer(buf, lineterminator="").writerow(stripped)
    assert csv_encode_py(values) == buf.getvalue()


def test_none_becomes_empty():
    assert encode_field_py(None) == ""
    assert csv_encode_py([None, "a", None]) == ",a,"


def test_quote_and_comma():
    assert encode_field_py('say "hi"') == '"say ""hi"""'
    assert encode_field_py("a,b") == '"a,b"'
    assert csv_encode_py(["x", "a,b", 'q"']) == 'x,"a,b","q"""'


def test_spark_expr_matches_python(spark):
    """The column-expression encoder and the Python mirror agree."""
    from pyspark.sql import functions as F

    from weighted_raster_overlay_service_toolbox_spark.functions.csvcodec import (
        csv_encode,
    )

    rows = [
        ("plain", "with,comma", 'with"quote'),
        ("  padded  ", "", "x"),
        (None, "a", "b"),
    ]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = [
        r["line"]
        for r in df.select(
            csv_encode(F.col("a"), F.col("b"), F.col("c")).alias("line")
        ).collect()
    ]
    want = [csv_encode_py(list(r)) for r in rows]
    assert got == want


def test_csv_decode_roundtrip(spark):
    """csv_decode (from_csv at the compat boundary, .pyt:1328-1332)
    inverts csv_encode including quoted commas and doubled quotes."""
    from pyspark.sql import functions as F

    from weighted_raster_overlay_service_toolbox_spark.functions.csvcodec import (
        csv_decode,
        csv_encode,
    )

    rows = [("plain", "with,comma", 'say "hi"')]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    encoded = df.select(
        csv_encode(F.col("a"), F.col("b"), F.col("c")).alias("line")
    )
    decoded = encoded.select(csv_decode(F.col("line"), 3).alias("d")).first()["d"]
    assert (decoded["f0"], decoded["f1"], decoded["f2"]) == rows[0]
