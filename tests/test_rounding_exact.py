"""Cross-engine rounding exactness: the duck_round mirror + knife-edge audit.

Closes the class behind round 7's q_collocations red row at its root (see
functions/rounding.py for the full derivation): Spark's ``F.round`` on
DOUBLE (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB's
``ROUND`` (``std::round(x * 10^n) / 10^n``) are different functions near
.5 boundaries -- an adversarial battery shows ~2% divergence in the
boundary neighborhood. Every rounded-double output column was green only
because no fixture value had yet landed in the divergence zone (closest
measured approach: q_tpch_q9's DECIMAL tie aside, q_cosine_topk at 9e-11).

Pinned here:

1. ``duck_round`` (Spark) and ``duck_round_np`` (pandas paths) are
   BIT-EQUAL to DuckDB ROUND on an adversarial boundary battery, signed
   zeros and specials included -- so given the same input double the
   engines cannot disagree, at any SF, ever.
2. Fails-before: ``F.round`` diverges on a pinned known-bad case.
3. Source gate: no package ``F.round`` call remains on a non-DECIMAL
   argument (DECIMAL rounding is exact integer arithmetic with a shared
   tie rule in both engines -- the one case where F.round is safe).
4. Knife-edge audit: every oracle's ROUND rewritten to error() when a
   FLOAT/DOUBLE argument sits within margin of a .5 boundary at the
   driver's grading SF. Queries that do trip the margin must be in the
   explained allowlist (deterministic raw value + mirrored rounding =
   cannot flip); anything new near a boundary surfaces here and needs
   the same argument or a hardened convention.
"""

from __future__ import annotations

import math
import pathlib
import re

import numpy as np
import pytest

from weighted_raster_overlay_service_toolbox_spark.functions.rounding import (
    duck_round,
    duck_round_np,
)
from weighted_raster_overlay_service_toolbox_spark.queries import ORACLES

from .rounding_audit import knife_edge_sql

#: F.round-vs-DuckDB divergence case measured in the r8 battery: DuckDB's
#: double product -399667430.5 rounds away (-3996674.31); Spark's exact
#: decimal view of the same double (...3049999997) rounds toward zero.
_KNOWN_BAD = (-3996674.3049999997, 2, -3996674.31)


def _battery():
    """Adversarial doubles: ulp-neighborhoods of (k + 0.5) / 10^n ties,
    plus uniform fill and IEEE specials. Deterministic seed."""
    rng = np.random.default_rng(7)
    cases: list[tuple[float, int]] = []
    for n in (0, 2, 4, 6):
        p = 10.0**n
        for _ in range(700):
            k = int(rng.integers(-(10**9), 10**9))
            t = (k + 0.5) / p
            for delta in (-2, -1, 0, 1, 2):
                x = t + math.ulp(t) * delta if delta >= 0 else t - math.ulp(t) * (-delta)
                cases.append((x, n))
        for _ in range(300):
            cases.append((float(rng.uniform(-1e6, 1e6)), n))
        for x in (0.0, -0.0, float("nan"), float("inf"), float("-inf"),
                  -3.872623565199456e-06, 2.0**53, -(2.0**53) * 1.5,
                  1e300, -1e300, 0.49999999999999994, -0.49999999999999994):
            cases.append((x, n))
    return cases


def _neq(d, s) -> bool:
    if isinstance(d, float) and isinstance(s, float):
        if math.isnan(d) and math.isnan(s):
            return False
        if d != s:
            return True
        return d == 0.0 and math.copysign(1, d) != math.copysign(1, s)
    return d != s


@pytest.fixture(scope="module")
def battery_duck(duck):
    """DuckDB's ROUND over the battery, via a temp table (ground truth)."""
    cases = _battery()
    duck.execute("CREATE OR REPLACE TABLE _round_battery(i BIGINT, x DOUBLE, n INTEGER)")
    duck.executemany(
        "INSERT INTO _round_battery VALUES (?, ?, ?)",
        [(i, x, n) for i, (x, n) in enumerate(cases)],
    )
    vals = [
        v
        for _, v in duck.execute(
            "SELECT i, ROUND(x, n) FROM _round_battery ORDER BY i"
        ).fetchall()
    ]
    duck.execute("DROP TABLE _round_battery")
    return cases, vals


def test_duck_round_bit_equals_duckdb(spark, battery_duck):
    """The Spark mirror is bit-identical to DuckDB ROUND on the full
    adversarial battery (sign of zero included)."""
    cases, duck_vals = battery_duck
    sdf = spark.createDataFrame(
        [(i, x, n) for i, (x, n) in enumerate(cases)], "i long, x double, n int"
    )
    from pyspark.sql import functions as F

    out = {}
    for n in (0, 2, 4, 6):
        for r in (
            sdf.filter(F.col("n") == n)
            .select("i", duck_round(F.col("x"), n).alias("r"))
            .collect()
        ):
            out[r["i"]] = r["r"]
    bad = [
        (cases[i], d, out[i]) for i, d in enumerate(duck_vals) if _neq(d, out[i])
    ]
    assert not bad, f"{len(bad)} divergences, first: {bad[:3]}"


def test_duck_round_np_bit_equals_duckdb(battery_duck):
    """The numpy mirror (pandas-UDF paths) matches DuckDB the same way."""
    cases, duck_vals = battery_duck
    bad = []
    for (x, n), d in zip(cases, duck_vals):
        s = float(duck_round_np(np.array([x]), n)[0])
        if _neq(d, s):
            bad.append(((x, n), d, s))
    assert not bad, f"{len(bad)} divergences, first: {bad[:3]}"


def test_f_round_diverges_on_known_bad(spark):
    """Fails-before evidence: the BigDecimal path really is a different
    function (why F.round is banned on double outputs)."""
    from pyspark.sql import functions as F

    x, n, duck_result = _KNOWN_BAD
    row = (
        spark.range(1)
        .select(
            F.round(F.lit(x), n).alias("f"),
            duck_round(F.lit(x), n).alias("m"),
        )
        .first()
    )
    assert row["m"] == duck_result
    assert row["f"] != duck_result, (
        "F.round now matches DuckDB on the pinned case -- if Spark changed "
        "its rounding path, re-run the full battery before relaxing this"
    )


#: Remaining F.round call sites must round DECIMAL expressions (exact in
#: both engines). The textual signal: the argument chain carries a decimal
#: cast, or the call is one of the two registry.py decimal helpers.
_DECIMAL_MARKERS = ("decimal(18,4)", "decimal(12,2)", "F.sum(c)", "F.sum(c.cast(DEC))",
                    "F.sum(charge)", 'F.sum("amount")', 'F.sum("sv")')


def test_no_fragile_f_round_sites_in_package():
    """Source gate: every surviving ``F.round(`` in package code sits on a
    decimal-typed argument. New double-rounding must use duck_round."""
    pkg = pathlib.Path(__file__).resolve().parents[1] / (
        "weighted_raster_overlay_service_toolbox_spark"
    )
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        lines = py.read_text().splitlines()
        for ln_no, line in enumerate(lines, 1):
            if "F.round(" not in line or line.strip().startswith("#"):
                continue
            # multi-line calls: the decimal cast may sit on a continuation
            window = "\n".join(lines[ln_no - 1 : ln_no + 3])
            if not any(mk in window for mk in _DECIMAL_MARKERS):
                offenders.append(f"{py.relative_to(pkg)}:{ln_no}: {line.strip()}")
    assert not offenders, (
        "F.round on a non-decimal argument diverges from DuckDB ROUND near "
        ".5 boundaries; use functions.rounding.duck_round:\n"
        + "\n".join(offenders)
    )


#: Queries allowed to trip the knife-edge margin: each has a deterministic
#: raw value (exact integer ratios, stored parquet doubles, sequential-fold
#: dots, or exact int64 sums) AND mirrored rounding on the Spark side, so
#: both engines compute the identical double and round it identically --
#: boundary proximity cannot flip the hash. Union over sf0.001/0.01/0.1
#: as measured in r8.
_KNIFE_EXPLAINED = {
    "q_lang_id",            # marker-hit ratios: exact small-int division
    "q_text_quality",       # char/token ratios: exact small-int division
    "q_bpe_apply",          # sum(pieces)/count: exact small-int division
    "q_stream_bpe_apply",   # same oracle + same exact division streamside
    "q_repetition_ratio",   # max(c)/sum(c): exact small-int division
    "q_ngram_jaccard",      # intersection/union counts: exact division
    "q_contamination",      # hit-count ratio: exact division
    "q_unigram_logprob",    # avg of exact int64 lp6 quantities
    "q_logprob_strata",     # same lp6 path (exact int64 sums)
    "q_math_funcs",         # per-row sqrt/ln of stored values (no aggregation)
    "q_kmeans",             # 1e6-quantize of stored parquet doubles
    "q_semantic_dedup",     # same quantize + sequential-fold pair dots
    "q_cosine_topk",        # sequential-fold dots (bit-match list_dot_product)
    "q_ann_recall",         # same fold (trips at sf0.1 only; sims are
                            # bit-identical cross-engine, so the rank --
                            # and hence the recall sets -- cannot flip)
}


@pytest.mark.parametrize(
    "name", sorted(n for n, sql in ORACLES.items() if re.search(r"\bROUND\s*\(", sql, re.I))
)
def test_knife_edge_margin(name, duck):
    """Boundary-distance audit at the driver's grading SF: a FLOAT/DOUBLE
    ROUND argument within 1e-6 (scaled) of a .5 boundary errors out unless
    the query is in the explained set."""
    try:
        duck.execute(knife_edge_sql(ORACLES[name])).fetchall()
    except Exception as exc:  # noqa: BLE001 -- duckdb error carries marker
        if "knife-edge" not in str(exc):
            raise
        assert name in _KNIFE_EXPLAINED, (
            f"{name} has a rounded double within 1e-6 of a .5 boundary and "
            "no documented cannot-flip argument -- either add it to "
            "_KNIFE_EXPLAINED with the reason, or harden the convention "
            "(more dp / integer output)"
        )
