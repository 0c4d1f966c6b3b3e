"""Registry-wide oracle OUTPUT-TYPE gate + the round-6 regression it closes.

Round 6's only driver-red row (q_funnel_ordered, CORRECTNESS_r06) was not a
wrong answer: an un-cast ``SUM(CASE...)`` oracle typed HUGEINT, the driver's
pandas canonicalizer coerced it to float64 (``150.0``), and the value hash
diverged from Spark's bigint ``150``. Two structural fixes, both pinned
here:

1. ``DESCRIBE`` every registered oracle and fail on any driver-toxic
   output type (HUGEINT/UHUGEINT) -- the class can never re-enter the
   registry.
2. The driver-replica compare (tests/parity.py) now canonicalizes through
   pandas WITH numeric-kind tags, so an int-vs-float divergence is a
   mismatch locally exactly as it is in the driver's hash.
"""

from __future__ import annotations

import pytest

from weighted_raster_overlay_service_toolbox_spark.queries import ORACLES

from .parity import _norm_cell, oracle_type_problems

#: q_funnel_ordered's oracle exactly as shipped in round 6 (un-cast SUM ->
#: HUGEINT). Kept verbatim so the gate provably fails on the bug it was
#: built for.
_R6_FUNNEL_ORACLE = """
    WITH c AS (
        SELECT user_id, MIN(ts) AS first_click FROM events
        WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
        SELECT user_id, MAX(ts) AS last_purchase FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COUNT(*) AS n_clickers,
           SUM(CASE WHEN p.last_purchase >= c.first_click
                    THEN 1 ELSE 0 END) AS n_converted
    FROM c LEFT JOIN p USING (user_id)
"""


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_no_driver_toxic_oracle_types(name, duck):
    """Every oracle's DESCRIBE output must be free of HUGEINT-class types."""
    problems = oracle_type_problems(duck, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_gate_catches_r6_funnel_oracle(duck):
    """The gate MUST flag the round-6 bug verbatim (fails-before passes-
    after evidence for the fix in extended.py)."""
    problems = oracle_type_problems(duck, _R6_FUNNEL_ORACLE)
    assert problems, "gate missed the known-bad HUGEINT oracle"
    assert "n_converted" in problems[0] and "HUGEINT" in problems[0]


def test_norm_cell_distinguishes_int_from_float():
    """Python ``150 == 150.0`` is True, but the driver hashes serialized
    values where they differ -- the canonical form must too."""
    assert _norm_cell(150) != _norm_cell(150.0)
    assert _norm_cell(150) == _norm_cell(150)
    assert _norm_cell(150.0) == _norm_cell(150.0)
    # bool is an int subclass; the driver serializes True, not 1
    assert _norm_cell(True) != _norm_cell(1)


def test_norm_cell_folds_midnight_datetime_onto_date():
    """duckdb .df() gives DATE back as midnight datetime64; Spark collect()
    gives datetime.date -- both must canonicalize identically."""
    from datetime import date, datetime

    import pandas as pd

    assert (
        _norm_cell(datetime(2020, 1, 1))
        == _norm_cell(date(2020, 1, 1))
        == _norm_cell(pd.Timestamp("2020-01-01"))
    )
    assert _norm_cell(datetime(2020, 1, 1, 0, 0, 1)) != _norm_cell(
        date(2020, 1, 1)
    )


def test_compare_itself_catches_r6_funnel_oracle(spark, duck):
    """End-to-end fails-before/passes-after for the COMPARE fix (not just
    the DESCRIBE gate): the driver-replica compare must flag the round-6
    oracle (HUGEINT -> float64 150.0 vs Spark bigint 150 -- values equal
    under Python ==, hashes different in the driver) and pass the fixed
    one. The old fetchall-based compare returned [] for BOTH."""
    from weighted_raster_overlay_service_toolbox_spark.queries import (
        ORACLES,
        QUERIES,
    )

    from .conftest import SF_ORACLE
    from .parity import compare

    fn = QUERIES["q_funnel_ordered"]
    assert compare(spark, duck, fn, _R6_FUNNEL_ORACLE, SF_ORACLE), (
        "pandas-faithful compare missed the known int-vs-float divergence"
    )
    assert not compare(spark, duck, fn, ORACLES["q_funnel_ordered"], SF_ORACLE)
