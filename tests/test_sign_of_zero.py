"""Sign-of-zero fidelity gate + the round-7 regression it closes.

Round 7's only driver-red row (q_collocations, CORRECTNESS_r07) was not a
wrong answer: at sf0.01 the bigram ('order','spark') has raw PMI
-3.87e-06; DuckDB's ROUND on DOUBLE is ``round(x*1e4)/1e4`` and PRESERVES
the sign bit (emits -0.0, bit pattern 0x8000000000000000), while Spark's
``F.round`` went through BigDecimal (no signed zero, emits +0.0). The
driver's value hash distinguishes the sign bit; the local replica could
not, because ``_norm_cell`` folded -0.0 onto +0.0. Three structural fixes,
all pinned here:

1. ``_norm_cell`` now canonicalizes -0.0 DIFFERENTLY from +0.0 (carrying
   the sign bit explicitly -- Python tuple ``==`` equates the two floats,
   so the float value alone cannot).
2. The q_collocations convention: ``+ 0.0`` after the rounding on BOTH
   sides folds any -0.0 to +0.0 (IEEE: -0.0 + 0.0 = +0.0, x + 0.0 = x
   otherwise). q_udf_grouped_map (z-scores, the other -0.0 emitter the
   registry sweep found) adopted the same fold.
3. A registry-wide sweep: no oracle may emit a negative-zero float cell
   at the driver's grading SF. Together with the duck_round mirror
   (tests/test_rounding_exact.py) making Spark's rounding bit-equal to
   DuckDB's -- INCLUDING on the sign of zero -- this pins the class:
   an asymmetric zero can no longer exist on either side.
"""

from __future__ import annotations

import pytest

from weighted_raster_overlay_service_toolbox_spark.queries import ORACLES

from .parity import _norm_cell
from .rounding_audit import negzero_cells

#: q_collocations' oracle tail exactly as shipped in round 7 (no + 0.0
#: fold). Kept verbatim so the gate provably fails on the bug it closes.
_R7_COLLOCATIONS_ORACLE = """
    WITH tk AS (
        SELECT string_split(text, ' ') AS t FROM documents
    ),
    uni AS (SELECT unnest(t) AS w FROM tk),
    ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    nu AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM uni),
    big AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM tk CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(t))) AS i
        ) ix(i)
    ),
    bcnt AS (SELECT w1, w2, COUNT(*) AS cxy FROM big GROUP BY w1, w2),
    nb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM big)
    SELECT b.w1, b.w2, b.cxy,
           CAST(ROUND(ln((CAST(b.cxy AS DOUBLE) / nb.n)
                    / ((c1.c / nu.n) * (c2.c / nu.n))), 4) AS DOUBLE) AS pmi
    FROM bcnt b
    CROSS JOIN nb CROSS JOIN nu
    JOIN ucnt c1 ON c1.w = b.w1
    JOIN ucnt c2 ON c2.w = b.w2
    WHERE b.cxy >= 10
"""


def test_norm_cell_distinguishes_negative_zero():
    """-0.0 and +0.0 hash differently in the driver; the canonical form
    must differ too. Python ``(-0.0,) == (0.0,)`` is True, so this needs
    the explicit sign tag, not just un-folding."""
    assert _norm_cell(-0.0) != _norm_cell(0.0)
    assert _norm_cell(-0.0) == _norm_cell(-0.0)
    assert _norm_cell(0.0) == _norm_cell(0.0)
    # regular floats unaffected
    assert _norm_cell(-1.5) == _norm_cell(-1.5)
    assert _norm_cell(-1.5) != _norm_cell(1.5)


def test_sweep_catches_r7_collocations_oracle(duck):
    """Fails-before evidence: the round-7 oracle (no fold) emits a -0.0
    cell at the driver's grading SF; the shipped oracle emits none."""
    assert negzero_cells(duck, _R7_COLLOCATIONS_ORACLE), (
        "the r7 collocations oracle should emit -0.0 at sf0.01 -- if the "
        "fixture changed, this regression anchor needs a new known-bad case"
    )
    assert not negzero_cells(duck, ORACLES["q_collocations"])


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_no_negative_zero_oracle_cells(name, duck):
    """Registry-wide: no oracle emits an IEEE negative-zero float cell at
    the driver's grading SF. Spark symmetry is covered by parity: the
    duck_round mirror reproduces DuckDB's -0.0 exactly, and the
    sign-exact ``_norm_cell`` makes any one-sided zero a parity failure."""
    hits = negzero_cells(duck, ORACLES[name])
    assert not hits, (
        f"{name} emits negative-zero cells {hits[:5]} -- fold with + 0.0 "
        "on BOTH sides (the q_collocations convention)"
    )
