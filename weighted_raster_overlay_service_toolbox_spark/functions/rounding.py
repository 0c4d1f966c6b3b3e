"""Cross-engine-exact double rounding.

Round 8's registry-wide knife-edge audit (tests/rounding_audit.py) found
that Spark's ``F.round`` on DOUBLE and DuckDB's ``ROUND`` on DOUBLE are
DIFFERENT FUNCTIONS near .5 boundaries, even on a bit-identical input:

- DuckDB computes ``std::round(x * 10^n) / 10^n`` -- one double multiply
  (round-to-nearest), then half-away-from-zero on the PRODUCT.
- Spark converts the double to BigDecimal via its shortest decimal
  representation (``BigDecimal.valueOf`` / ``Double.toString``) and applies
  HALF_UP at digit ``n`` of the EXACT decimal value -- no multiply, so no
  product-rounding step.

When the double product lands on (or crosses) a ``k + 0.5`` boundary that
the exact decimal value sits strictly beside, the two disagree by one
quantum. An adversarial battery of 66,000 boundary-neighborhood doubles
showed 1,316 divergences (2%) at dp in {2, 4, 6} -- e.g.
``x = -3996674.3049999997, dp=2``: DuckDB -3996674.31, Spark -3996674.3.
Every rounded-double oracle column in the registry was therefore green
only because no FIXTURE value happened to land in the divergence zone
(the round-7 judge measured the closest approach at 4.3e-04; this sweep
found q_tpch_q9 at 3.7e-09 -- two ULPs of summation drift from a flip).

``duck_round`` removes the class structurally: it reproduces DuckDB's
computation step-for-step in Spark SQL expressions, so given the same
input double the two engines CANNOT disagree, at any scale factor, ever.
The battery regression (tests/test_rounding_exact.py) pins bit-equality
on all 66k adversarial cases, where F.round fails ~2%.

Construction notes (each step matches the DuckDB C++ path bit-for-bit):

- ``y = x * 10^n`` uses the same IEEE double multiply both engines run
  (10^n is exact in double for the dp range we use, n <= 15).
- ``std::round`` is half-away-from-zero decided on the TRUE value of
  ``y`` -- NOT ``floor(y + 0.5)``, which double-rounds (e.g.
  ``y = 0.49999999999999994``: ``y + 0.5`` rounds up to 1.0, but
  ``std::round(y) == 0``). We instead compare the exact fraction:
  for ``|y| < 2^52``, ``frac = |y| - floor(|y|)`` is EXACT by the
  Sterbenz lemma, so ``frac >= 0.5`` is the true tie test.
- ``|y| >= 2^52`` means y is already integral: return ``y / 10^n``
  unchanged (also covers +/-Inf); NaN passes through like DuckDB.
- Sign handling preserves IEEE negative zero exactly as std::round does
  (``round(-0.03) == -0.0``): the ``y < 0`` branch negates the magnitude,
  and a zero magnitude negates to -0.0. Registry outputs that can cross
  zero therefore still need the ``+ 0.0`` fold ON BOTH SIDES (the
  q_collocations convention) -- this module makes the engines bit-equal,
  including on the sign of zero; the fold is what makes the shared result
  +0.0 rather than an engine-dependent one.

DECIMAL-typed rounding (the ``.cast("decimal(18,4)")`` sum convention) is
NOT routed through here: decimal ROUND is exact integer arithmetic with
the same half-away tie rule in both engines, so it has no divergence zone.
1-arg ROUND (dp=0) on doubles is also exact cross-engine (no product is
computed: the .5 boundaries at integers are exactly representable, so the
shortest-repr path and std::round order identically) -- verified in the
same battery -- but call sites may still pass ``n=0`` here for uniformity.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Above this magnitude every double is an integer (2^52); matches the
#: implicit no-op region of std::round.
_INTEGRAL_BOUND = float(2**52)


def duck_round(col: Column | str, n: int = 0) -> Column:
    """Round a DOUBLE column exactly as DuckDB's ``ROUND(x, n)`` does.

    Bit-exact mirror of ``std::round(x * 10^n) / 10^n`` (see module
    docstring). Returns DOUBLE. Use this -- never ``F.round`` -- for any
    floating-point column that an oracle rounds with DuckDB ``ROUND``.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    p = F.lit(float(10**n))
    y = c * p
    ay = F.abs(y)
    fl = F.floor(ay).cast("double")
    # Sterbenz-exact fraction for |y| < 2^52; the tie test is therefore
    # the true std::round decision, not a double-rounded approximation.
    mag = F.when(ay - fl >= F.lit(0.5), fl + F.lit(1.0)).otherwise(fl)
    rounded = F.when(y < 0, -mag).otherwise(
        # y == +/-0.0 and y == NaN both keep y itself (std::round
        # preserves signed zero; NaN propagates).
        F.when(y == 0, y).otherwise(mag)
    )
    return (
        F.when(F.isnan(y) | (ay >= F.lit(_INTEGRAL_BOUND)), y)
        .otherwise(rounded)
        / p
    )


def duck_round_np(x: "np.ndarray", n: int = 0) -> "np.ndarray":
    """Vectorized numpy mirror of DuckDB ``ROUND(x, n)`` on doubles.

    For Pandas-UDF / Arrow paths that must round identically to a DuckDB
    oracle: ``numpy.round`` / ``Series.round`` are HALF-EVEN with their own
    scaled arithmetic, so they sit in the same divergence zone as
    ``F.round`` (just on different inputs). Same construction as
    ``duck_round`` -- one IEEE multiply, Sterbenz-exact fraction, tie away
    from zero -- so given bit-identical input the result is bit-identical
    to DuckDB's, including the sign of zero. Fold with ``+ 0.0`` at the
    call site when the output convention requires -0.0-free cells.
    """
    x = np.asarray(x, dtype=np.float64)
    p = float(10**n)
    with np.errstate(invalid="ignore"):  # NaN/Inf flow to the passthrough
        y = x * p
        ay = np.abs(y)
        fl = np.floor(ay)
        mag = np.where(ay - fl >= 0.5, fl + 1.0, fl)
        signed = np.where(y < 0, -mag, np.where(y == 0, y, mag))
        out = np.where(np.isnan(y) | (ay >= _INTEGRAL_BOUND), y, signed) / p
    return out
