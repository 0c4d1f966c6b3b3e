"""Rounding knife-edge + negative-zero audit over the oracle registry.

Round 7's one driver-red row (q_collocations) was not a wrong answer: a raw
PMI of -3.87e-06 rounded to 4dp emits ``-0.0`` from DuckDB (sign-preserving
``round(x*1e4)/1e4`` on DOUBLE) and ``+0.0`` from Spark (BigDecimal round,
no signed zero), and the driver's value hash distinguishes the sign bit.
That bug is one member of a family: any raw value whose scaled form
``x * 10^dp`` sits ON or NEAR a ``.5`` rounding boundary can round
differently across engines (different summation order, different rounding
path), flipping a 4dp cell -- or, worse, a rounded THRESHOLD comparison
that gates set membership (ADVICE r7 #1).

Two sweeps, both DuckDB-only (cheap, no Spark session):

1. ``negzero_cells(duck, sql)`` -- run the oracle, scan every float cell
   for IEEE negative zero. Any hit is a guaranteed driver-hash divergence
   unless Spark bit-matches it (it can't: BigDecimal round has no -0.0),
   so the registry gate is ZERO hits.

2. ``knife_edge_sql(sql, margin)`` -- mechanically rewrite every
   ``ROUND(x, n)`` in the oracle into::

       CASE WHEN ABS(ABS(CAST((x) AS DOUBLE) * POWER(10.0, (n))) % 1.0
                  - 0.5) < margin
            THEN error('knife-edge: ...')
            ELSE ROUND(x, n) END

   and re-run it. The ELSE branch is the original expression verbatim, so
   semantics (including ROUND inside WHERE/HAVING -- the gated-threshold
   class) are preserved exactly unless a violating value exists, in which
   case DuckDB raises with our marker message. This converts "the hash
   happened to match this round" into "no fixture value is within margin
   of a boundary, so the hash CANNOT flip".

The margin is expressed at the scaled (``x * 10^dp``) level; the r7 judge
measured the registry's next-closest boundary distance at 4.3e-04, so a
1e-6 margin has ~400x headroom while still catching anything ULP-shaped.
"""

from __future__ import annotations

import math
import re

#: Distance (at x*10^dp scale) to the nearest .5 rounding boundary below
#: which a cell is declared knife-edge. Judge-measured registry floor
#: (r7, excluding the fixed -0.0 row): 4.3e-04.
KNIFE_EDGE_MARGIN = 1e-6

_ROUND_RE = re.compile(r"\bROUND\s*\(", re.IGNORECASE)


def _split_top_level_comma(s: str) -> list[str]:
    """Split an argument string on commas not nested in parens/quotes."""
    parts, depth, start, i, quote = [], 0, 0, 0, None
    while i < len(s):
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def _find_balanced(s: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at ``open_idx``."""
    depth, i, quote = 0, open_idx, None
    while i < len(s):
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parens in SQL")


def knife_edge_sql(sql: str, margin: float = KNIFE_EDGE_MARGIN) -> str:
    """Rewrite every ROUND(x, n) into a boundary-guarded equivalent.

    Innermost-first (recursion on the argument text), so nested ROUNDs are
    each guarded. One-argument ROUND(x) is treated as dp=0. Only
    FLOAT/DOUBLE arguments are guarded (``typeof`` check at runtime):
    DECIMAL rounding is exact integer arithmetic with the same
    half-away-from-zero tie rule in both engines, so an exact decimal tie
    is deterministic, not a knife-edge.
    """
    m = _ROUND_RE.search(sql)
    if m is None:
        return sql
    open_idx = sql.index("(", m.start())
    end = _find_balanced(sql, open_idx)
    args_text = sql[open_idx + 1 : end - 1]
    args = [knife_edge_sql(a, margin) for a in _split_top_level_comma(args_text)]
    x = args[0]
    n = args[1] if len(args) > 1 else "0"
    orig = f"ROUND({', '.join(args)})"
    guarded = (
        f"(CASE WHEN typeof(({x})) IN ('DOUBLE', 'FLOAT')"
        f" AND ABS(ABS(CAST(({x}) AS DOUBLE) * POWER(10.0, ({n})))"
        f" % 1.0 - 0.5) < {margin!r}"
        f" THEN error('knife-edge: ROUND arg within {margin!r} of a .5"
        f" boundary') ELSE {orig} END)"
    )
    return sql[: m.start()] + guarded + knife_edge_sql(sql[end:], margin)


def negzero_cells(duck, sql: str) -> list[str]:
    """Run the oracle; return ``col[row]`` labels of negative-zero floats."""
    pdf = duck.execute(sql).df()
    hits: list[str] = []
    for col in pdf.columns:
        if pdf[col].dtype.kind != "f":
            continue
        vals = pdf[col].to_numpy()
        for i, v in enumerate(vals):
            if v == 0.0 and not math.isnan(v) and math.copysign(1.0, v) < 0:
                hits.append(f"{col}[{i}]")
    return hits
