"""Local replica of the driver's correctness gate.

Runs a declared Spark query and its DuckDB oracle on the same sf directory
and compares row count, column names, and order-insensitive values. Used by
``test_oracle_parity.py`` so every declared query is self-checked before the
driver sees it.
"""

from __future__ import annotations

import math
from datetime import datetime


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison.

    Non-scalar cells (list/dict/bytes) are REJECTED, not canonicalized:
    the external driver's pandas ``sort_values`` canonicalizer raises
    ``TypeError: unhashable type`` on them (CORRECTNESS_r04 regression),
    so any oracle-backed query emitting one must serialize it
    (``array_join`` / ``to_json``) before the driver ever sees it."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact float compare -- the driver hashes values, so we must too
        # (negative zero normalized: repr differs, value does not)
        return v + 0.0 if v == 0.0 else v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple, dict, set, bytes, bytearray)):
        raise TypeError(
            f"non-scalar cell {type(v).__name__} is driver-incompatible; "
            "serialize with array_join/to_json in the query output"
        )
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]):
    """Column-name-sorted, order-insensitive canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(canon, key=repr)


def compare(
    spark, duck, fn, sql: str, sf_dir: str, timings: dict | None = None
) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity).

    When ``timings`` is given, records ``spark_sec`` (plan + execute +
    collect) and ``oracle_sec`` (DuckDB replay) into it -- the two are
    wildly different animals (some oracles are deliberately naive, e.g.
    the quadratic interval-join replay), so a combined number would
    misread as engine cost."""
    import time as _time

    t0 = _time.time()
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if timings is not None:
        timings["spark_sec"] = round(_time.time() - t0, 2)

    t0 = _time.time()
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    if timings is not None:
        timings["oracle_sec"] = round(_time.time() - t0, 2)

    problems: list[str] = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duck={len(drows)}")
    s_canon = _sorted_rows(scols, srows)
    d_canon = _sorted_rows(dcols, drows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ]
        problems.append(
            f"values differ: {len(diffs)} aligned diffs of {len(s_canon)} rows; "
            f"first few: {diffs[:3]}"
        )
    return problems
