"""Self-check every declared duckdb-oracle query against DuckDB at sf0.01 --
a local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from weighted_raster_overlay_service_toolbox_spark.queries import ORACLES, QUERIES

from .conftest import SF_ORACLE
from .parity import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, duck):
    problems = compare(spark, duck, QUERIES[name], ORACLES[name], SF_ORACLE)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_runs(spark):
    """Rows-only queries (no oracle) must at least execute and return rows."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_ORACLE)
        assert df.count() >= 0, name
