"""Independent-implementation cross-checks for the round-8 robust-stats
and calibration queries.

The oracle gate proves Spark == DuckDB, but both sides of q_outliers_mad
run the SAME explicit order-statistic algorithm -- a shared bug would be
invisible to parity. These tests recompute the statistics with numpy
(a third implementation with its own median) from the raw parquet and
compare. Same spirit for q_knn_graph's mutuality/symmetry invariants,
which the oracle replicates rather than independently asserts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from weighted_raster_overlay_service_toolbox_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_outliers_mad_matches_numpy(spark):
    got = {
        r["event_type"]: r
        for r in QUERIES["q_outliers_mad"](spark, SF_SMOKE).collect()
    }
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = ev[ev["value"].notna()]
    assert set(got) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        v = g["value"].to_numpy()
        med = float(np.median(v))
        dev = np.abs(v - med)
        mad = float(np.median(dev))
        row = got[et]
        assert row["n"] == len(v)
        # numpy's even-n median averages the two middle values like the
        # query's (a+b)/2 -- bit-equality is expected, not just closeness
        assert row["med"] == med, (et, row["med"], med)
        assert row["mad"] == mad, (et, row["mad"], mad)
        assert row["n_outliers"] == int((dev > 3 * mad).sum())


def test_knn_graph_edges_are_mutual_and_canonical(spark):
    edges = QUERIES["q_knn_graph"](spark, SF_SMOKE).collect()
    assert edges, "fixture should produce mutual edges"
    seen = set()
    for r in edges:
        # canonical orientation, no duplicates, sim in [-1, 1]
        assert r["vec_a"] < r["vec_b"]
        assert (r["vec_a"], r["vec_b"]) not in seen
        seen.add((r["vec_a"], r["vec_b"]))
        assert -1.0001 <= r["sim"] <= 1.0001


def test_ann_recall_bounds_and_bp(spark):
    rows = QUERIES["q_ann_recall"](spark, SF_SMOKE).collect()
    assert len(rows) == 25  # every probe reports, even at recall 0
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_bp"] == r["n_hits"] * 2000


def test_sketch_calibration_cells_are_bounded(spark):
    rows = QUERIES["q_sketch_calibration"](spark, SF_SMOKE).collect()
    assert rows
    total = 0
    for r in rows:
        assert 0 <= r["mh_matches"] <= 16
        assert 0 <= r["exact_decile"] <= 10
        assert r["n_pairs"] >= 1
        total += r["n_pairs"]
    # candidate pairs exist at the smoke SF (same LSH config as
    # q_dedup_minhash, which returns a non-empty pair set there)
    assert total > 0
