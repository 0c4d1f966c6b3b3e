#!/usr/bin/env python
"""Full-registry correctness sweep -> PARITY_FULL.json.

The external driver grades only the first 50 registry entries, and the
repo itself curates that window (queries/__init__.py) -- so a driver-green
round must not be read as whole-registry assurance. This script closes
that gap: it runs EVERY registered query -- all oracle-backed ones
side-by-side against DuckDB with the driver-replica compare
(tests/parity.py: column-name-sorted, order-insensitive, non-scalar cells
rejected), and every rows-only query for execution -- and writes one
summary JSON the judge can read next to CORRECTNESS_r{N}.json.

Usage: python parity_all.py   (env: SPARK_GRAFT_PARITY_SF_DIR, default
/root/testdata/sf0.01 -- the same scale factor the driver grades at;
SPARK_GRAFT_PARITY_THREADS, default 4 -- batch queries run in a thread
pool against the one shared SparkSession with per-thread DuckDB
connections, while the q_stream_* family stays SEQUENTIAL: streaming
queries own session-level machinery -- fixed scratch sinks, stream
staging, a state-store provider conf window -- that a racing twin could
corrupt; everything else is a pure read of the fixture tables. ~2.5x
wall-clock cut at equal coverage, VERDICT r10 #7.)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb

    from tests.parity import compare
    from weighted_raster_overlay_service_toolbox_spark.queries import (
        ORACLES,
        QUERIES,
    )
    from weighted_raster_overlay_service_toolbox_spark.session import get_spark

    import threading
    from concurrent.futures import ThreadPoolExecutor

    spark = get_spark("parity-all", cpus=int(os.environ.get("TEST_CPUS", "8")))
    n_threads = int(os.environ.get("SPARK_GRAFT_PARITY_THREADS", "4"))
    _local = threading.local()

    def _duck():
        # DuckDB connections are not thread-safe; one per worker thread,
        # each with the same fixture views.
        con = getattr(_local, "con", None)
        if con is None:
            con = duckdb.connect()
            for name in (
                "region nation customer supplier part orders lineitem "
                "events documents embeddings".split()
            ):
                con.execute(
                    f"CREATE VIEW {name} AS"
                    f" SELECT * FROM '{SF_DIR}/{name}.parquet'"
                )
            _local.con = con
        return con

    def run_one(name: str) -> dict:
        fn = QUERIES[name]
        entry: dict = {}
        tq = time.time()
        try:
            if name in ORACLES:
                tm: dict = {}
                problems = compare(
                    spark, _duck(), fn, ORACLES[name], SF_DIR, timings=tm
                )
                entry["mode"] = "oracle"
                entry["ok"] = not problems
                entry.update(tm)
                if problems:
                    entry["problems"] = problems
            else:
                n = fn(spark, SF_DIR).count()
                entry["mode"] = "rows_only"
                entry["ok"] = n >= 0
                entry["rows"] = n
                entry["spark_sec"] = round(time.time() - tq, 2)
        except Exception:
            entry["ok"] = False
            entry["error"] = traceback.format_exc(limit=3)
            entry.setdefault("spark_sec", round(time.time() - tq, 2))
        # Full-registry SPARK-side wall clock (plan + execute + collect):
        # even never-benched queries leave a trace -- a scale-killer in
        # the unbenched tail shows up as an outlier here. oracle_sec is
        # reported separately: several oracles are deliberately naive
        # replays (e.g. the quadratic interval-join SQL) and would
        # otherwise masquerade as engine cost.
        return entry

    # Host-drift sentinel INSIDE the artifact (VERDICT r12 #9): min-of-5
    # of the bench sentinel (q_join_inner, code unchanged since r1)
    # through the same noop sink, measured before the sweep. Cross-round
    # sweep wall-clocks should be read as (elapsed_new / elapsed_old) /
    # (sentinel_new / sentinel_old) without cross-referencing PLANS.md
    # prose.
    sentinel_name = "q_join_inner"
    sentinel_best = float("inf")
    # warm the JVM/codegen/footer caches first (the bench.py discipline)
    # so the sentinel measures steady-state host speed, not startup
    QUERIES["q_agg_group"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    for _ in range(5):
        ts = time.perf_counter()
        QUERIES[sentinel_name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        sentinel_best = min(sentinel_best, time.perf_counter() - ts)

    t0 = time.time()
    results: dict[str, dict] = {}
    batch_names = [n for n in QUERIES if not n.startswith("q_stream")]
    stream_names = [n for n in QUERIES if n.startswith("q_stream")]
    if n_threads > 1:
        with ThreadPoolExecutor(max_workers=n_threads) as pool:
            for name, entry in zip(
                batch_names, pool.map(run_one, batch_names)
            ):
                results[name] = entry
    else:
        for name in batch_names:
            results[name] = run_one(name)
    # streaming family: sequential by design (shared scratch sinks,
    # staged-source reuse, the RocksDB provider conf window)
    for name in stream_names:
        results[name] = run_one(name)
    # restore registry order for the report
    results = {n: results[n] for n in QUERIES}

    oracle = [n for n in results if results[n].get("mode") == "oracle"]
    rows_only = [n for n in results if results[n].get("mode") == "rows_only"]
    failed = sorted(n for n, e in results.items() if not e["ok"])
    summary = {
        "sf_dir": SF_DIR,
        "total_queries": len(results),
        "oracle_backed": len(oracle),
        "oracle_pass": sum(results[n]["ok"] for n in oracle),
        "rows_only": len(rows_only),
        "rows_only_pass": sum(results[n]["ok"] for n in rows_only),
        "failed": failed,
        "elapsed_sec": round(time.time() - t0, 1),
        "sentinel_query": sentinel_name,
        "sentinel_sec": round(sentinel_best, 3),
        "slowest_20_spark": sorted(
            ((n, e.get("spark_sec", 0.0)) for n, e in results.items()),
            key=lambda kv: -kv[1],
        )[:20],
        "driver_window_first_50": list(QUERIES)[:50],
        "per_query": {
            n: (
                e
                if not e["ok"]
                else {
                    k: v
                    for k, v in e.items()
                    if k in ("spark_sec", "oracle_sec")
                }
            )
            for n, e in results.items()
        },
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PARITY_FULL.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=False)
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("per_query", "driver_window_first_50")}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
