"""100 TB layout rehearsal (VERDICT r8 #5): build the SURVEY section-4
posture once for sf0.1 (sources/layout.py write_layout), then run the
SAME registry queries against flat storage and the layout, side by side.

Per query x storage: wall-clock (min-of-2, warm session), runtime
exchange count, scan count, and the pruning evidence strings
(PartitionFilters / SelectedBucketsCount) from the FINAL adaptive plan
-- plus a value-equality check, because a layout that changes answers is
a bug, not an optimization.

Usage: python layout_rehearsal.py [flat_sf_dir] [layout_dir]
Prints one markdown table (for PLANS.md) and a JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


QUERY_SET = [
    # order-key joins/aggs: the bucketed lineitem/orders should drop
    # their shuffles (SelectedBucketsCount, fewer Exchanges)
    "q_tpch_q3", "q_tpch_q4", "q_tpch_q12", "q_tpch_q18", "q_tpch_q21",
    # literal event_type filters: partition pruning on the events layout
    "q_join_asof", "q_join_asof_forward", "q_join_asof_nearest",
    # documents clustered (lang, source): row-group pruning on src0/lang
    "q_contamination", "q_decontaminate", "q_corpus_pipeline",
    # controls -- no order-key join, no enum filter: layout must not hurt
    "q_tpch_q1", "q_agg_group", "q_sessionize",
]


def _final_plan(df) -> str:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def _run(queries, spark, sf_dir):
    out = {}
    for name in QUERY_SET:
        fn = queries[name]
        best, rows, plan = None, None, ""
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            rows = df.collect()
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
            plan = _final_plan(df)
        pf = [
            m
            for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
            if m.strip()
        ]
        buckets = re.findall(r"SelectedBucketsCount: ([^,\n]*)", plan)
        out[name] = {
            "sec": round(best, 2),
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "scans": plan.count("Scan parquet"),
            "partition_filters": len(pf),
            "bucket_scans": len(buckets),
            "rows_key": sorted(repr(tuple(r)) for r in rows),
        }
    return out


def main() -> None:
    flat = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    here = os.path.dirname(os.path.abspath(__file__))
    laid = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        here, ".scratch", "layout_sf0.1"
    )
    from weighted_raster_overlay_service_toolbox_spark.queries import QUERIES
    from weighted_raster_overlay_service_toolbox_spark.session import get_spark
    from weighted_raster_overlay_service_toolbox_spark.sources.layout import (
        MANIFEST,
        write_layout,
    )

    spark = get_spark("layout-rehearsal")
    mpath = os.path.join(laid, MANIFEST)
    regen = True
    if os.path.isfile(mpath):
        # regenerate layouts written before the size-aware events scheme
        regen = "partition" not in json.load(open(mpath)).get("events", {})
    if regen:
        write_layout(spark, flat, laid)

    # Warm the session on BOTH storages before any timing: JVM/codegen/
    # footer caches otherwise bias whichever storage runs first (the
    # first sweep of this script showed the control queries "improving"
    # 2.5x on the layout purely from session warmth).
    for wd in (flat, laid):
        for wq in ("q_tpch_q1", "q_agg_group", "q_tpch_q3"):
            QUERIES[wq](spark, wd).collect()

    base = _run(QUERIES, spark, flat)
    layt = _run(QUERIES, spark, laid)

    print("| query | flat s | layout s | exch flat->layout | scans f->l |"
          " PartitionFilters | buckets | values |")
    print("|---|---|---|---|---|---|---|---|")
    mismatches = []
    for name in QUERY_SET:
        b, m = base[name], layt[name]
        same = b["rows_key"] == m["rows_key"]
        if not same:
            mismatches.append(name)
        print(
            f"| {name} | {b['sec']} | {m['sec']}"
            f" | {b['exchanges']}->{m['exchanges']}"
            f" | {b['scans']}->{m['scans']}"
            f" | {m['partition_filters']}"
            f" | {m['bucket_scans']}"
            f" | {'==' if same else 'MISMATCH'} |"
        )
    summary = {
        "metric": "layout_rehearsal",
        "queries": {
            n: {
                k: (base[n][k], layt[n][k])
                for k in ("sec", "exchanges", "scans")
            }
            for n in QUERY_SET
        },
        "mismatches": mismatches,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
