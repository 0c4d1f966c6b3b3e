"""Deterministic plan-quality audit over the whole query registry.

Wall-clock bench numbers on this host swing 2x+ between runs of
identical code (PLANS.md round-5 variance note), so this publishes the
NOISE-FREE half of the performance evidence: for every registered
query, the physical-plan properties that decide 100 TB behavior --
exchange count, scan count per table, Python-boundary operators, and
the presence of non-equi join shapes. Run:

    python plan_audit.py            # writes PLAN_AUDIT.json

The numbers are stable across hosts and runs (they depend only on the
code and Catalyst), so a round-over-round diff of PLAN_AUDIT.json shows
exactly which plans changed -- the same role PLANS.md plays in prose,
machine-checkable and total instead of curated.
"""

from __future__ import annotations

import json
import os
import re
import sys


def audit_plan(plan: str) -> dict:
    """Count the scale-relevant node types in a formatted explain."""
    # formatted explain prints each node in the tree AND a "(n) Node"
    # detail section; count detail headers for exact node counts.
    heads = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, flags=re.M)
    from collections import Counter

    c = Counter(heads)
    scans: dict[str, int] = {}
    for m in re.finditer(r"file:[^\s\]]*/(\w+)\.parquet", plan):
        t = m.group(1)
        scans[t] = scans.get(t, 0) + 1
    # one InMemoryFileIndex line + one Location line per scan node; halve
    scans = {t: max(1, n // 2) if n > 1 else n for t, n in scans.items()}
    return {
        "exchanges": c.get("Exchange", 0),
        "broadcast_exchanges": c.get("BroadcastExchange", 0),
        "scans": scans,
        "python_eval": (
            c.get("BatchEvalPython", 0)
            + c.get("ArrowEvalPython", 0)
            + c.get("FlatMapGroupsInPandas", 0)
            + c.get("MapInPandas", 0)
        ),
        # non-equi join shapes: CartesianProduct or BroadcastNestedLoopJoin.
        # NOT automatically bad -- every in-repo occurrence is a bounded
        # broadcast side by design (scalar thresholds, band tables,
        # centroid/probe matrices; see PLANS.md) -- but any NEW entry
        # must consciously join the allowlist in tests/test_plan_audit.py.
        "non_equi_join": bool(
            c.get("CartesianProduct", 0) or c.get("BroadcastNestedLoopJoin", 0)
        ),
        "take_ordered": c.get("TakeOrderedAndProject", 0),
        "sort_merge_joins": c.get("SortMergeJoin", 0),
        "broadcast_hash_joins": c.get("BroadcastHashJoin", 0),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")
    from weighted_raster_overlay_service_toolbox_spark.queries import QUERIES
    from weighted_raster_overlay_service_toolbox_spark.session import get_spark

    spark = get_spark("wros-plan-audit", cpus=8)
    out: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out[name] = audit_plan(plan)
        except Exception as exc:  # noqa: BLE001 - full-registry sweep
            errors[name] = str(exc).splitlines()[0][:160]
    summary = {
        "sf_dir": sf_dir,
        "queries_audited": len(out),
        "errors": errors,
        "totals": {
            "python_eval_queries": sorted(
                n for n, a in out.items() if a["python_eval"]
            ),
            "non_equi_join_queries": sorted(
                n for n, a in out.items() if a["non_equi_join"]
            ),
            "max_exchanges": max((a["exchanges"] for a in out.values()), default=0),
        },
        "per_query": out,
    }
    with open("PLAN_AUDIT.json", "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "queries_audited": summary["queries_audited"],
                "errors": len(errors),
                "python_eval_queries": summary["totals"]["python_eval_queries"],
                "non_equi_join_queries": summary["totals"][
                    "non_equi_join_queries"
                ],
            }
        )
    )
    if errors:
        print("errors:", errors, file=sys.stderr)


if __name__ == "__main__":
    main()
