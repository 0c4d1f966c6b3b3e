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

Known blind spots (deliberately surfaced, not hidden):

* ``localCheckpoint``'d subtrees appear as ``Scan ExistingRDD`` -- the
  plan upstream of a checkpoint is invisible here, so those queries are
  counted in ``existing_rdd_scans`` and pinned in their own allowlist
  (tests/test_plan_audit.py); their single-fact-scan property is
  asserted at RUNTIME by the executed-plan pins in tests/test_plans.py.
* Streaming queries and eager iterative operators execute during
  DataFrame construction; their registered plan is the post-execution
  result (often a memory-sink or local scan), so their rows here are
  near-empty by design -- their plan properties are pinned by the
  streaming/golden tests instead.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

#: physical node-name fragments that mean "left the JVM for Python"
#: (row batches cross the Arrow/pickle boundary). Matches
#: BatchEvalPython(UDTF), ArrowEvalPython, ArrowAggregatePython,
#: FlatMapGroupsInPandas(WithState), MapInPandas, (Python)MapInArrow,
#: WindowInPandas -- any future node keeps one of these substrings.
_PY_MARKERS = ("Python", "Pandas", "Arrow")


def formatted_plan(df) -> str:
    """The ONE formatted-explain incantation (shared with the test so
    the allowlists and the JSON cannot silently diverge)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def audit_plan(plan: str) -> dict:
    """Count the scale-relevant node types in a formatted explain."""
    # formatted explain shows each node once in the tree and once as a
    # "(n) Node" detail header; count detail headers for exact counts.
    heads = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, flags=re.M)
    c = Counter(heads)
    # each parquet scan node prints its file path exactly once (probed:
    # a 2-scan plan shows the path twice) -- count paths directly.
    scans: dict[str, int] = {}
    for m in re.finditer(r"file:[^\s\]]*/(\w+)\.parquet", plan):
        t = m.group(1)
        scans[t] = scans.get(t, 0) + 1
    full_heads = set(re.findall(r"^\(\d+\) ([A-Za-z ]+)", plan, flags=re.M))
    return {
        "exchanges": c.get("Exchange", 0),
        "broadcast_exchanges": c.get("BroadcastExchange", 0),
        "scans": scans,
        # checkpointed subtrees: plan-invisible upstream; see module doc
        "existing_rdd_scans": len(
            re.findall(r"^\(\d+\) Scan ExistingRDD", plan, flags=re.M)
        ),
        "python_eval": sum(
            n
            for h, n in c.items()
            if any(m in h for m in _PY_MARKERS)
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
        "_head_types": sorted(full_heads),
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
            plan = formatted_plan(fn(spark, sf_dir))
            a = audit_plan(plan)
            a.pop("_head_types")
            out[name] = a
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
            "checkpointed_queries": sorted(
                n for n, a in out.items() if a["existing_rdd_scans"]
            ),
            "multi_scan_queries": {
                n: a["scans"]
                for n, a in sorted(out.items())
                if any(v >= 2 for v in a["scans"].values())
            },
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
                "checkpointed_queries": summary["totals"]["checkpointed_queries"],
                "multi_scan_queries": summary["totals"]["multi_scan_queries"],
            }
        )
    )
    if errors:
        print("errors:", errors, file=sys.stderr)


if __name__ == "__main__":
    main()
