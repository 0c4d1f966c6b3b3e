"""Registry-wide plan-shape allowlists (plan_audit.py's checkable half).

Two operator classes need a conscious decision at 100 TB -- a Python
boundary (Arrow batch transfer, out of whole-stage codegen) and a
non-equi join (CartesianProduct / BroadcastNestedLoopJoin). Every
in-repo occurrence is deliberate and documented (PLANS.md / the query
docstring); this test pins the EXACT sets so a new query cannot
introduce either silently -- extending the allowlist is the audit
trail.
"""

from __future__ import annotations

from plan_audit import audit_plan
from weighted_raster_overlay_service_toolbox_spark.queries import QUERIES

from .conftest import SF_SMOKE

#: declared UDF surface + Arrow-vectorized similarity/multimodal ops --
#: each documented as Pandas-UDF-by-necessity in its docstring.
PYTHON_EVAL_ALLOWED = {
    "q_cosine_topk",
    "q_embed_near_dup",
    "q_multimodal_decode",
    "q_multimodal_framesample",
    "q_multimodal_resize",
    "q_pack_sequences",
    "q_udf_grouped_map",
    "q_udf_scalar",
    "q_udtf_flatmap",
}

#: non-equi joins whose build side is BOUNDED by design: one-row scalar
#: thresholds (tpch_q11/q22, tfidf, collocations, unigram_logprob,
#: approx_topk, wro_equal_interval, kmeans inertia), a literal band
#: table (join_range), centroid/probe matrices (ann_ivf, cosine_topk,
#: embed_near_dup, kmeans), metadata-sized grids (timeseries_gapfill),
#: a filtered pair sample (str_levenshtein), or the declared cross-join
#: operator itself (join_cross).
NON_EQUI_ALLOWED = {
    "q_ann_ivf",
    "q_approx_topk",
    "q_collocations",
    "q_cosine_topk",
    "q_embed_near_dup",
    "q_join_cross",
    "q_join_range",
    "q_kmeans",
    "q_str_levenshtein",
    "q_tfidf",
    "q_timeseries_gapfill",
    "q_tpch_q11",
    "q_tpch_q22",
    "q_unigram_logprob",
    "q_wro_equal_interval",
}


def test_python_and_non_equi_plan_shapes_are_allowlisted(spark):
    python_eval, non_equi = set(), set()
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        a = audit_plan(plan)
        if a["python_eval"]:
            python_eval.add(name)
        if a["non_equi_join"]:
            non_equi.add(name)
    assert python_eval == PYTHON_EVAL_ALLOWED, (
        f"new python-boundary queries: {sorted(python_eval - PYTHON_EVAL_ALLOWED)}; "
        f"stale allowlist: {sorted(PYTHON_EVAL_ALLOWED - python_eval)}"
    )
    assert non_equi == NON_EQUI_ALLOWED, (
        f"new non-equi-join queries: {sorted(non_equi - NON_EQUI_ALLOWED)}; "
        f"stale allowlist: {sorted(NON_EQUI_ALLOWED - non_equi)}"
    )
