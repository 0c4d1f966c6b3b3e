"""HOF-lambda projection-boundary lint (VERDICT r9 'Next round' #8).

The word_ngrams quadratic (late r9, PLANS.md): a non-cheap expression
(``F.split`` via the TOKS()/tokens_of() helpers) referenced inside an
``F.transform`` lambda is inlined into EVERY element reference -- HOFs
evaluate interpreted, and Catalyst de-duplicates only CHEAP expressions
across references -- so a linear scan silently becomes O(len^2) per row
(measured: 5x on the overlap family at sf1r, invisible at fixture SFs).
The registry-wide sweep that followed was manual; this test encodes its
rule as a lint, the same discipline as tests/test_broadcast_lint.py:

    an EXPENSIVE call (split / regexp / hash / tokenizer helpers)
    inside a HOF lambda is flagged UNLESS its argument subtree
    references a lambda parameter.

Referencing the lambda parameter means the work is per-element-INPUT
(hashing each token once -- linear and necessary, e.g. minhash's
``transform(tokens, lambda t: portable_hash60(t) % M)``). NOT
referencing it means the call re-evaluates a CAPTURED expression once
per element -- the quadratic class; the fix is always a projection
boundary (materialize the expression as a column first; CollapseProject
refuses to inline non-cheap aliases referenced more than once, which is
what makes the boundary stick -- see operators/text.py
word_ngrams_from_tokens).

Every flagged site must appear in the whitelist below with a measured
boundedness justification; stale entries fail too.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / (
    "weighted_raster_overlay_service_toolbox_spark"
)

#: pyspark.sql.functions higher-order functions taking Column lambdas.
HOFS = {
    "transform", "filter", "aggregate", "reduce", "zip_with", "exists",
    "forall", "map_filter", "map_zip_with", "transform_keys",
    "transform_values",
}

#: Non-cheap expression builders: string splitting / regex / crypto+hash
#: functions, plus this repo's tokenizer/fingerprint helpers (each wraps
#: an F.split or regex chain).
EXPENSIVE = {
    "split", "regexp_extract", "regexp_replace", "regexp_extract_all",
    "regexp_like", "sentences", "from_json", "get_json_object", "md5",
    "sha1", "sha2", "xxhash64", "crc32", "conv",
    "TOKS", "tokens_of", "word_ngrams", "word_ngrams_from_tokens",
    "fingerprint", "portable_hash60",
}

#: (module, enclosing function) -> (expected flag set, justification).
#: An entry documents a CONSCIOUS decision that the re-evaluation is
#: bounded by a constant -- the audited linear class, not the quadratic
#: one the lint exists to catch.
_WHITELIST: dict[tuple[str, str], tuple[frozenset, str]] = {
    ("queries/llm.py", "q_multimodal_struct"): (
        frozenset({"transform<-TOKS"}),
        "bounded: frame sequence is capped at 3 elements"
        " (least(size-1, 2)), so at most 3 re-splits/row -- the audited"
        " linear-constant-factor class (PLANS.md r9 HOF sweep)",
    ),
}


def _name_of(f):
    if isinstance(f, ast.Name):
        return f.id
    if isinstance(f, ast.Attribute):
        return f.attr
    return None


def _inventory() -> dict[tuple[str, str], set]:
    hits: dict[tuple[str, str], set] = {}
    for p in sorted(PKG.rglob("*.py")):
        rel = str(p.relative_to(PKG))
        tree = ast.parse(p.read_text())

        class V(ast.NodeVisitor):
            def __init__(self) -> None:
                self.stack = ["<module>"]

            def visit_FunctionDef(self, n):  # noqa: N802
                self.stack.append(n.name)
                self.generic_visit(n)
                self.stack.pop()

            visit_AsyncFunctionDef = visit_FunctionDef

            def visit_Call(self, n):  # noqa: N802
                fn = _name_of(n.func)
                if fn in HOFS:
                    lams = [
                        a
                        for a in list(n.args) + [k.value for k in n.keywords]
                        if isinstance(a, ast.Lambda)
                    ]
                    for lam in lams:
                        params = {a.arg for a in lam.args.args}
                        for sub in ast.walk(lam.body):
                            if not isinstance(sub, ast.Call):
                                continue
                            en = _name_of(sub.func)
                            if en not in EXPENSIVE:
                                continue
                            refs_param = any(
                                isinstance(x, ast.Name) and x.id in params
                                for x in ast.walk(sub)
                            )
                            if not refs_param:
                                hits.setdefault(
                                    (rel, self.stack[-1]), set()
                                ).add(f"{fn}<-{en}")
                self.generic_visit(n)

        V().visit(tree)
    return hits


def test_no_captured_expensive_expression_inside_hof_lambda():
    hits = _inventory()
    unlisted = {
        k: sorted(v) for k, v in hits.items() if k not in _WHITELIST
    }
    assert not unlisted, (
        "expensive expression re-evaluated per element inside a HOF"
        " lambda (the word_ngrams quadratic class) -- add a projection"
        f" boundary or whitelist with a boundedness argument: {unlisted}"
    )
    drifted = {
        k: (sorted(v), sorted(_WHITELIST[k][0]))
        for k, v in hits.items()
        if frozenset(v) != _WHITELIST[k][0]
    }
    assert not drifted, f"flag-set drift (actual, whitelisted): {drifted}"
    stale = {k for k in _WHITELIST if k not in hits}
    assert not stale, f"stale whitelist entries (site fixed?): {stale}"


def test_word_ngrams_inline_form_stays_quarantined():
    """The quadratic inline word_ngrams survives only as a documented
    warning (operators/text.py) -- no package call site may consume it;
    every gram build must go through the tokens-projection form."""
    for p in sorted(PKG.rglob("*.py")):
        rel = str(p.relative_to(PKG))
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.Call):
                if _name_of(node.func) == "word_ngrams":
                    assert rel == "operators/text.py", (
                        f"inline word_ngrams call in {rel} -- use"
                        " word_ngrams_from_tokens over a projected"
                        " tokens column instead (PLANS.md r9 quadratic)"
                    )
