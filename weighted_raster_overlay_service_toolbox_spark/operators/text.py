"""Text-analysis operators for document corpora: tokenization, term
statistics, TF-IDF, quality features, language scoring, fingerprints.

All pure column expressions / built-in aggregations -- no Python in the
hot path. Shuffle shapes (the 100 TB concerns):

- token-keyed aggregations get map-side partial combine for free;
- the vocabulary (document frequency) is tiny relative to the corpus, so
  it broadcasts back for the TF-IDF join;
- ultra-frequent tokens are the skew hazard -- cap or drop them upstream
  (or use operators/skew.py salting) before any token-keyed self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.pinning import pin_corpus

from ..functions.rounding import duck_round
from pyspark.sql.functions import broadcast


def tokens_of(text_col: str | Column = "text", sep: str = " ") -> Column:
    """The corpus tokenization convention as a column expression."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, sep)


def tokenize(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """One row per (doc, token) occurrence."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_of(text_col)).alias("token")
    )


def term_frequencies(tok: DataFrame) -> DataFrame:
    """(doc_id, term, tf) from a tokenize() output."""
    return (
        tok.withColumnRenamed("token", "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(docs: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, tfidf) with idf = ln(N/df) over the FULL corpus.

    df (vocabulary-sized) broadcasts; N is a scalar cross join.

    The three consumers (tf, df, N) share ONE corpus scan: the narrow
    (id, text) projection is pinned with a non-eager localCheckpoint so
    column pruning cannot specialize each branch into its own parquet
    read (the same single-scan treatment the similarity queries got;
    at 100 TB a 3x corpus scan is 3x the I/O bill). Note the pin
    itself is a trade: the projection materializes to executor storage
    without recompute-on-loss -- pinning the PRE-explode rows (as here,
    not the token stream) keeps that cache as small as the trade
    allows; at the extreme, re-scanning is the fault-tolerant choice."""
    base = docs.select(id_col, text_col).transform(pin_corpus)
    tok = tokenize(base, id_col, text_col)
    tf = term_frequencies(tok)
    dfreq = tok.groupBy(F.col("token").alias("term")).agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = base.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            duck_round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            )
            .cast("double")
            .alias("tfidf"),
        )
    )


def quality_features(
    docs: DataFrame, id_col: str, text_col: str = "text", min_tokens: int = 5
) -> DataFrame:
    """Corpus-filter features: token count, mean token length, type-token
    ratio, keep flag."""
    toks = tokens_of(text_col)
    n = F.size(toks)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_toks"),
        duck_round(F.length(text_col).cast("double") / n, 4)
        .cast("double")
        .alias("avg_tok_len"),
        duck_round(F.size(F.array_distinct(toks)).cast("double") / n, 4)
        .cast("double")
        .alias("type_token_ratio"),
        (n >= min_tokens).alias("long_enough"),
    )


def marker_score(text_col: str | Column, markers: list[str]) -> Column:
    """Fraction of tokens found in a marker lexicon (language-ID and
    topic heuristics); pure column expression."""
    toks = tokens_of(text_col)
    arr = F.array(*[F.lit(m) for m in markers])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return duck_round(hits.cast("double") / F.size(toks), 4).cast("double")


def word_ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-grams over an ALREADY-MATERIALIZED token-array column;
    EMPTY when the doc has fewer than ``n`` tokens. The guard matters:
    ``F.sequence(1, k)`` with ``k < 1`` silently generates a DESCENDING
    sequence, not an empty one.

    ``toks`` must be a plain column REFERENCE (project ``tokens_of()``
    into a column first), not the split expression itself -- see
    :func:`word_ngrams` for the measured quadratic trap."""
    cnt = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(cnt >= 1, grams).otherwise(F.array().cast("array<string>"))


def word_ngrams(text_col: str | Column, n: int = 3) -> Column:
    """Word n-grams straight from a text column -- convenient, but the
    split expression is INLINED into every ``element_at`` of the HOF
    lambda (n + 1 references; HOFs are interpreted per element, and
    Catalyst only de-duplicates CHEAP expressions across references),
    so each document re-splits its text ~n*grams times: O(words^2) per
    doc. Measured r9 at sf1r (50k docs, ~55 grams each): the explode of
    this form cost 35.1s vs 2.1s after projecting ``tokens_of()`` into
    a column first -- 17x. Fine for one-shot expressions over short
    strings; every corpus-sized consumer should project tokens and call
    :func:`word_ngrams_from_tokens` (repetition_features and the
    source-overlap pair do)."""
    return word_ngrams_from_tokens(tokens_of(text_col), n)


def repetition_features(
    docs: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Gopher-style repetition quality signal: the share of a document's
    word n-grams taken by its single most-repeated n-gram (boilerplate
    and low-quality generated text score high).

    Shape: tokenize-projection -> explode -> (doc, gram) count -> per-doc
    max/sum. The token array is materialized in its own projection
    BEFORE the gram expression references it (the word_ngrams quadratic
    trap, r9). Both aggregations key on (doc_id[, gram]) -- uniform,
    map-side combined; nothing leaves the executor except per-doc rows.
    Docs shorter than ``n`` tokens produce no row (no grams to score)."""
    grams = docs.select(
        F.col(id_col).alias("doc_id"), tokens_of(text_col).alias("_toks")
    ).select(
        "doc_id",
        F.explode(word_ngrams_from_tokens(F.col("_toks"), n)).alias("gram"),
    )
    cnt = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.max("c").cast("int").alias("top_ngram_count"),
        F.sum("c").cast("int").alias("n_ngrams"),
        duck_round(F.max("c") / F.sum("c"), 4).cast("double").alias("top_ngram_share"),
    )


def scrub_digits(col: Column, replacement: str = "X") -> Column:
    """PII-style scrub: mask every digit. Pure column expression
    (regexp_replace is global in Spark); the building block for
    phone/account-number redaction in a corpus pipeline."""
    return F.regexp_replace(col, "[0-9]", replacement)


def fingerprint(text_col: str | Column = "text") -> Column:
    """Canonical-form document fingerprint: md5 over the sorted distinct
    token set (catches reordered/duplicated-token copies)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_of(text_col))))
    return F.md5(canon.cast("binary"))

# --------------------------------------------------------------------------
# BPE tokenizer training (round 14, VERDICT r13 #6): the one named stage
# of a production LLM data pipeline (corpus -> TOKENIZER -> packed
# batches) the engine didn't yet model. Deterministic byte/char-pair
# encoding learned at corpus scale:
#
# - the corpus is collapsed ONCE to its distinct-word universe with
#   occurrence counts (the hash-universe trick: bounded by vocabulary
#   diversity, never corpus size -- one token-keyed shuffle);
# - each merge round is ONE pair-count aggregation over adjacent symbol
#   pairs of the current segmentation (counts weighted by word
#   frequency, exact integers), argmax with lexicographic (left, right)
#   tiebreak -- a 1-row bounded collect, the graph.py convergence-scalar
#   class;
# - the chosen pair is applied to every word state with a LEFT-TO-RIGHT
#   GREEDY fold (the classic BPE re-segmentation: "a a a" under merge
#   (a,a) becomes "aa a"), expressed as a sequential string fold both
#   engines evaluate identically (Spark ``aggregate`` higher-order
#   function == DuckDB ``list_reduce``), so a constant merge count
#   unrolls into an exact DuckDB CTE chain exactly like q_kmeans /
#   q_pagerank;
# - per-round eager localCheckpoint keeps the vocab-sized state's
#   lineage flat (the kmeans convention).
#
# Symbols carry no end-of-word marker (the fixture tokenization is
# already clean space-separated words; a '</w>' variant is a caller
# concat away). Merged symbols are TEXTUAL: a merge product equal to
# another symbol's text behaves identically in later rounds on both
# engines, so cross-engine agreement holds by construction.
# --------------------------------------------------------------------------

#: symbol separator inside a word-state string: below every corpus
#: character (the fixture alphabet is a-z; see bpe_train's guard), so
#: string comparison of "l || SEP || r" orders like the (l, r) tuple.
BPE_SEP = chr(31)


def _bpe_lit(sym: str) -> str:
    """SQL string literal for a symbol (quotes doubled)."""
    return "'" + sym.replace("'", "''") + "'"


def bpe_merge_fold_sql(state_expr: str, left_expr: str, right_expr: str) -> str:
    """Spark-SQL expression applying merge (left, right) to a
    ``BPE_SEP``-joined word-state string with the greedy left-to-right
    fold. ``left_expr``/``right_expr`` are SQL expressions (literals or
    column references). The accumulator starts NULL (first symbol seeds
    it), then a merge fires when the accumulator's LAST symbol equals
    ``left`` (exact: the whole accumulator or separator-preceded) and
    the incoming symbol equals ``right`` -- the merged symbol is the
    concatenation, treated atomically by later rounds.

    ``state_expr`` appears exactly ONCE in the output, so chaining
    n merges (bpe_segment_expr) grows the expression LINEARLY -- the
    3-references-per-level form would blow up 3^n."""
    sep = "chr(31)"
    return (
        f"aggregate(split({state_expr}, {sep}), "
        f"CAST(NULL AS STRING), "
        f"(acc, x) -> CASE WHEN acc IS NULL THEN x "
        f"WHEN x = {right_expr} AND (acc = {left_expr} "
        f"OR endswith(acc, {sep} || {left_expr})) "
        f"THEN left(acc, length(acc) - length({left_expr})) "
        f"|| {left_expr} || {right_expr} "
        f"ELSE acc || {sep} || x END)"
    )


def bpe_train(
    words: DataFrame, n_merges: int = 8
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over a ``(tok, freq)`` word-universe
    relation; returns ``[(left, right, pair_count), ...]`` in merge
    order.

    Each round runs one Spark aggregation over the vocab-sized state
    relation and collects the single argmax row (bounded); ties on
    pair count break lexicographically on (left, right) -- byte order,
    the default string collation in both Spark and DuckDB. Raises
    ``ValueError`` if the corpus exhausts mergeable pairs before
    ``n_merges`` rounds (every word a single symbol): the unrolled
    oracle CTE chain cannot represent a short train, so a caller must
    lower ``n_merges`` explicitly instead of silently diverging."""
    state = words.select(
        F.array_join(F.split("tok", ""), BPE_SEP).alias("state"),
        F.col("freq").cast("long").alias("freq"),
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            state.select(F.split("state", BPE_SEP).alias("cs"), "freq")
            .select(
                F.explode(
                    F.expr(
                        "zip_with(slice(cs, 1, size(cs) - 1), "
                        "slice(cs, 2, size(cs) - 1), "
                        "(a, b) -> struct(a AS l, b AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .select("p.l", "p.r", "freq")
        )
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            if state.isEmpty():
                break  # empty corpus: no merges to learn, nothing diverges
            raise ValueError(
                "bpe_train: mergeable pairs exhausted before "
                f"{n_merges} rounds -- lower n_merges"
            )
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((left, right, cnt))
        state = state.select(
            F.expr(
                bpe_merge_fold_sql("state", _bpe_lit(left), _bpe_lit(right))
            ).alias("state"),
            "freq",
        ).localCheckpoint(eager=False)
        # flat lineage per round (kmeans convention). r14: NON-EAGER --
        # the next round's argmax collect is the only consumer and
        # materializes the pin as a side effect, so each round runs ONE
        # blocking job instead of two (guide section 1.2); merges are
        # unchanged (checkpointing never affects values).
    return merges


def bpe_segment_expr(tok_expr: str, merges: list[tuple[str, str, int]]) -> Column:
    """Column: the ``BPE_SEP``-joined segmentation of token-string
    expression ``tok_expr`` after applying ``merges`` in training order
    -- the APPLY stage, a pure per-row expression chain (no shuffle, no
    Python; run it over the distinct-token universe and broadcast-join
    back, the q_unigram_logprob vocabulary convention). Expression size
    is linear in ``len(merges)`` (see bpe_merge_fold_sql)."""
    state = f"array_join(split({tok_expr}, ''), chr(31))"
    for left, right, _ in merges:
        state = bpe_merge_fold_sql(state, _bpe_lit(left), _bpe_lit(right))
    return F.expr(state)
