"""Similarity-search operators over embedding columns (``array<float>``).

Two paths, per the scale rule "exact for ground truth, bucketed for bulk":

- :func:`cosine_scores` / :func:`topk_per_probe` -- brute-force cosine
  against a broadcast probe set (exact baseline);
- :func:`hyperplane_bucket` -- seeded sign-LSH bucketer: the candidate
  space shrinks to one bucket per probe, turning the quadratic pair space
  into an equi-join keyed by bucket (IVF-style inverted file).

Numeric conventions: all arithmetic in double (float32 inputs are widened
once at load); dot products over large pair sets run in an Arrow-batched
numpy pandas_udf (:func:`dot_pandas`) -- higher-order-function lambdas are
interpreted per element and lose by ~10x at 100k+ pairs; per-vector norms
are always precomputed (N+M evaluations, not 2*N*M).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.pinning import pin_corpus

from ..functions.rounding import duck_round
from pyspark.sql.functions import broadcast, pandas_udf


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Sequential double-precision dot product as a pure column expression.

    Bit-matches DuckDB's ``list_dot_product`` (sequential left-to-right
    accumulation from 0.0), which is what makes it the REQUIRED dot for
    any rounded cosine that gates an oracle-compared result.

    Measured dead end (r8, kept as a warning): unrolling the fold into a
    flat 0.0 + a[1]*b[1] + ... + a[64]*b[64] expression to escape the
    interpreted HOF lambda made every consumer SLOWER (q_cosine_topk
    0.76s -> 2.4s) -- column expressions are trees, so wrappers like
    duck_round substitute the 129-node dot into every branch that
    references it, and the multiplied expression defeats codegen. The
    fold keeps the dot a single compact node. If the interpreted cost
    ever dominates a non-gated path, dot_pandas is the answer, not
    unrolling."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


_DOT_PANDAS = None


def dot_pandas(a, b) -> Column:
    """Arrow-batched numpy dot product: one einsum per Arrow batch, no
    per-row Python. Lazily built because pandas_udf return-type parsing
    needs an active SparkSession."""
    global _DOT_PANDAS
    if _DOT_PANDAS is None:

        @pandas_udf("double")
        def dot(x: pd.Series, y: pd.Series) -> pd.Series:
            import numpy as np

            xv = np.stack(x.to_numpy())
            yv = np.stack(y.to_numpy())
            return pd.Series(np.einsum("ij,ij->i", xv, yv))

        _DOT_PANDAS = dot
    return _DOT_PANDAS(a, b)


def with_norm(vectors: DataFrame, vec_col: str = "e", out: str = "nrm") -> DataFrame:
    """Attach the L2 norm once per vector."""
    return vectors.withColumn(out, F.sqrt(dot_expr(vec_col, vec_col)))


def cosine_scores(
    cands: DataFrame, probes: DataFrame, bulk: bool = True
) -> DataFrame:
    """Score every (probe, candidate) pair by cosine, probes broadcast.

    ``cands``: ``vec_id, e, nrm``; ``probes``: ``probe_id, pe, pnrm``.
    Returns ``probe_id, cand_id, sim`` with sim rounded to 4dp (the
    cross-engine determinism convention for similarity scores).

    ``bulk=False`` (dot_expr, sequential fold) bit-matches DuckDB's
    list_dot_product and is REQUIRED when the rounded sim gates an exact
    comparison (oracle parity, top-k membership: the r8 sweep measured a
    fixture sim 9e-11 from a 4dp rounding boundary, inside einsum-vs-fold
    summation-order drift). ``bulk=True`` (Arrow einsum) is the
    throughput path for 100k+ pair re-scoring where last-ulp identity is
    not load-bearing.
    """
    dot = dot_pandas if bulk else dot_expr
    joined = cands.join(broadcast(probes), F.col("vec_id") != F.col("probe_id"))
    sim = duck_round(
        dot(F.col("pe"), F.col("e")) / (F.col("pnrm") * F.col("nrm")), 4
    ).cast("double")
    return joined.select(
        "probe_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
    )


def topk_per_probe(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k: rank on (rounded sim DESC, cand_id ASC) so the
    selection is stable across engines and partitionings."""
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("probe_id", "cand_id", "sim", F.col("rk").cast("int").alias("rk"))
    )


def _plane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5(seed, j) -- hash
    bits as a fixed entropy source; never random at run time."""
    vals = []
    for j in range(dim):
        h = hashlib.md5(f"plane-{seed}-{j}".encode()).digest()
        vals.append(int.from_bytes(h[:4], "big") / 2**31 - 1.0)
    return vals


def hyperplane_bucket(
    vectors: DataFrame, vec_col: str = "e", dim: int = 64, n_planes: int = 4,
    out: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket id (0 .. 2^n_planes - 1) from seeded hyperplanes.

    A plain integer column: bucket-partitioned layouts get partition
    pruning, and probe lookups become equi-joins on bucket.

    r14 (optimization round): each plane's 64 literals are one SQL
    array string parsed JVM-side -- the per-literal F.lit composition
    (dim x n_planes py4j round trips) cost ~1.8 s of pure driver time
    per construction. repr(float) round-trips to the identical IEEE
    double through Spark's literal parser (the 'D' suffix keeps the
    parser in DOUBLE, not DECIMAL), so expressions and values are
    unchanged."""
    planes = [
        F.expr("array(" + ", ".join(f"{x!r}D" for x in _plane(dim, s)) + ")")
        for s in range(n_planes)
    ]
    bucket = sum(
        (
            F.when(dot_expr(F.col(vec_col), pl) >= 0, 1 << i).otherwise(0)
            for i, pl in enumerate(planes)
        ),
        start=F.lit(0),
    )
    return vectors.withColumn(out, bucket)


# Bounds for the "auto" max_block derivation: the cap follows balanced
# occupancy (2 * n / k -- clusters within 2x of balanced never stripe, so
# the benign regime keeps full within-cluster recall) but is CLAMPED to an
# absolute ceiling, because only an absolute block bound guarantees the
# pair work is linear: sum(c_i^2) <= n * AUTO_BLOCK_MAX once every block
# is <= AUTO_BLOCK_MAX rows. A census-relative cap alone provably fails
# the bounded-occupancy corpus (r8 sf1: ~2k natural directions, so every
# cluster is "typical" AND huge -- k-growth measured 116s, no help;
# PLANS.md sf1 table), which is exactly when the straggler guarantee
# matters most.
AUTO_BLOCK_MIN = 256
AUTO_BLOCK_MAX = 1024


def semantic_dedup(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 3,
    threshold: float = 0.35,
    max_block: int | str | None = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embedding space, then compare
    ONLY within clusters -- the pair space collapses from n^2/2 to
    ~n^2/(2k), and at production scale k grows with n so the per-cluster
    block stays bounded (the paper runs 11k clusters over LAION). Within
    a cluster, a vector is DROPPED if ANY lower-id cluster member (kept
    or itself already dropped) is within ``threshold`` cosine -- a
    deterministic, join-expressible rule, the same keep-one convention
    the MinHash cluster path uses. NOTE this is not the paper's
    survivor-relative greedy sweep: on a chain a~b~c with a !~ c, the
    sweep would keep c (its only near neighbor b is already gone) while
    this rule drops it -- strictly more aggressive, order-free, and
    therefore expressible as one self-join instead of a sequential scan.

    ``max_block`` caps the within-cluster comparison block: clusters
    larger than the cap are striped into ``ceil(c_n / max_block)`` lanes
    by id-ordered round-robin (row_number over vec_id, modulo), and only
    same-lane pairs are compared. This bounds the worst-case block at
    EXACTLY ``max_block`` rows (deterministic, not hash-expected), so one
    hot cluster at 100 TB cannot become an O(c^2) straggler. The trade is
    recall: cross-lane near-dups inside an oversize cluster are missed --
    the same documented under-detection trade as the salted corpus-mixture
    lanes; production sizing should prefer growing k (the paper's regime)
    and treat the cap as the straggler backstop.

    Default ``"auto"`` (round 9, VERDICT r8 #1) derives the cap from the
    occupancy census: ``clamp(ceil(2 * n / k), AUTO_BLOCK_MIN,
    AUTO_BLOCK_MAX)`` where ``n`` is the corpus size (one extra COUNT
    over the already-pinned assignment, broadcast as a 1-row relation).
    Clusters within 2x of balanced occupancy never stripe (full recall in
    the benign regime); the absolute ceiling makes total pair work
    <= n * AUTO_BLOCK_MAX / 2 -- LINEAR in n, which the relative term
    alone cannot guarantee (see the AUTO_BLOCK_* comment). The r8 sf1
    measurement motivating this: uncapped 93.1s on 10x data (14.8x,
    super-linear); a 250-row cap restored 22.5s (4.6x, ~linear).
    ``None`` = uncapped is the explicit opt-in for recall-critical runs
    on corpora whose cluster occupancy is bounded upstream; an ``int``
    pins the cap directly. The cap is deterministic either way, so the
    operator stays exactly SQL-expressible (scalar-subquery COUNT in the
    DuckDB oracle).

    Returns the SURVIVORS as ``(vec_id, cluster)``.

    Determinism/oracle story: clustering is the exact-arithmetic
    deterministic Lloyd's of operators/kmeans.py (quantized inputs,
    integer-exact centroid means), and the pair cosine follows the
    rounded-4dp convention where the DECIDING value is always
    :func:`dot_expr` -- the SEQUENTIAL fold that bit-matches DuckDB's
    list_dot_product -- because this rounded cosine GATES set
    membership: a last-ulp summation-order difference at a .xxxx5
    boundary would flip a survivor (ADVICE r7; the r8 sweep measured a
    fixture pair 9e-11 from a boundary). The whole operator therefore
    carries an exact DuckDB oracle (unrolled k-means CTEs + one
    within-cluster self-join).

    Measured dead end (r8, kept as a warning -- do not retry): an
    einsum PREFILTER with fold-verify only inside a 1e-9 band around
    the rounding-decision boundary (sound: einsum-vs-fold drift is
    ~dim * eps ~ 1.4e-14 by Cauchy-Schwarz, five orders inside the
    band; CASE WHEN evaluates the fold branch lazily) ran 0.55x --
    8.2s exact-fold vs 15.0s prefiltered at sf0.1, identical 1191
    survivors. The Arrow round trip ships both 64-dim arrays (128
    doubles) per pair to the Python worker, which costs MORE than
    interpreting the 64-term fold in the JVM; dot_pandas only wins
    when the pair relation is consumed in Python anyway or arrays are
    pre-batched. The r7->r8 bench delta on this query (1.22x
    normalized) is the price of oracle-gated exactness, not a
    recoverable einsum gap.

    Scale: one broadcast + one (cluster, dim) shuffle per k-means
    iteration, then ONE cluster-keyed self-join -- no all-pairs product
    ever forms. Norms are precomputed per vector (N evaluations, not
    2 per pair). For bulk re-scoring where the result does not gate an
    exact comparison, :func:`dot_pandas` (Arrow einsum) is the faster
    path at 100k+ pairs."""
    from .kmeans import kmeans

    assigned, _ = kmeans(vectors, k=k, iterations=iterations)
    # ONE embeddings scan: the assignment relation feeds BOTH self-join
    # sides and the final anti-join base -- un-pinned, each consumer
    # replans the scan->assign subtree (the aliased-derived-relation
    # rescan the r6 sweep eliminated registry-wide; same fix as the
    # banded minhash/simhash self-joins). The pinned relation is
    # embedding-sized -- exactly the data the self-join must hold anyway.
    assigned = assigned.transform(pin_corpus)
    sides = with_norm(assigned)
    if max_block is not None:
        if max_block == "auto":
            # Occupancy-census cap: one COUNT over the pinned assignment,
            # broadcast as a single row -- fully declarative, no driver
            # read, and the same scalar a DuckDB subquery computes.
            total = assigned.agg(F.count(F.lit(1)).alias("_tot"))
            cap = F.least(
                F.lit(AUTO_BLOCK_MAX),
                F.greatest(
                    F.lit(AUTO_BLOCK_MIN),
                    F.ceil(F.lit(2.0) * F.col("_tot") / F.lit(k)),
                ),
            )
            sides = sides.crossJoin(broadcast(total))
        else:
            cap = F.lit(int(max_block))
        # id-ordered round-robin striping: lane sizes differ by at most 1
        # and never exceed the cap (n_lanes = ceil(c_n / cap)).
        wc = Window.partitionBy("cluster").orderBy("vec_id")
        sides = (
            sides.withColumn("_rn", F.row_number().over(wc))
            .withColumn("_c_n", F.count(F.lit(1)).over(Window.partitionBy("cluster")))
            .withColumn(
                "_lane",
                (F.col("_rn") - 1) % F.ceil(F.col("_c_n") / cap).cast("int"),
            )
            .drop("_rn", "_c_n", "_tot")
        )
    else:
        sides = sides.withColumn("_lane", F.lit(0))
    a = sides.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"), "cluster", F.col("_lane").alias("lane_a"),
    )
    b = sides.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"), F.col("cluster").alias("cluster_b"),
        F.col("_lane").alias("lane_b"),
    )
    cos = duck_round(
        dot_expr(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4
    ).cast("double")
    dropped = (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b"))
            & (F.col("lane_a") == F.col("lane_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(cos >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return assigned.join(dropped, "vec_id", "left_anti").select(
        "vec_id", "cluster"
    )


def semantic_decontaminate(
    vectors: DataFrame,
    eval_ids: DataFrame,
    k: int = 8,
    iterations: int = 3,
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding-space eval-set decontamination (round 13, VERDICT r12
    #7): the :func:`semantic_dedup` cluster-then-compare machinery with
    train-vs-eval ASYMMETRIC roles -- a TRAIN vector is dropped iff some
    eval-suite member in its k-means cell sits within ``threshold``
    rounded-4dp cosine. This is the paraphrase gate the shingle-overlap
    decontaminator (q_decontaminate) structurally misses: a reworded
    eval answer shares no 16-gram but lands next to the original in
    embedding space.

    ``vectors``: ``(vec_id long, e array<double>)`` for the FULL corpus
    (train AND eval -- clustering sees both, so an eval member and its
    paraphrase land in the same cell). ``eval_ids``: a ``vec_id``
    relation marking the eval suite. Returns surviving train rows as
    ``(vec_id, cluster)``.

    Scale: clustering is the shared deterministic Lloyd's (broadcast
    centroids, (cluster, dim) shuffle per iteration); the compare join
    is cluster-keyed train x eval, NOT a self-join -- pair work is
    ``|train ∩ cell| x |eval ∩ cell|``, linear in the corpus WHEN the
    eval suite is bounded (a benchmark registry, not a crawl) -- that
    boundedness is the CALLER's contract, not something this operator
    can enforce, so the eval side carries no forced broadcast (AQE
    broadcasts a genuinely small suite from runtime stats) and callers
    feeding a corpus-fraction "eval" should grow ``k`` with the corpus
    exactly as the SemDeDup regime prescribes (per-cell pair work is
    ``~n * n_eval / k^2`` under balanced occupancy). No lane cap is
    needed for the bounded-eval case: the small side caps the per-row
    fan-out, the same argument as the ANN probe joins.

    Determinism/oracle: inherits the exact-arithmetic kmeans and the
    rounded-4dp sequential-fold cosine convention (the GATING value, so
    fold order must bit-match DuckDB), making the whole operator
    replayable as unrolled-CTE SQL."""
    from .kmeans import kmeans

    assigned, _ = kmeans(vectors, k=k, iterations=iterations)
    assigned = assigned.transform(pin_corpus)
    sides = with_norm(assigned)
    # Column contract: the first column of eval_ids IS the id column,
    # whatever its name (callers pass doc_id-named relations; the join
    # below needs vec_id).
    eval_ids = eval_ids.select(F.col(eval_ids.columns[0]).alias("vec_id"))
    # Pin the eval-id relation: it feeds the ev semi-join AND the tr
    # anti-join, and tr itself is planned twice (contaminated derives
    # from tr, then gates it) -- without the pin a caller whose eval
    # ids derive from a corpus-sized filter (the registry row filters
    # documents by source) pays that scan three times. The relation is
    # benchmark-sized, so the pin is bytes-cheap.
    eval_ids = eval_ids.localCheckpoint(eager=False)
    # NO forced broadcast on the eval side (the repo hint rule: only
    # provably bounded sides carry hints, and eval cardinality is the
    # CALLER's property -- a true benchmark suite is tiny and AQE will
    # broadcast it from runtime stats; a corpus-fraction eval slice
    # (the fixture's src0 stand-in) must be free to shuffle-join
    # instead of being forced through the driver).
    ev = sides.join(eval_ids, "vec_id", "left_semi").select(
        F.col("e").alias("ee"),
        F.col("nrm").alias("ne"),
        F.col("cluster").alias("cluster_e"),
    )
    tr = sides.join(eval_ids, "vec_id", "left_anti")
    cos = duck_round(
        dot_expr(F.col("e"), F.col("ee")) / (F.col("nrm") * F.col("ne")), 4
    ).cast("double")
    contaminated = (
        tr.join(ev, F.col("cluster") == F.col("cluster_e"))
        .filter(cos >= threshold)
        .select("vec_id")
        .distinct()
    )
    return tr.join(contaminated, "vec_id", "left_anti").select(
        "vec_id", "cluster"
    )


def decontaminate_against_eval(
    rows: DataFrame, ev: DataFrame, threshold: float = 0.35
) -> DataFrame:
    """STATELESS eval decontamination of a ``(vec_id, e array<double>)``
    relation against a prepared eval suite ``(ev_id, ee, ne)`` (id,
    double vector, precomputed norm -- see :func:`eval_suite_of`):
    keep every row whose rounded-4dp cosine stays BELOW ``threshold``
    for ALL eval members. Pure per-row expressions + one anti join with
    a bounded right side -- no aggregation, no state, so the SAME
    function serves the batch path and an ingest-time micro-batch
    stream (q_stream_semantic_decontaminate): batch == stream by
    construction, the q_stream_quality_filter contract.

    This is the UNCLUSTERED gate: per arriving row the work is
    ``|eval|`` dots (the suite is benchmark-bounded -- the caller's
    contract, as in :func:`semantic_decontaminate`), which is the right
    trade at ingest where rows arrive continuously and no corpus-wide
    k-means exists yet; the batch operator's cluster restriction is the
    bulk-backfill optimization of the same predicate. The eval side is
    explicitly broadcast: at ingest the suite is pinned-in-memory small
    by definition (it rides every micro-batch), unlike the batch
    operator's caller-sized eval relation."""
    sides = with_norm(rows)
    cos = duck_round(
        dot_expr(F.col("e"), F.col("ee")) / (F.col("nrm") * F.col("ne")), 4
    ).cast("double")
    return sides.join(broadcast(ev), cos >= threshold, "left_anti").drop(
        "nrm"
    )


def eval_suite_of(vectors: DataFrame, eval_ids: DataFrame) -> DataFrame:
    """Prepare the broadcastable eval suite for
    :func:`decontaminate_against_eval`: join the id relation (first
    column = id, the semantic_decontaminate column contract) to the
    vector relation ``(vec_id, e)``, precompute norms once."""
    eval_ids = eval_ids.select(F.col(eval_ids.columns[0]).alias("vec_id"))
    return with_norm(vectors.join(eval_ids, "vec_id", "left_semi")).select(
        F.col("vec_id").alias("ev_id"),
        F.col("e").alias("ee"),
        F.col("nrm").alias("ne"),
    )
