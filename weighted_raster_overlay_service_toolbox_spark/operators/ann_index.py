"""Persisted IVFPQ serving index: train once, serve many.

q_ann_ivfpq demonstrates the IVFADC *algorithm* end-to-end, but it
retrains the codebooks inside every query -- the right shape for an
oracle-backed registry row, the wrong one for serving. This module is
the production split (Jegou et al. 2011 deployment posture):

- :func:`build_ivfpq_index` runs the training ONCE and writes three
  parquet relations + a manifest:

  * ``codes/``    -- (vec_id, m, code) partitioned by **bucket**: the
    serving scan, 1 byte of code per subspace per vector, and the
    hive partitioning turns IVF's "which rows" pruning into literal
    directory-level partition pruning (a 1-probe search reads 5 of 16
    bucket dirs and Spark shows it as PartitionFilters);
  * ``codebook/`` -- (m, cluster, ce): m*k rows, broadcast at serve;
  * ``vectors/``  -- (vec_id, e): the full 1e-6-quantized vectors,
    touched ONLY by the shortlist re-rank (25 x 40 rows per query).

- :func:`ivfpq_search` answers probes against the stored index with
  the exact q_ann_ivfpq arithmetic (integer micro-unit ADC, shortlist,
  exact re-rank -- every rank gate BIGINT with vec_id tiebreak), so
  ``search(build(emb)) == q_ann_ivfpq`` bit-for-bit
  (tests/test_ann_index.py pins the equivalence and that serving
  never re-trains).

- :func:`extend_ivfpq_index` grows the corpus against the FROZEN
  codebook (parquet append, bit-identical encoding), and
  :func:`ivfpq_drift_probe` is the retrain trigger that closes the
  lifecycle: compare a new sample's mean ADC quantization residual to
  the manifest's build-time baseline; past the threshold, the codebook
  no longer fits the distribution -- rebuild.

Scale: at 100 TB the build is a periodic batch job (train on a sample,
encode the corpus -- one broadcast join per subspace batch); serving
reads code bytes + two broadcasts per query batch. The codes relation
is ~128x smaller than the embedding column, and bucket partitioning
adds partition pruning on top -- the two multiplicative I/O cuts IVFPQ
exists for.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.rounding import duck_round
from .similarity import dot_expr, hyperplane_bucket

MANIFEST = "_index.json"


def build_ivfpq_index(
    emb: DataFrame,
    out_dir: str,
    m: int = 16,
    sub: int = 4,
    k: int = 64,
    iterations: int = 3,
    n_planes: int = 4,
) -> dict:
    """Train PQ codebooks + assign IVF buckets over ``emb`` (vec_id,
    e array<double>, already-raw -- quantization happens here) and
    persist the three serving relations under ``out_dir``. Returns the
    manifest dict (also written as ``_index.json``)."""
    from .kmeans import kmeans_grouped_codebook_assign, quantize_vec

    emb = emb.select("vec_id", quantize_vec("e").alias("e"))
    pinned = emb.localCheckpoint(eager=False)
    vb = hyperplane_bucket(pinned, n_planes=n_planes)
    vm = _subspace_split(pinned, m, sub)
    codes_full, cents = kmeans_grouped_codebook_assign(
        vm, k=k, iterations=iterations
    )
    codes = (
        codes_full.select("vec_id", "m", F.col("cluster").alias("code"))
        .join(vb.select("vec_id", "bucket"), "vec_id")
    )
    # training-residual baseline for ivfpq_drift_probe: mean ADC
    # quantization residual of the corpus the codebook was fit to
    # (one frozen-assignment pass against the FINAL codebook --
    # codes_full's assignment distances are iteration-internal).
    # Computed BEFORE any file lands in out_dir (r13 review): an empty
    # training frame must fail cleanly here, not after writing
    # index-shaped directories with no manifest (a later ivfpq_search
    # on that husk would die on an opaque missing-manifest error).
    res = (
        _assign_frozen(vm, cents)
        .groupBy("vec_id")
        .agg(F.sum("d2u").alias("ru"))
        .agg(
            F.sum("ru").cast("long").alias("total_u"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()[0]
    )
    if res["n"] == 0 or res["total_u"] is None:
        raise ValueError(
            "build_ivfpq_index: training set is empty -- emb produced "
            "no vectors to fit the codebook/residual baseline on"
        )
    os.makedirs(out_dir, exist_ok=True)
    codes.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(out_dir, "codes"))
    cents.write.mode("overwrite").parquet(os.path.join(out_dir, "codebook"))
    pinned.write.mode("overwrite").parquet(os.path.join(out_dir, "vectors"))
    manifest = {
        "m": m, "sub": sub, "k": k, "iterations": iterations,
        "n_planes": n_planes,
        "train_residual_total_u": int(res["total_u"]),
        "train_residual_n": int(res["n"]),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def ivfpq_search(
    spark: SparkSession,
    index_dir: str,
    probes: DataFrame,
    topk: int = 3,
    shortlist: int = 40,
) -> DataFrame:
    """Top-``topk`` neighbors per probe from a persisted index --
    NO training, no embedding-column scan outside the re-rank.

    ``probes``: (probe_id long, e array<double>) raw probe vectors
    (quantized here with the index's convention). Returns (probe_id,
    vec_id, rnk, d2) -- the q_ann_ivfpq schema; against an index built
    from the same corpus with the registry knobs the rows are
    bit-identical (the equivalence test).

    Plan shape: the codes scan carries a ``bucket IN (...)`` predicate
    over the union of the probes' multi-probe sets -- PartitionFilters
    on the hive layout, so few-probe searches read few bucket dirs;
    ADC is one integer agg keyed (probe, vec); only the
    probes x shortlist survivors rejoin the vectors relation."""
    from .kmeans import quantize_vec

    with open(os.path.join(index_dir, MANIFEST)) as f:
        mf = json.load(f)
    m, sub, n_planes = mf["m"], mf["sub"], mf["n_planes"]

    probes = probes.select(
        F.col("probe_id"), quantize_vec("e").alias("e")
    )
    pb = hyperplane_bucket(probes, n_planes=n_planes)
    probe_buckets = pb.select(
        "probe_id",
        F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        ).alias("pbs"),
    )
    # driver-side union of the multi-probe sets: a tiny literal IN-list
    # that reaches the codes scan as a partition filter. Probe sets are
    # per-query-bounded (the serving contract), never corpus-sized.
    wanted = sorted(
        {
            b
            for row in probe_buckets.select("pbs").collect()
            for b in row.pbs
        }
    )
    codes = (
        spark.read.parquet(os.path.join(index_dir, "codes"))
        .filter(F.col("bucket").isin(wanted))
    )
    cents = spark.read.parquet(os.path.join(index_dir, "codebook"))
    cand = codes.select("vec_id", "bucket", "m", "code").join(
        broadcast(probe_buckets),
        F.array_contains(F.col("pbs"), F.col("bucket"))
        & (F.col("vec_id") != F.col("probe_id")),
    )
    probe_subs = pb.select(
        F.col("probe_id").alias("pp"),
        F.posexplode(
            F.array(*[
                F.slice("e", j * sub + 1, sub) for j in range(m)
            ])
        ).alias("pm", "q"),
    )
    pd2 = (
        dot_expr(F.col("q"), F.col("q"))
        - 2 * dot_expr(F.col("q"), F.col("ce"))
        + dot_expr(F.col("ce"), F.col("ce"))
    )
    cents_a = cents.select(
        F.col("m").alias("cm"), F.col("cluster"), F.col("ce")
    )
    pj = (
        cand.join(
            broadcast(cents_a),
            (F.col("m") == F.col("cm")) & (F.col("code") == F.col("cluster")),
        )
        .join(
            broadcast(probe_subs),
            (F.col("m") == F.col("pm")) & (F.col("probe_id") == F.col("pp")),
        )
        .select(
            "probe_id",
            "vec_id",
            duck_round(pd2 * F.lit(1_000_000.0)).cast("long").alias("pd2_u"),
        )
    )
    tot = pj.groupBy("probe_id", "vec_id").agg(
        F.sum("pd2_u").cast("long").alias("d2u")
    )
    w = Window.partitionBy("probe_id").orderBy("d2u", "vec_id")
    sl = (
        tot.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= shortlist)
        .select("probe_id", "vec_id")
    )
    vectors = spark.read.parquet(os.path.join(index_dir, "vectors"))
    pf = probes.select(F.col("probe_id").alias("rp"), F.col("e").alias("pe"))
    ed2 = (
        dot_expr(F.col("pe"), F.col("pe"))
        - 2 * dot_expr(F.col("pe"), F.col("e"))
        + dot_expr(F.col("e"), F.col("e"))
    )
    rr = (
        vectors.join(broadcast(sl), "vec_id")
        .join(broadcast(pf), F.col("probe_id") == F.col("rp"))
        .select(
            "probe_id",
            "vec_id",
            duck_round(ed2 * F.lit(1_000_000.0)).cast("long").alias("d2e_u"),
        )
    )
    wr = Window.partitionBy("probe_id").orderBy("d2e_u", "vec_id")
    return (
        rr.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= topk)
        .select(
            "probe_id",
            "vec_id",
            F.col("rnk").cast("int").alias("rnk"),
            (F.col("d2e_u") / F.lit(1_000_000.0)).cast("double").alias("d2"),
        )
    )


def _subspace_split(pinned: DataFrame, m: int, sub: int) -> DataFrame:
    """(vec_id, e) -> (vec_id, m, e-sub): the PQ subspace melt both the
    build and every frozen-codebook pass share.

    r14 (optimization round, guide section 2.4): ONE posexplode pass
    over an array of the m slices instead of an m-branch unionAll --
    the union read the pinned relation m times (m plan branches, m
    passes at runtime) where the explode reads it once and emits the
    same (vec_id, m, slice) rows. posexplode's 0-based position IS the
    subspace index, so values are identical; downstream consumers key
    every aggregation/window on (m, ...) and are row-order-independent."""
    slices = ", ".join(f"slice(e, {j * sub + 1}, {sub})" for j in range(m))
    return pinned.select(
        "vec_id", F.posexplode(F.expr(f"array({slices})")).alias("m", "e")
    )


def _assign_frozen(vm: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment of subspace slices against a FROZEN
    codebook: (vec_id, m, code, d2u) where d2u is the quantization
    residual in integer micro-units (duck_round(d2 * 1e6) -- the ADC
    unit, so residual bookkeeping is commutative-exact). The scoring
    expressions are kmeans_grouped_codebook_assign's verbatim (hoisted
    self-dots, expanded-identity distance, (d2, cluster) struct-min
    tiebreak): encoding must be bit-identical to training-time
    assignment or ADC distances silently bias."""
    v = vm.withColumn("_vv", dot_expr("e", "e"))
    c = cents.withColumnRenamed("m", "_g").withColumn(
        "_cc", dot_expr("ce", "ce")
    )
    scored = v.join(broadcast(c), F.col("m") == F.col("_g")).select(
        "vec_id",
        "m",
        "cluster",
        (
            F.col("_vv")
            - 2 * dot_expr(F.col("e"), F.col("ce"))
            + F.col("_cc")
        ).alias("d2"),
    )
    return (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "cluster")).alias("best"))
        .select(
            "vec_id",
            "m",
            F.col("best.cluster").alias("code"),
            duck_round(F.col("best.d2") * F.lit(1_000_000.0))
            .cast("long")
            .alias("d2u"),
        )
    )


def ivfpq_drift_probe(
    spark: SparkSession,
    index_dir: str,
    sample_emb: DataFrame,
    retrain_ratio: float = 2.0,
) -> dict:
    """Cheap drift detector for the frozen codebook (the retrain
    trigger ``extend_ivfpq_index``'s docstring names): encode a SAMPLE
    of newly-arriving vectors against the stored codebook and compare
    their mean quantization residual (sum over subspaces of the
    vector-to-assigned-centroid ADC distance, integer micro-units) to
    the training corpus's mean residual recorded in the manifest at
    build time.

    A codebook quantizes the distribution it was trained on; when the
    embedding distribution drifts (new encoder checkpoint, new domain
    mix), new vectors land FAR from every centroid and their residual
    inflates -- recall decays for exactly the rows the index was
    extended with. Returns ``{"train_mean_residual_u",
    "sample_mean_residual_u", "ratio", "needs_retrain"}``;
    ``needs_retrain`` fires when ratio > ``retrain_ratio``.

    Threshold rationale: the baseline is IN-SAMPLE (the codebook was
    fit to exactly those vectors), so it is optimistic by construction
    -- even a same-distribution sample probes somewhat above 1.0 (the
    k-means generalization gap; ~1.5x on the small fixtures, smaller
    as corpus/k grows). The default 2.0 therefore reads as "new
    vectors sit twice as far from their centroids as training data
    did": past any generalization gap, and the regime where the PQ
    shortlist starts missing true neighbors (the re-rank can only fix
    what the shortlist retains). Deployments wanting a tight trigger
    calibrate empirically: probe a held-out same-distribution sample
    right after build and set the threshold a margin above THAT ratio.
    Production cadence: run the probe on each ingest window's sample;
    on fire, retrain via :func:`build_ivfpq_index` on fresh data and
    re-encode (the codes relation is rebuilt; the vectors relation is
    reusable as-is).

    Cost: one broadcast join over |sample| x m rows + one agg -- no
    index I/O beyond the m*k-row codebook."""
    from .kmeans import quantize_vec

    with open(os.path.join(index_dir, MANIFEST)) as f:
        mf = json.load(f)
    m, sub = mf["m"], mf["sub"]
    train_mean = mf["train_residual_total_u"] / mf["train_residual_n"]

    emb = sample_emb.select("vec_id", quantize_vec("e").alias("e"))
    vm = _subspace_split(emb.localCheckpoint(eager=False), m, sub)
    cents = spark.read.parquet(os.path.join(index_dir, "codebook"))
    row = (
        _assign_frozen(vm, cents)
        .groupBy("vec_id")
        .agg(F.sum("d2u").alias("ru"))
        .agg(
            F.sum("ru").cast("long").alias("total_u"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()[0]
    )
    if row["n"] == 0 or row["total_u"] is None:
        raise ValueError(
            "ivfpq_drift_probe: sample_emb is empty -- the probe needs "
            "at least one vector to compare against the training "
            "residual baseline"
        )
    sample_mean = row["total_u"] / row["n"]
    ratio = sample_mean / train_mean if train_mean else float("inf")
    return {
        "train_mean_residual_u": train_mean,
        "sample_mean_residual_u": sample_mean,
        "ratio": ratio,
        "needs_retrain": ratio > retrain_ratio,
    }


def extend_ivfpq_index(
    spark: SparkSession, index_dir: str, new_emb: DataFrame
) -> None:
    """Encode NEW vectors against the FROZEN codebook and append them to
    the index -- the production cadence: codebooks retrain rarely (when
    the embedding distribution drifts), while the corpus grows every
    ingest window. Appending = per-subspace nearest-centroid assignment
    (the exact kmeans fold arithmetic, against the STORED codebook -- no
    training step), sign-LSH bucketing, and parquet APPEND into the
    bucket-partitioned codes/ plus vectors/ -- existing files are never
    rewritten (tests/test_ann_index.py pins that, and that a duplicate
    of an indexed vector encodes to identical codes and becomes its
    probe's rank-1 neighbor immediately after the append).

    ``new_emb``: (vec_id, e array<double>) with vec_ids disjoint from
    the indexed corpus (caller's contract, same as any append sink)."""
    from .kmeans import quantize_vec

    with open(os.path.join(index_dir, MANIFEST)) as f:
        mf = json.load(f)
    m, sub, n_planes = mf["m"], mf["sub"], mf["n_planes"]

    emb = new_emb.select("vec_id", quantize_vec("e").alias("e"))
    pinned = emb.localCheckpoint(eager=False)
    vb = hyperplane_bucket(pinned, n_planes=n_planes)
    vm = _subspace_split(pinned, m, sub)
    cents = spark.read.parquet(os.path.join(index_dir, "codebook"))
    # frozen-codebook assignment (shared with ivfpq_drift_probe):
    # bit-identical to training-time assignment by construction.
    codes = (
        _assign_frozen(vm, cents)
        .select("vec_id", "m", "code")
        .join(vb.select("vec_id", "bucket"), "vec_id")
    )
    codes.repartition("bucket").write.mode("append").partitionBy(
        "bucket"
    ).parquet(os.path.join(index_dir, "codes"))
    pinned.write.mode("append").parquet(os.path.join(index_dir, "vectors"))
