"""Content-realistic ~sf1 fixture by FRESH SAMPLING (VERDICT r8 #4).

The r8 two-decade scaling runs used key-offset REPLICATION (10x sf0.1
with per-copy suffixes/perturbations), which PLANS.md itself flags as
adversarial for two of the conclusions drawn from it:

- id-striping: every replicated vector's 9 near-twins sit exactly 1e6
  ids apart, so the max_block round-robin lanes separate precisely the
  pairs that matter -- the measured recall cost of the cap (10,983 vs
  1,191 survivors) is a worst case, not an estimate;
- occupancy: the replicated corpus has only ~2k natural directions, so
  growing k cannot shrink clusters -- the "k-growth doesn't help"
  conclusion is a property of the generator, not of scale.

This script regenerates every table at 10x sf0.1 row counts by sampling
the SAME generative processes the driver fixture exhibits (measured
marginals documented inline), with fresh RNG (seed 20260815): new ids,
organic near-dup placement (a dup copies a uniformly random EARLIER doc,
so id gaps are uniform -- matching the sf0.1 observed gaps 166..2050),
and naturally-growing embedding directions (isotropic residuals: at 10x
rows the near-neighbor order statistics shift up organically instead of
replicating). NOT for correctness grading -- it exists so the scaling
table and the semantic-dedup k-vs-cap trade are measured on data shaped
like production, not like a replication artifact.

Measured sf0.1 marginals mirrored here:
- documents: 5,000 rows; 30-word vocab bag-of-words, n_words ~ U[10,100];
  lang {en:41%, zh/es/fr/de ~15%}; 20 uniform sources (catalog FIXED
  across scale: same pipeline, more docs per source); 5% near-dups
  (copy + one inserted 'dup' token), 0.16% exact dups.
- embeddings: 2,000 rows; 64-dim; 10 ~uniform labels; center norm ~0.07,
  residual ~N(0, 0.125) per dim (pairwise cosines concentrate ~N(0,1/8),
  97.75% of vectors have a >=0.35-cosine neighbor at n=2000 -- an order
  statistic that must GROW with n, which replication cannot produce);
  plus 2% planted near-twins (copy of a random earlier vector +
  N(0, 0.02) perturbation, cosine ~0.99) at uniform id gaps.
- TPC-H-ish star: uniform keys, empirical per-order lineitem counts,
  enums at observed frequencies, same value ranges.

Output: .scratch/sf1r/<table>.parquet (region/nation copied verbatim).
Run: python make_sf1.py [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815
SRC = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.145, 0.145]
ADJ = ["new", "red", "blue", "old", "cold", "large", "hot", "small"]
NOUN = ["gizmo", "bolt", "plate", "rod", "widget", "anvil", "ring", "gear"]
TYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
SEGS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["signup", "click", "purchase", "error", "view"]
# empirical per-order lineitem-count distribution at sf0.1
LI_CNT = np.arange(1, 18)
LI_P = np.array(
    [11016, 21814, 29500, 29097, 23631, 15625, 8941, 4407, 1959, 818,
     292, 93, 29, 10, 1, 2, 1],
    dtype=np.float64,
)
LI_P /= LI_P.sum()


def _ts_day(rng, n, lo_days, hi_days, epoch="1995-01-01"):
    days = rng.integers(lo_days, hi_days, n)
    base = np.datetime64(epoch)
    return (base + days.astype("timedelta64[D]")).astype("datetime64[us]")


def documents(rng, n):
    n_words = rng.integers(10, 101, n)
    langs = rng.choice(len(LANGS), n, p=LANG_P)
    is_exact = rng.random(n) < 0.0016
    is_near = (~is_exact) & (rng.random(n) < 0.05)
    texts: list[str] = []
    for i in range(n):
        if i > 0 and is_exact[i]:
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 0 and is_near[i]:
            src = texts[rng.integers(0, i)].split(" ")
            pos = rng.integers(0, len(src) + 1)
            texts.append(" ".join(src[:pos] + ["dup"] + src[pos:]))
            continue
        idx = rng.integers(0, len(VOCAB), n_words[i])
        texts.append(" ".join(VOCAB[j] for j in idx))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[j] for j in langs]),
            "source": pa.array([f"src{i % 20}" for i in rng.permutation(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def embeddings(rng, n, dim=64, n_labels=10):
    centers = rng.normal(0, 1, (n_labels, dim))
    centers *= 0.07 / np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, n)
    E = centers[labels] + rng.normal(0, 0.125, (n, dim))
    near = np.where((np.arange(n) > 0) & (rng.random(n) < 0.02))[0]
    for i in near:
        j = rng.integers(0, i)
        E[i] = E[j] + rng.normal(0, 0.02, dim)
        labels[i] = labels[j]
    E32 = E.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(E32), pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def star_schema(rng, mult=10, grow_pools=False):
    """``grow_pools`` scales the part-name pools ~sqrt(mult): the two
    blocking-data regimes for entity resolution. FIXED pools (the
    driver's own cross-SF convention -- 64 names at every SF) mean block
    occupancy grows linearly with the catalog and the blocked pair work
    grows quadratically; GROWN pools hold the block-size distribution
    ~stationary (a catalog with more products has more name variety).
    Both are real regimes; make_sf1.py generates either so the r9
    scaling table can price them separately instead of letting the
    generator silently pick the conclusion (the r8 replication trap)."""
    adj, noun = list(ADJ), list(NOUN)
    if grow_pools:
        k = max(1, round(len(ADJ) * (mult ** 0.5))) - len(ADJ)
        adj += [f"adj{i}" for i in range(k)]
        noun += [f"noun{i}" for i in range(k)]
    n_supp, n_cust, n_part, n_ord = 1000 * mult, 15000 * mult, 20000 * mult, 150000 * mult
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()),
            "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()),
            "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
            "c_mktsegment": pa.array([SEGS[j] for j in rng.integers(0, 5, n_cust)]),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": pa.array(
                [
                    f"{adj[a]} {noun[b]}"
                    for a, b in zip(
                        rng.integers(0, len(adj), n_part),
                        rng.integers(0, len(noun), n_part),
                    )
                ]
            ),
            "p_brand": pa.array([f"Brand#{j}" for j in rng.integers(1, 26, n_part)]),
            "p_type": pa.array([TYPES[j] for j in rng.integers(0, 6, n_part)]),
            "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32), pa.int32()),
            "p_retailprice": pa.array(np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 1)),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
            "o_orderstatus": pa.array(
                [["O", "P", "F"][j] for j in rng.integers(0, 3, n_ord)]
            ),
            "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2)),
            "o_orderdate": pa.array(_ts_day(rng, n_ord, 0, 2404)),
            "o_orderpriority": pa.array([PRIO[j] for j in rng.integers(0, 5, n_ord)]),
        }
    )
    cnts = rng.choice(LI_CNT, n_ord, p=LI_P)
    n_li = int(cnts.sum())
    l_orderkey = np.repeat(np.arange(n_ord), cnts)
    seq_in_order = np.arange(n_li) - np.repeat(np.cumsum(cnts) - cnts, cnts)
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(l_orderkey, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
            "l_linenumber": pa.array((seq_in_order % 7 + 1).astype(np.int32), pa.int32()),
            "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
            "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
            "l_returnflag": pa.array([["A", "N", "R"][j] for j in rng.integers(0, 3, n_li)]),
            "l_linestatus": pa.array([["O", "F"][j] for j in rng.integers(0, 2, n_li)]),
            "l_shipdate": pa.array(_ts_day(rng, n_li, 1, 2500)),
        }
    )
    return supplier, customer, part, orders, lineitem


def events(rng, n, n_users):
    # same 30-day window, 10x density: the "same period, more traffic"
    # scenario (keeps decay/window semantics comparable across SFs)
    us = np.sort(rng.integers(0, 30 * 86400 * 1_000_000, n))
    base = np.datetime64("2024-01-01", "us")
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(base + us.astype("timedelta64[us]")),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array([ETYPES[j] for j in rng.integers(0, 5, n)]),
            "value": pa.array(np.round(rng.uniform(0, 560, n), 2)),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)]
            ),
        }
    )


def main() -> None:
    grow = "--grow-pools" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch",
        "sf1rg" if grow else "sf1r",
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    pq.write_table(documents(rng, 50_000), f"{out}/documents.parquet")
    pq.write_table(embeddings(rng, 20_000), f"{out}/embeddings.parquet")
    supplier, customer, part, orders, lineitem = star_schema(
        rng, mult=10, grow_pools=grow
    )
    for name, tbl in (
        ("supplier", supplier), ("customer", customer), ("part", part),
        ("orders", orders), ("lineitem", lineitem),
    ):
        pq.write_table(tbl, f"{out}/{name}.parquet")
    pq.write_table(events(rng, 1_000_000, 15_000), f"{out}/events.parquet")
    print(out)


if __name__ == "__main__":
    main()
