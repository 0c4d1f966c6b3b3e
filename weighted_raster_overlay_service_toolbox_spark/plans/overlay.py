"""The weighted-overlay execution the catalog parameterizes -- the
reference's downstream service computation as a library call.

The reference toolbox only PREPARES the catalog; the overlay itself runs
in Esri's image server (``README.md:9-11, 22-26``): each layer's cell
values remap through its half-open ranges to suitability 0-9, the user
weights the layers, and NoData ranges knock cells out
(``UpdateWROClassification.pyt.xml:2``, ``UpdateWROLayerInfo.pyt.xml:2``).
:func:`run_overlay` executes exactly that from a catalog DataFrame:

1. decode each catalog row's CSV classification (InputRanges /
   OutputValues / NoDataRanges, ``.pyt:161-175``) -- catalog rows are
   classification METADATA (a handful), so the collect is driver-side
   by design, never data-sized;
2. build per-layer remap CASE chains and NoData tests as column
   expressions (JVM-side, codegen);
3. one shuffle on cell_id pivots remapped layers wide (conditional max,
   not a generic pivot) and applies  sum(w_i * suit_i)  with the knockout
   guard.

Scale: the only data-sized move is the cell_id shuffle; at 100 TB the
cell table is bucketed by cell_id and the shuffle disappears. Weights and
classifications ride along as literals inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ranges import RangeTriple, in_any_range, remap_case


def decode_catalog_row(row) -> tuple[list[RangeTriple], list[tuple[float, float]]]:
    """Parse one catalog row's CSV classification (``.pyt:161-175``):
    flat bound pairs + parallel outputs -> (lo, hi, out) triples, plus
    NoData (lo, hi) pairs."""
    bounds = [float(x) for x in row["InputRanges"].split(",")]
    outs = [int(x) for x in row["OutputValues"].split(",")]
    ranges = [
        (bounds[2 * i], bounds[2 * i + 1], outs[i]) for i in range(len(outs))
    ]
    nodata: list[tuple[float, float]] = []
    if row["NoDataRanges"]:
        nd = [float(x) for x in row["NoDataRanges"].split(",")]
        nodata = [(nd[2 * i], nd[2 * i + 1]) for i in range(len(nd) // 2)]
    return ranges, nodata


def run_overlay(
    cells_df: DataFrame,
    catalog_df: DataFrame,
    weights: dict[str, float],
) -> DataFrame:
    """Execute the weighted overlay: ``cells_df`` is the long cell table
    (``layer, cell_id, value``), ``catalog_df`` carries the CSV-encoded
    classifications keyed by ``Name``, ``weights`` maps layer name ->
    weight. Returns ``cell_id, score`` with NULL score for knocked-out
    cells (R39 + R40 + R41)."""
    meta = {
        r["Name"]: decode_catalog_row(r)
        for r in catalog_df.select(
            "Name", "InputRanges", "OutputValues", "NoDataRanges"
        ).collect()
        if r["Name"] in weights
    }
    missing = set(weights) - set(meta)
    if missing:
        raise KeyError(f"weights reference unknown catalog layers: {sorted(missing)}")

    layer = F.col("layer")
    value = F.col("value")
    suit: Column = F.lit(None).cast("int")
    knocked: Column = F.lit(False)
    for name, (ranges, nodata) in meta.items():
        suit = F.when(layer == name, remap_case(value, ranges)).otherwise(suit)
        if nodata:
            knocked = knocked | ((layer == name) & in_any_range(value, nodata))

    scored = cells_df.filter(layer.isin(*meta.keys())).select(
        "cell_id", layer.alias("layer"), suit.alias("suit"), knocked.alias("knocked")
    )
    wide = scored.groupBy("cell_id").agg(
        *[
            F.max(F.when(F.col("layer") == name, F.col("suit"))).alias(f"s_{i}")
            for i, name in enumerate(meta)
        ],
        F.max(F.when(F.col("knocked"), 1).otherwise(0)).alias("any_knockout"),
    )
    score = None
    for i, name in enumerate(meta):
        term = F.lit(weights[name]) * F.col(f"s_{i}")
        score = term if score is None else score + term
    return wide.select(
        "cell_id",
        F.when(F.col("any_knockout") == 1, F.lit(None).cast("double"))
        .otherwise(score)
        .alias("score"),
    )
