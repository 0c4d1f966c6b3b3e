"""The reference's three tools as a DataFrame-native library API
(SURVEY.md section 3 "Engine lifecycle (target design)").

The reference is an ArcGIS Python Toolbox with three tools
(``WROS/Weighted Raster Overlay Service.pyt:35-39``); a user drives them
through UI parameters and geodatabase cursors. Here each tool is a pure
function: DataFrames in, (result DataFrame, errors DataFrame) out --
validation messages become error rows instead of UI messages, and every
step is a Catalyst plan (no driver-side loops over data).

- :func:`create_wro_catalog`  ~ CreateWeightedOverlayMosaic (``.pyt:570-1303``)
- :func:`update_classification` ~ UpdateWROClassification (``.pyt:41-343``)
- :func:`update_layer_info`   ~ UpdateWROLayerInfo (``.pyt:345-567``)

Catalog schema mirrors ``.pyt:592-603`` (TEXT columns carrying RFC-4180
CSV classification strings, system ``Name`` key used in every where
clause, ``.pyt:151, 873``).

Scale posture: the catalog is layer-metadata-sized (broadcast-small at any
data scale); only cell statistics touch data-sized tables, and those are
single groupBy aggregations with map-side partials. Keyed updates are
``CASE WHEN`` column overrides on the catalog -- at 100 TB the catalog is
still tiny; the expensive side (stats) shuffles once on layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .functions.csvcodec import csv_encode
from .functions.ranges import (
    DEFAULT_INPUT_RANGES,
    DEFAULT_OUTPUT_VALUES,
    DEFAULT_RANGE_LABELS,
    class_break_ranges,
    consecutive_pair_ranges,
    contiguity_errors,
    ranges_to_csv,
    ranges_to_labels,
    unique_value_ranges_expr,
)

#: catalog columns added by DDL in the reference (``.pyt:592-603``) plus
#: the mosaic's system Name key.
CATALOG_COLUMNS = [
    "Name", "Title", "Description", "Url", "InputRanges", "NoDataRanges",
    "RangeLabels", "NoDataRangeLabels", "OutputValues", "Metadata",
    "dataset_id",
]

#: dataset-name characters the reference rejects (``.pyt:677-681``).
_BAD_NAME_CHARS = r"[ ~`!@#$%^&*(){}\[\]\-+=<>,.?|]"

#: default suitability outputs / labels (``.pyt:1279-1280``).
DEFAULT_OUTPUTS = [1, 3, 5, 7, 9]
DEFAULT_LABELS = ["Very Low", "Low", "Medium", "High", "Very High"]


def _err(spark: SparkSession, rows: list[tuple[str, str, str]]) -> DataFrame:
    return spark.createDataFrame(
        rows, "severity string, code string, message string"
    )


def _no_errors(spark: SparkSession) -> DataFrame:
    return _err(spark, [])


# --------------------------------------------------------------------------
# Tool 1: CreateWeightedOverlayMosaic
# --------------------------------------------------------------------------


def create_wro_catalog(
    layers_df: DataFrame, cells_df: DataFrame, n_classes: int = 5
) -> tuple[DataFrame, DataFrame]:
    """Build a WRO catalog from layer metadata + cell values.

    ``layers_df``: one row per raster layer -- ``name string, title
    string`` plus OPTIONAL classification-source columns driving the
    reference's R15 dispatch (``.pyt:1233-1256``):

    - ``source_type string``: ``'VECTOR_UV'``/``'MAGDIR'`` layers are
      skipped with a warning (``.pyt:1246-1249``);
    - ``unique_values array<double>``: unique-value colorizer -> R18
      consecutive ranges with terminal +1 (``.pyt:1012-1114``);
    - ``breaks array<double>``: classify-colorizer upper bounds -> R17
      ranges ``[min,u1)...[u_{k-1},u_k+1)`` with all-5 outputs
      (``.pyt:941-1008``, outputs ``.pyt:968-971``);
    - neither: R16 equal-interval from cell statistics
      (``.pyt:895-938``); when the layer has NO cells at all, the R38
      hardcoded default classification applies with a warning
      (``.pyt:1268, 1279-1280``).

    (The filter pipeline R23 is assumed applied upstream by the caller;
    it is plain ``.filter`` chaining, ``.pyt:710-745``.)
    ``cells_df``: long cell table ``layer string, cell_id, value double``.

    Pipeline (mirrors ``execute``, ``.pyt:690-893``):
    1. duplicate-name rejection (R22, ``.pyt:738-740, 1151-1155``) and
       name character validation (R28, ``.pyt:677-681``) -> error rows;
    2. per-layer min/max statistics (R13, ``.pyt:897-900``);
    3. classification dispatch as above; degenerate min==max -> single
       range ``[v, v+1)`` (``.pyt:913-926``) with output "5" and label
       "Medium" (deliberate deviation: the reference emits 5 outputs for
       1 range there, writing inconsistent parallel lists --
       ``.pyt:1278-1280`` -- documented, not replicated);
    4. CSV-encode ranges/outputs/labels into the catalog TEXT columns
       (R31, ``.pyt:1119-1138, 1308-1325``), labels "a to b"
       (``.pyt:994-1002``).

    Returns ``(catalog_df, errors_df)``; offending layers are dropped
    from the catalog, mirroring the reference's skip-with-warning flow.
    """
    spark = layers_df.sparkSession

    dups = (
        layers_df.groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(
            F.lit("error").alias("severity"),
            F.lit("duplicate_name").alias("code"),
            F.concat(F.lit("duplicate layer name: "), F.col("name")).alias("message"),
        )
    )
    badchar = layers_df.filter(F.col("name").rlike(_BAD_NAME_CHARS)).select(
        F.lit("error").alias("severity"),
        F.lit("invalid_name").alias("code"),
        F.concat(F.lit("invalid characters in name: "), F.col("name")).alias("message"),
    )
    errors = dups.unionByName(badchar)

    bad_names = (
        layers_df.groupBy("name").agg(F.count(F.lit(1)).alias("n")).filter("n > 1")
        .select("name")
        .unionByName(layers_df.filter(F.col("name").rlike(_BAD_NAME_CHARS)).select("name"))
    )
    ok_layers = layers_df.join(broadcast(bad_names), "name", "left_anti")

    # optional dispatch columns default to null when absent
    for opt, typ in (
        ("source_type", "string"),
        ("breaks", "array<double>"),
        ("unique_values", "array<double>"),
    ):
        if opt not in ok_layers.columns:
            ok_layers = ok_layers.withColumn(opt, F.lit(None).cast(typ))

    skipped = ok_layers.filter(
        F.col("source_type").isin("VECTOR_UV", "MAGDIR")
    ).select(
        F.lit("warning").alias("severity"),
        F.lit("skipped_source_type").alias("code"),
        F.concat(
            F.lit("layer skipped (source type): "), F.col("name")
        ).alias("message"),
    )
    errors = errors.unionByName(skipped)
    ok_layers = ok_layers.filter(
        ~F.coalesce(
            F.col("source_type").isin("VECTOR_UV", "MAGDIR"), F.lit(False)
        )
    )

    stats = cells_df.groupBy(F.col("layer").alias("name")).agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )

    # R15 dispatch: unique values (R18) > class breaks (R17) > equal
    # interval from stats (R16) > hardcoded default (R38, no cells)
    width = (F.col("mx") - F.col("mn")) / F.lit(n_classes)
    degenerate = F.col("mx") == F.col("mn")
    linspace = F.array(
        *[F.col("mn") + F.lit(i) * width for i in range(n_classes)],
        F.col("mx") + F.lit(1.0),
    )
    equal_pairs = F.when(
        degenerate,
        F.array(F.struct(F.col("mn").alias("lo"), (F.col("mn") + 1).alias("hi"))),
    ).otherwise(consecutive_pair_ranges(linspace))

    pairs = (
        F.when(F.col("unique_values").isNotNull(),
               unique_value_ranges_expr(F.col("unique_values")))
        .when(F.col("breaks").isNotNull() & F.col("mn").isNotNull(),
              class_break_ranges(F.col("mn"), F.col("breaks")))
        .when(F.col("mn").isNotNull(), equal_pairs)
        .otherwise(F.lit(None))
    )

    all_fives = F.array_join(
        F.transform(pairs, lambda _: F.lit("5")), ","
    )
    ranges_csv = F.coalesce(ranges_to_csv(pairs), F.lit(DEFAULT_INPUT_RANGES))
    labels_csv = F.when(pairs.isNull(), F.lit(DEFAULT_RANGE_LABELS)).otherwise(
        F.when(degenerate & F.col("breaks").isNull() & F.col("unique_values").isNull(),
               F.lit(DEFAULT_LABELS[len(DEFAULT_LABELS) // 2]))
        .otherwise(ranges_to_labels(pairs))
    )
    outputs_csv = F.when(pairs.isNull(), F.lit(DEFAULT_OUTPUT_VALUES)).otherwise(
        F.when(F.col("unique_values").isNotNull() | F.col("breaks").isNotNull(),
               all_fives)  # all-5 outputs for colorizer paths (.pyt:968-971)
        .when(degenerate, F.lit(str(DEFAULT_OUTPUTS[len(DEFAULT_OUTPUTS) // 2])))
        .otherwise(F.lit(",".join(str(o) for o in DEFAULT_OUTPUTS)))
    )

    no_cells = ok_layers.join(broadcast(stats), "name", "left").filter(
        F.col("mn").isNull() & F.col("unique_values").isNull()
    ).select(
        F.lit("warning").alias("severity"),
        F.lit("default_classification").alias("code"),
        F.concat(
            F.lit("no cells; using default input ranges for: "), F.col("name")
        ).alias("message"),
    )
    errors = errors.unionByName(no_cells)

    catalog = (
        ok_layers.join(broadcast(stats), "name", "left")
        .select(
            F.col("name").alias("Name"),
            F.col("title").alias("Title"),
            F.lit(None).cast("string").alias("Description"),
            F.lit(None).cast("string").alias("Url"),
            ranges_csv.alias("InputRanges"),
            F.lit(None).cast("string").alias("NoDataRanges"),
            labels_csv.alias("RangeLabels"),
            F.lit(None).cast("string").alias("NoDataRangeLabels"),
            outputs_csv.alias("OutputValues"),
            F.lit(None).cast("string").alias("Metadata"),
            F.col("name").alias("dataset_id"),
        )
    )
    return catalog, errors


# --------------------------------------------------------------------------
# Tool 2: UpdateWROClassification
# --------------------------------------------------------------------------


def update_classification(
    catalog_df: DataFrame,
    name: str,
    ranges_df: DataFrame,
    stats_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Keyed update of one catalog row's classification columns.

    ``ranges_df``: the value-table parameter (``.pyt:80-87``) as a
    DataFrame -- ``label string, lo double, hi double, out int``.
    ``stats_df`` (optional): ``mn double, mx double`` single row with the
    layer's actual cell min/max for coverage validation.

    Validations (mirrors ``updateMessages``/``execute``):
    - required columns present (R10, ``.pyt:139-147``);
    - suitability domain 0-9 (``.pyt:86-87``);
    - range contiguity (R25, ``.pyt:199-217``);
    - coverage vs stats (R26, ``.pyt:281-314``): first min snapped DOWN to
      the dataset min (warning, ``.pyt:309-311``); error unless the last
      max is strictly greater than the dataset max (``.pyt:312-314``);
    - change detection / skip-write (R24, ``.pyt:245-273``) falls out of
      the CASE override writing identical values.

    Returns ``(updated_catalog, errors)``; on any error row with
    severity='error' the catalog is returned UNCHANGED (the reference
    aborts the edit).
    """
    spark = catalog_df.sparkSession
    errs: list[tuple[str, str, str]] = []

    missing = {"label", "lo", "hi", "out"} - set(ranges_df.columns)
    if missing:
        return catalog_df, _err(
            spark,
            [("error", "missing_columns", f"ranges_df missing {sorted(missing)}")],
        )

    # the reference's layer picker guarantees the key exists (.pyt:120-125);
    # as a library call an unknown key must be an explicit error, not a
    # silent no-op update
    if catalog_df.filter(F.col("Name") == name).limit(1).count() == 0:
        return catalog_df, _err(
            spark, [("error", "unknown_name", f"no catalog row named {name!r}")]
        )

    bad_out = ranges_df.filter((F.col("out") < 0) | (F.col("out") > 9)).count()
    if bad_out:
        errs.append(
            ("error", "suitability_domain", f"{bad_out} outputs outside 0-9")
        )

    gaps = contiguity_errors(ranges_df, "lo", "hi").count()
    if gaps:
        errs.append(("error", "contiguity", f"{gaps} non-contiguous range pairs"))

    ordered = ranges_df.orderBy("lo")
    rows = ordered.collect()  # classification cardinality: a handful of rows
    if stats_df is not None and rows:
        st = stats_df.first()
        if st is not None:
            if rows[0]["lo"] > st["mn"]:
                # snap-with-warning (.pyt:309-311)
                errs.append(
                    ("warning", "min_snapped",
                     f"first range min {rows[0]['lo']} snapped to dataset min {st['mn']}")
                )
                rows[0] = type(rows[0])(
                    label=rows[0]["label"], lo=float(st["mn"]),
                    hi=rows[0]["hi"], out=rows[0]["out"],
                )
            if rows[-1]["hi"] <= st["mx"]:
                # strict-max error (.pyt:312-314)
                errs.append(
                    ("error", "max_not_covered",
                     f"last range max {rows[-1]['hi']} must be > dataset max {st['mx']}")
                )

    errors = _err(spark, errs)
    if any(e[0] == "error" for e in errs):
        return catalog_df, errors

    flat = [x for r in rows for x in (r["lo"], r["hi"])]
    in_ranges = ",".join(_num_str(v) for v in flat)
    out_values = ",".join(str(r["out"]) for r in rows)
    labels_col = csv_encode(*[F.lit(r["label"]) for r in rows]) if rows else F.lit("")

    key = F.col("Name") == name
    updated = catalog_df.withColumns(
        {
            "InputRanges": F.when(key, F.lit(in_ranges)).otherwise(F.col("InputRanges")),
            "OutputValues": F.when(key, F.lit(out_values)).otherwise(F.col("OutputValues")),
            "RangeLabels": F.when(key, labels_col).otherwise(F.col("RangeLabels")),
        }
    )
    return updated, errors


def _num_str(v: float) -> str:
    """Range bounds render like the reference's str(float) (.pyt:1132)."""
    return str(float(v))


# --------------------------------------------------------------------------
# Tool 3: UpdateWROLayerInfo
# --------------------------------------------------------------------------


def update_layer_info(
    catalog_df: DataFrame,
    name: str,
    title: str | None = None,
    description: str | None = None,
    url: str | None = None,
    metadata: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Keyed update of one catalog row's descriptive columns.

    URL validation R27 (``.pyt:485-491``): must start http:// or https://
    (case-insensitive). Blank -> null coercion R29 applies to EACH column
    independently -- the reference's ``.pyt:542-543`` bug (a blank
    metadata nulling url) is documented here and deliberately not
    replicated. Change detection R24 (skip-write on identical values,
    ``.pyt:509-533``) falls out of the CASE override semantics.
    """
    spark = catalog_df.sparkSession
    errs: list[tuple[str, str, str]] = []
    if url is not None and url != "":
        u = url.lower()
        if not (u.startswith("http://") or u.startswith("https://")):
            errs.append(
                ("error", "invalid_url", f"url must start with http(s)://: {url}")
            )
    if catalog_df.filter(F.col("Name") == name).limit(1).count() == 0:
        errs.append(("error", "unknown_name", f"no catalog row named {name!r}"))
    errors = _err(spark, errs)
    if errs:
        return catalog_df, errors

    key = F.col("Name") == name

    def override(col: str, new: str | None) -> F.Column:
        if new is None:
            return F.col(col)  # parameter not supplied -> keep
        coerced = F.nullif(F.lit(new), F.lit(""))  # blank -> NULL (R29)
        return F.when(key, coerced).otherwise(F.col(col))

    updated = catalog_df.withColumns(
        {
            "Title": override("Title", title),
            "Description": override("Description", description),
            "Url": override("Url", url),
            "Metadata": override("Metadata", metadata),
        }
    )
    return updated, errors
