"""Tests for the three-tool library API (toolbox.py) -- the surface a user
of the reference would actually switch to. Edge cases cite the reference
(SURVEY.md section 5.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from weighted_raster_overlay_service_toolbox_spark.toolbox import (
    create_wro_catalog,
    filter_layers,
    match_uv_labels,
    update_classification,
    update_layer_info,
)


def _layers(spark, rows):
    return spark.createDataFrame(rows, "name string, title string")


def _cells(spark, rows):
    return spark.createDataFrame(rows, "layer string, cell_id long, value double")


def test_create_catalog_equal_interval(spark):
    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", i, float(v)) for i, v in enumerate([0, 25, 50, 75, 100])])
    catalog, errors = create_wro_catalog(layers, cells)
    assert errors.count() == 0
    row = catalog.first()
    assert row["Name"] == "elev"
    # 5 classes over [0, 100]: bounds 0,20,20,40,...,80,101 (max+1 last)
    assert row["InputRanges"] == "0.0,20.0,20.0,40.0,40.0,60.0,60.0,80.0,80.0,101.0"
    assert row["OutputValues"] == "1,3,5,7,9"
    assert row["RangeLabels"].startswith("0.0 to 20.0,")


def test_create_catalog_degenerate_single_range(spark):
    """min==max -> one range [v, v+1) (``.pyt:913-926``)."""
    layers = _layers(spark, [("flat", "Flat")])
    cells = _cells(spark, [("flat", 1, 7.0), ("flat", 2, 7.0)])
    catalog, errors = create_wro_catalog(layers, cells)
    row = catalog.first()
    assert row["InputRanges"] == "7.0,8.0"
    assert row["OutputValues"] == "5"  # default suitability 5 (.pyt:86-87)


def test_create_catalog_rejects_dup_and_bad_names(spark):
    layers = _layers(
        spark, [("a", "A"), ("a", "A again"), ("bad name", "spacey")]
    )
    cells = _cells(spark, [("a", 1, 1.0), ("bad name", 1, 1.0)])
    catalog, errors = create_wro_catalog(layers, cells)
    codes = {r["code"] for r in errors.collect()}
    assert codes == {"duplicate_name", "invalid_name"}
    assert catalog.count() == 0  # both names dropped


def test_update_classification_happy_path(spark):
    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", 1, 0.0), ("elev", 2, 100.0)])
    catalog, _ = create_wro_catalog(layers, cells)
    ranges = spark.createDataFrame(
        [("low", 0.0, 50.0, 2), ("high", 50.0, 101.0, 8)],
        "label string, lo double, hi double, out int",
    )
    stats = spark.createDataFrame([(0.0, 100.0)], "mn double, mx double")
    updated, errors = update_classification(catalog, "elev", ranges, stats)
    assert errors.filter("severity = 'error'").count() == 0
    row = updated.filter("Name = 'elev'").first()
    assert row["InputRanges"] == "0.0,50.0,50.0,101.0"
    assert row["OutputValues"] == "2,8"
    assert row["RangeLabels"] == "low,high"


def test_update_classification_contiguity_error(spark):
    """Gap between ranges aborts the edit (``.pyt:199-217``)."""
    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", 1, 0.0), ("elev", 2, 100.0)])
    catalog, _ = create_wro_catalog(layers, cells)
    before = catalog.first()["InputRanges"]
    ranges = spark.createDataFrame(
        [("low", 0.0, 40.0, 2), ("high", 50.0, 101.0, 8)],
        "label string, lo double, hi double, out int",
    )
    updated, errors = update_classification(catalog, "elev", ranges)
    assert errors.filter("code = 'contiguity'").count() == 1
    assert updated.first()["InputRanges"] == before  # unchanged


def test_update_classification_min_snap_and_max_error(spark):
    """Min snaps with a warning (``.pyt:309-311``); last max <= dataset max
    is a hard error (``.pyt:312-314``)."""
    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", 1, 0.0), ("elev", 2, 100.0)])
    catalog, _ = create_wro_catalog(layers, cells)
    stats = spark.createDataFrame([(0.0, 100.0)], "mn double, mx double")

    snap = spark.createDataFrame(
        [("low", 10.0, 50.0, 2), ("high", 50.0, 101.0, 8)],
        "label string, lo double, hi double, out int",
    )
    updated, errors = update_classification(catalog, "elev", snap, stats)
    assert errors.filter("code = 'min_snapped'").count() == 1
    assert updated.filter("Name = 'elev'").first()["InputRanges"].startswith("0.0,")

    short = spark.createDataFrame(
        [("low", 0.0, 50.0, 2), ("high", 50.0, 100.0, 8)],  # 100.0 == max
        "label string, lo double, hi double, out int",
    )
    updated2, errors2 = update_classification(catalog, "elev", short, stats)
    assert errors2.filter("code = 'max_not_covered'").count() == 1
    assert updated2.first()["InputRanges"] == catalog.first()["InputRanges"]


def test_update_classification_snap_skips_max_check(spark):
    """The reference's ``elif`` (``.pyt:312-314``): when the min snaps,
    the strict-max check is SKIPPED -- a snapped-and-short table goes
    through with only the warning."""
    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", 1, 0.0), ("elev", 2, 100.0)])
    catalog, _ = create_wro_catalog(layers, cells)
    stats = spark.createDataFrame([(0.0, 100.0)], "mn double, mx double")

    both = spark.createDataFrame(
        [("low", 10.0, 50.0, 2), ("high", 50.0, 100.0, 8)],  # snap AND short
        "label string, lo double, hi double, out int",
    )
    updated, errors = update_classification(catalog, "elev", both, stats)
    assert errors.filter("code = 'min_snapped'").count() == 1
    assert errors.filter("code = 'max_not_covered'").count() == 0
    # warning-only -> the edit applies, with the snapped min
    assert updated.filter("Name = 'elev'").first()["InputRanges"] == (
        "0.0,50.0,50.0,100.0"
    )


def test_update_classification_suitability_domain(spark):
    """Outputs constrained to 0-9 (``.pyt:86-87``)."""
    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", 1, 0.0), ("elev", 2, 100.0)])
    catalog, _ = create_wro_catalog(layers, cells)
    ranges = spark.createDataFrame(
        [("x", 0.0, 101.0, 12)], "label string, lo double, hi double, out int"
    )
    _, errors = update_classification(catalog, "elev", ranges)
    assert errors.filter("code = 'suitability_domain'").count() == 1


def test_update_layer_info_url_validation_and_blank_null(spark):
    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", 1, 0.0), ("elev", 2, 100.0)])
    catalog, _ = create_wro_catalog(layers, cells)

    _, errors = update_layer_info(catalog, "elev", url="ftp://nope")
    assert errors.filter("code = 'invalid_url'").count() == 1

    updated, errors2 = update_layer_info(
        catalog, "elev", title="New", url="https://ok.example", metadata=""
    )
    assert errors2.count() == 0
    row = updated.filter("Name = 'elev'").first()
    assert row["Title"] == "New"
    assert row["Url"] == "https://ok.example"
    assert row["Metadata"] is None  # blank -> NULL (R29), url untouched


def test_update_layer_info_csv_quoted_label_roundtrip(spark):
    """RFC-4180 quoting survives a classification update with a comma in
    a label (``.pyt:1319-1323``)."""
    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", 1, 0.0), ("elev", 2, 100.0)])
    catalog, _ = create_wro_catalog(layers, cells)
    ranges = spark.createDataFrame(
        [("lowest, really", 0.0, 101.0, 5)],
        "label string, lo double, hi double, out int",
    )
    updated, _ = update_classification(catalog, "elev", ranges)
    assert updated.first()["RangeLabels"] == '"lowest, really"'


def test_create_catalog_class_break_dispatch(spark):
    """R17 (``.pyt:941-1008``): breaks [min,u1..uk] with last bound +1,
    all-5 outputs, 'a to b' labels."""
    layers = spark.createDataFrame(
        [("cls", "Classified", [25.0, 50.0, 100.0])],
        "name string, title string, breaks array<double>",
    )
    cells = spark.createDataFrame(
        [("cls", 1, 0.0), ("cls", 2, 100.0)],
        "layer string, cell_id long, value double",
    )
    catalog, errors = create_wro_catalog(layers, cells)
    row = catalog.first()
    assert row["InputRanges"] == "0.0,25.0,25.0,50.0,50.0,101.0"
    assert row["OutputValues"] == "5,5,5"
    assert row["RangeLabels"] == "0.0 to 25.0,25.0 to 50.0,50.0 to 101.0"


def test_create_catalog_unique_values_dispatch(spark):
    """R18 (``.pyt:1012-1114``): distinct values -> consecutive ranges,
    terminal +1."""
    layers = spark.createDataFrame(
        [("uv", "Thematic", [7.0, 1.0, 3.0])],
        "name string, title string, unique_values array<double>",
    )
    cells = spark.createDataFrame(
        [("uv", 1, 1.0)], "layer string, cell_id long, value double"
    )
    catalog, errors = create_wro_catalog(layers, cells)
    row = catalog.first()
    assert row["InputRanges"] == "1.0,3.0,3.0,7.0,7.0,8.0"
    assert row["OutputValues"] == "5,5,5"


def test_create_catalog_skips_vector_source_types(spark):
    """R15 (``.pyt:1246-1249``): VECTOR_UV/MAGDIR layers skipped with a
    warning."""
    layers = spark.createDataFrame(
        [("wind", "Wind", "VECTOR_UV"), ("elev", "Elevation", "GENERIC")],
        "name string, title string, source_type string",
    )
    cells = spark.createDataFrame(
        [("elev", 1, 0.0), ("elev", 2, 100.0), ("wind", 1, 5.0)],
        "layer string, cell_id long, value double",
    )
    catalog, errors = create_wro_catalog(layers, cells)
    assert [r["Name"] for r in catalog.collect()] == ["elev"]
    assert errors.filter("code = 'skipped_source_type'").count() == 1


def test_create_catalog_default_fallback_when_no_cells(spark):
    """R38 (``.pyt:1268, 1279-1280``): a layer with no cells gets the
    hardcoded default classification and a warning."""
    layers = spark.createDataFrame(
        [("ghost", "No Data Layer")], "name string, title string"
    )
    cells = spark.createDataFrame(
        [], "layer string, cell_id long, value double"
    )
    catalog, errors = create_wro_catalog(layers, cells)
    row = catalog.first()
    assert row["InputRanges"] == "1.0,50.0,50.0,100.0,100.0,150.0,150.0,200.0,200.0,256.0"
    assert row["OutputValues"] == "1,3,5,7,9"
    assert row["RangeLabels"] == "Very Low,Low,Medium,High,Very High"
    assert errors.filter("code = 'default_classification'").count() == 1


_LAYER_SCHEMA = (
    "name string, long_name string, is_raster boolean, visible boolean, "
    "dataset_type string, is_web boolean, has_datasource boolean, position long"
)


def test_filter_layers_one_drop_per_stage(spark):
    """R23 (``.pyt:710-745``): each of the six stages plus the duplicate
    check drops exactly its target layer; precedence matches the
    reference's cascading addLayer flags."""
    rows = [
        ("vec",   "group\\vec",            False, True,  "FeatureClass",  False, True,  1),
        ("hid",   "group\\hid",            True,  False, "RasterDataset", False, True,  2),
        ("mos",   "group\\mos",            True,  True,  "MosaicDataset", False, True,  3),
        ("web",   "group\\web",            True,  True,  "RasterDataset", True,  True,  4),
        ("nods",  "group\\nods",           True,  True,  "RasterDataset", False, False, 5),
        ("bnd",   "mos\\Boundary\\bnd",    True,  True,  "RasterDataset", False, True,  6),
        ("ok",    "group\\ok",             True,  True,  "RasterDataset", False, True,  7),
        ("ok",    "group\\ok2",            True,  True,  "RasterDataset", False, True,  8),
    ]
    layers = spark.createDataFrame(rows, _LAYER_SCHEMA)
    kept, dropped = filter_layers(layers, visible_only=True)
    assert [(r["name"], r["position"]) for r in kept.collect()] == [("ok", 7)]
    reasons = {r["position"]: r["reason"] for r in dropped.collect()}
    assert reasons == {
        1: "not_raster", 2: "not_visible", 3: "mosaic_dataset",
        4: "web_layer", 5: "no_datasource", 6: "service_sublayer",
        8: "duplicate_name",
    }


def test_filter_layers_visibility_off_and_defaults(spark):
    """visible_only=False keeps invisible layers (``.pyt:718-719`` only
    applies when the parameter is set); missing optional columns default
    to keep; a \\Boundary PREFIX is not a sublayer (find > 0)."""
    layers = spark.createDataFrame(
        [("a",), ("b",)], "name string"
    )  # only name: all defaults
    kept, dropped = filter_layers(layers)
    assert kept.count() == 2 and dropped.count() == 0

    lyr = spark.createDataFrame(
        [("hid", "group\\hid", True, False, None, False, True, 1),
         ("pfx", "\\Boundary\\pfx", True, True, None, False, True, 2)],
        _LAYER_SCHEMA,
    )
    kept2, _ = filter_layers(lyr, visible_only=False)
    # invisible kept; \Boundary at position 1 (find==0 in the reference)
    # is NOT a sublayer match
    assert {r["name"] for r in kept2.collect()} == {"hid", "pfx"}


def test_match_uv_labels_case_insensitive(spark):
    """R20 (``.pyt:1059-1068``): match is on LOWERCASED values; unmatched
    rows keep a NULL label (documented deviation from the reference's
    silent list misalignment)."""
    attr = spark.createDataFrame(
        [(1.0, "FOREST"), (2.0, "Water"), (3.0, "unknown")],
        "value double, field_value string",
    )
    colorizer = spark.createDataFrame(
        [("forest", "Dense forest"), ("WATER", "Open water"), ("urban", "Built")],
        "match_value string, label string",
    )
    matched, errors = match_uv_labels(attr, colorizer)
    assert errors.count() == 0
    rows = {r["value"]: (r["label"], r["out"]) for r in matched.collect()}
    assert rows == {
        1.0: ("Dense forest", 5),
        2.0: ("Open water", 5),
        3.0: (None, 5),
    }


def test_match_uv_labels_cardinality_mismatch(spark):
    """R21 (``.pyt:1052-1055``): count mismatch -> warning + empty match."""
    attr = spark.createDataFrame(
        [(1.0, "forest"), (2.0, "water")], "value double, field_value string"
    )
    colorizer = spark.createDataFrame(
        [("forest", "Dense forest")], "match_value string, label string"
    )
    matched, errors = match_uv_labels(attr, colorizer)
    assert matched.count() == 0
    assert errors.filter("code = 'uv_cardinality'").count() == 1


def test_create_catalog_colorizer_label_dispatch(spark):
    """R20 wired into the unique-value dispatch: labels come from the
    colorizer through the case fold; R21 mismatch skips the layer."""
    schema = (
        "name string, title string, unique_values array<double>, "
        "uv_field_values array<string>, colorizer_values array<string>, "
        "colorizer_labels array<string>"
    )
    layers = spark.createDataFrame(
        [
            ("uv", "Thematic", [1.0, 3.0], ["FOREST", "WATER"],
             ["forest", "water"], ["Dense forest", "Open water"]),
            ("bad", "Mismatch", [1.0, 3.0], ["FOREST", "WATER"],
             ["forest"], ["Dense forest"]),
        ],
        schema,
    )
    cells = spark.createDataFrame(
        [("uv", 1, 1.0)], "layer string, cell_id long, value double"
    )
    catalog, errors = create_wro_catalog(layers, cells)
    rows = {r["Name"]: r for r in catalog.collect()}
    assert set(rows) == {"uv"}  # mismatch layer dropped (R21)
    assert rows["uv"]["RangeLabels"] == "Dense forest,Open water"
    assert rows["uv"]["InputRanges"] == "1.0,3.0,3.0,4.0"
    assert rows["uv"]["OutputValues"] == "5,5"
    assert errors.filter("code = 'uv_cardinality'").count() == 1


def test_update_classification_stats_via_scratch_export(spark):
    """R12 (``.pyt:283-304``): with no stats_df, cells_df routes through
    the scratch-export step and min/max validation still fires."""
    from weighted_raster_overlay_service_toolbox_spark.toolbox import (
        export_scratch_table,
    )

    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", 1, 0.0), ("elev", 2, 100.0)])
    catalog, _ = create_wro_catalog(layers, cells)

    snap = spark.createDataFrame(
        [("low", 10.0, 50.0, 2), ("high", 50.0, 101.0, 8)],
        "label string, lo double, hi double, out int",
    )
    updated, errors = update_classification(catalog, "elev", snap, cells_df=cells)
    assert errors.filter("code = 'min_snapped'").count() == 1
    assert updated.filter("Name = 'elev'").first()["InputRanges"].startswith("0.0,")
    # the scratch view exists, is cached, and re-export replaces it
    assert spark.catalog.isCached("wro_scratch_paths")
    again = export_scratch_table(
        cells.filter("layer = 'elev'").select("cell_id", "value"),
        "wro_scratch_paths",
    )
    assert again.count() == 2
    spark.catalog.uncacheTable("wro_scratch_paths")


def test_updates_reject_unknown_name(spark):
    """A keyed update against a nonexistent layer is an explicit error,
    never a silent no-op (the reference's picker guarantees existence,
    .pyt:120-125; a library call has no picker)."""
    layers = _layers(spark, [("elev", "Elevation")])
    cells = _cells(spark, [("elev", 1, 0.0), ("elev", 2, 100.0)])
    catalog, _ = create_wro_catalog(layers, cells)
    ranges = spark.createDataFrame(
        [("x", 0.0, 101.0, 5)], "label string, lo double, hi double, out int"
    )
    _, errors = update_classification(catalog, "nope", ranges)
    assert errors.filter("code = 'unknown_name'").count() == 1
    _, errors2 = update_layer_info(catalog, "nope", title="X")
    assert errors2.filter("code = 'unknown_name'").count() == 1
