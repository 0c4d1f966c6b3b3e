"""PySpark-native analytics engine with the query and data-processing
capabilities of Esri/weighted-raster-overlay-service-toolbox.

The reference (``WROS/Weighted Raster Overlay Service.pyt``) maintains a
mosaic-catalog data model whose rows parameterize a weighted raster overlay:
half-open range remaps to suitability scores 0-9, weighted sums across
layers, NoData knockout. This package re-expresses those semantics -- and a
full relational / streaming / LLM-data-pipeline operator surface around
them -- as idiomatic Spark DataFrame plans (SURVEY.md section 2).

Layout:
- ``session``    SparkSession factory tuned for local[32] and for cluster scale
- ``sources``    parquet/csv/json readers & writers, fixture-table loaders
- ``functions``  column-expression builders (RFC-4180 codec, range remap, ...)
- ``operators``  reusable operator implementations (joins, dedup, similarity)
- ``plans``      WRO catalog pipelines (create/update/validate)
- ``streaming``  Structured Streaming variants of the windowed operators
- ``queries``    the declared query registry checked by the driver
- ``toolbox``    the reference's three tools as a DataFrame-native API
"""

__version__ = "0.1.0"

from .plans.overlay import run_overlay  # noqa: F401,E402
from .toolbox import (  # noqa: F401,E402
    create_wro_catalog,
    filter_layers,
    match_uv_labels,
    update_classification,
    update_layer_info,
)
