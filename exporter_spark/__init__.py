"""exporter_spark — a PySpark-native analytics/export engine.

A from-scratch re-expression of the capabilities of
go-data-exporter/exporter (reference: /root/reference) on Apache Spark
DataFrames, plus large-scale training-data pipeline operators
(deduplication, similarity search, text analysis, multimodal columns).

Layers (see SURVEY.md §7):
  sources/    — functions returning DataFrames (the reference's scanner/ layer)
  functions/  — the tostring display-string expression library
  plans/      — ExportSpec: the functional-option surface compiled to exprs
  formatters/ — csv / json / xml / html sinks (distributed + single-file)
  operators/  — dedup, similarity, text analysis, multimodal plumbing
  streaming/  — Structured Streaming export paths
"""

from exporter_spark.exporter import Exporter
from exporter_spark.operators.partitioning import cache_scope, release_caches
from exporter_spark.plans.spec import CellMeta, ExportSpec

__all__ = [
    "Exporter",
    "ExportSpec",
    "CellMeta",
    # cache-lifecycle surface: operators persist intermediates they
    # cannot safely unpersist themselves (the consuming plan runs
    # after they return); wrap build+force in cache_scope() so a long
    # session never accumulates storage pressure
    "cache_scope",
    "release_caches",
]
__version__ = "0.1.0"
