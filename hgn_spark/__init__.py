"""hgn_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference HGN system (a
PySpark/GraphFrames community-detection pipeline, see SURVEY.md) as an
idiomatic, scale-first Spark engine:

- ``hgn_spark.session``    — SparkSession factory (AQE, Arrow, UTC).
- ``hgn_spark.catalog``    — testdata table loading / temp-view registry.
- ``hgn_spark.sources``    — CSV / Parquet / JDBC source & sink layer.
- ``hgn_spark.operators``  — relational + LLM-data-pipeline operators
  (dedup, similarity search, top-k, sessionize) plus the native column
  functions (vector math, text analysis, hashing) that replace the
  reference's row-at-a-time UDFs.
- ``hgn_spark.graph``      — the graph layer: undirected edges, k-hop
  neighborhoods, r-metrics, connected components, truncated betweenness,
  and the full HGN community-detection loop — pure DataFrame, no
  GraphFrames dependency.
- ``hgn_spark.streaming``  — Structured Streaming windowed aggregations.
- ``hgn_spark.multimodal`` — binary-column (image/audio) plumbing.

Everything is built on the DataFrame API so Catalyst handles pushdown,
pruning, join strategy and AQE; Python UDFs appear only as Arrow-batched
pandas UDFs and only where built-ins cannot express the semantics.
"""

from hgn_spark.session import get_spark, stop_spark
from hgn_spark.catalog import TABLES, load_table, load_tables, register_views

__all__ = [
    "get_spark",
    "stop_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
