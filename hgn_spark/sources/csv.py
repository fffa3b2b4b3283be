"""Typed CSV sources for graph inputs (SURVEY §2.1 S1/S2).

Reference parity (spark_manager/spark_manager.py:102-149): node schema
is DECLARED, never inferred — first column forced to LongType id, every
feature column StringType, names from config `feature_names` (which
also renames raw headers, e.g. Quakers' `Name,...,ID` →
`id,...,internal_id`, confs/quakers.yml:42-48). Edge schema is fixed
(src, dst[, weight]). Header/delimiter/encoding come from the caller.

Unlike the reference, loading does NOT round-trip through parquet
(reload_df) — that was lineage-truncation-by-IO; callers checkpoint
when they iterate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def nodes_schema(feature_names: list[str]) -> StructType:
    """First declared column is the Long id; the rest are String
    features (spark_manager.py:113-116)."""
    fields = [StructField(feature_names[0], LongType(), True)]
    fields += [StructField(f, StringType(), True) for f in feature_names[1:]]
    return StructType(fields)


def edges_schema(has_weights: bool = False) -> StructType:
    fields = [
        StructField("src", LongType(), True),
        StructField("dst", LongType(), True),
    ]
    if has_weights:
        fields.append(StructField("weight", FloatType(), True))
    return StructType(fields)


def load_nodes_csv(
    spark: SparkSession,
    path: str,
    feature_names: list[str],
    delimiter: str = ",",
    has_header: bool = False,
    encoding: str = "UTF-8",
) -> DataFrame:
    """S1: typed node scan. The declared schema doubles as the header
    rename — raw header names are discarded when has_header=True."""
    return (
        spark.read.format("csv")
        .schema(nodes_schema(feature_names))
        .options(header=has_header, sep=delimiter, encoding=encoding)
        .load(path)
    )


def load_edges_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    has_weights: bool = False,
    has_header: bool = False,
    encoding: str = "UTF-8",
) -> DataFrame:
    """S2: typed edge scan with the fixed ±weight schema."""
    return (
        spark.read.format("csv")
        .schema(edges_schema(has_weights))
        .options(header=has_header, sep=delimiter, encoding=encoding)
        .load(path)
    )
