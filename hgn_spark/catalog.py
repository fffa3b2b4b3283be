"""Testdata table catalog.

The driver-generated TPC-H-ish tables (TESTDATA.md) are the engine's
standard inputs. Parquet carries its own schema, so we read without
inference; filters and projections push down into the scan (verify with
``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts arrives in whatever parquet timestamp flavor the data
    generator used; normalize to plain TIMESTAMP so every consumer
    (unix_micros, withWatermark — both reject TIMESTAMP_NTZ) sees one
    type.

    - TIMESTAMP(NANOS): read as a nanos long (runtime conf) and truncate
      to micros — the same floor-truncation DuckDB applies.
    - TIMESTAMP_NTZ (isAdjustedToUTC=false, Spark ≥3.4 inference): pin
      the session to UTC and cast, so the instant equals the wall-clock
      value DuckDB reads natively and oracle hashes stay exact.

    The ``nanosAsLong`` conf is set ONLY if the plain read rejects the
    file (the NANOS flavor), not unconditionally: the conf is
    session-global and flips the schema of EVERY later parquet read
    carrying nanos timestamps, so setting it eagerly would make other
    tables' schemas depend on whether events loaded first. When the
    data IS nanos-flavored the conf must stay set for the frame's whole
    lifetime (executors consult it at scan time), so it is sticky in
    that case by necessity — scoped to sessions that provably read
    nanos data.
    """
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, "events.parquet")
    try:
        df = spark.read.parquet(path)
    except Exception:
        # Plain read rejects TIMESTAMP(NANOS) — enable the legacy long
        # mapping and re-read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for spark.sql use."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
