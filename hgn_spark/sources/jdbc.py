"""JDBC source/sink (SURVEY §2.1 S11).

The reference ships a hand-rolled MySQL CRUD layer
(datastore/mysql_datastore.py:53-183) that the main path never calls —
string-formatted SQL, row-at-a-time, driver-side. The Spark-native
equivalent is the JDBC DataFrame source/sink: predicate pushdown,
partitioned parallel reads, batched writes.

No external database server exists in this environment, but Spark
bundles Apache Derby (for the Hive metastore), whose EMBEDDED driver
gives a real in-process JDBC database — so the full roundtrip (batched
write → partitioned parallel read → filter pushdown into the source)
is LIVE-tested in tests/test_sources.py against
`jdbc:derby:memory:...`, not just plan-constructed. Against a server
deployment these same wrappers are the standard `spark.read.jdbc`
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Partitioned JDBC read: with a numeric partition column + bounds,
    Spark issues num_partitions range-sliced queries in parallel
    instead of one giant scan."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JDBC source as the literal
            # "None" and die in a NumberFormatException far from here.
            raise ValueError(
                "read_jdbc: partition_column requires both lower_bound "
                "and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> None:
    """Batched JDBC write (replaces the reference's per-row INSERTs)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
