"""Scale utilities: bucketed tables for co-located joins, salting for
skewed keys.

These are the two levers the engine reaches for when AQE alone is not
enough at 100 TB:

- **Bucketing** pre-shuffles a table ONCE at write time. Two tables
  bucketed by the same key into the same bucket count join with zero
  exchange on either side — the repeated-join-key workhorse (fact
  tables joined on orderkey every day). `write_bucketed` +
  `read_bucketed` wrap the saveAsTable path; the no-Exchange property
  is asserted in tests/test_scale.py by plan inspection.
- **Salting** splits one hot key across `salt_factor` sub-keys: the
  skewed side gets a random-ish (hash-derived, deterministic) salt,
  the small side is exploded across all salt values, the join runs on
  (key, salt). AQE's skew-join split handles moderate skew
  transparently; explicit salting is for the pathological key that
  exceeds a single executor even after AQE splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys split across
    `salt_factor` partitions.

    big gets salt = pmod(xxhash64(whole row), salt_factor) — spreading
    every key's rows uniformly; small is replicated once per salt
    value (explode of a literal range, so its size grows by
    salt_factor — keep it the genuinely-small side). Deterministic: no
    rand(), so retries/speculative tasks agree.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt_factor))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
