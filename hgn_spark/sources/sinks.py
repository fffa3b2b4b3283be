"""Sinks + persistence ops (SURVEY §2.1 S3/S5/S6/S7, §2.11 C5).

Reference parity with deliberate scale fixes:

- S3 save_to_parquet (spark_manager.py:233-263) defaulted to
  repartition(1) — a single-writer bottleneck. Here the writer keeps
  Spark's natural output partitioning unless the caller asks otherwise.
- S5 reload_df (parquet write+read+persist per step) existed to
  truncate lineage; `checkpoint_df` does the same with localCheckpoint
  (in-memory, no IO) or an optional durable parquet round-trip for the
  reference's cached_init_step semantics (main.py:243-245).
- S6 clean_and_reload_df = append ∪ dedupe ∪ overwrite
  (spark_manager.py:192-213).
- S7 per-community CSVs were built on the DRIVER via NetworkX +
  toPandas (spark_manager.py:335-368); `write_communities_csv` is the
  distributed form — one partitionBy write, no collect.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> None:
    """S3 without the repartition(1) default."""
    if num_partitions and partition_cols:
        df = df.repartition(num_partitions, *partition_cols)
    elif num_partitions:
        df = df.repartition(num_partitions)
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4."""
    return spark.read.parquet(path)


# Format registry for the generic writer/reader below. Parquet is the
# default interchange format; ORC ships in Spark (same columnar
# pushdown/pruning properties — some lakes standardize on it); JSONL is
# the interchange format most external text-corpus tooling reads and
# writes. CSV stays in sources/csv.py where the reference-compatible
# schema handling lives.
_FORMATS = ("parquet", "orc", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
) -> None:
    """Format-generic sink (no repartition(1) anywhere): parquet / orc /
    json (JSONL). Natural output partitioning; optional partitionBy for
    hive-style layouts."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    writer = df.write.mode(mode).format(fmt)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Format-generic scan. For JSONL pass an explicit schema whenever
    one is known — schema inference costs a full extra pass over the
    data, which at 100 TB is a second read of the corpus."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def checkpoint_df(df: DataFrame, durable_path: str | None = None) -> DataFrame:
    """S5: truncate lineage. localCheckpoint by default; pass a path for
    the durable parquet round-trip (resume-after-restart semantics).

    The durable write goes to a sibling temp directory and is swapped
    in afterwards, so the SAME path can be reused across steps — the
    per-step reload pattern this replaces. A direct overwrite would
    plan a write to a path the input frame is simultaneously reading
    from (step 2 onward) and raise. The swap is local-filesystem
    rename; on an object store use alternating paths instead.
    """
    if durable_path is None:
        return df.localCheckpoint(eager=True)
    import shutil

    tmp = durable_path.rstrip("/") + ".__tmp__"
    write_parquet(df, tmp, mode="overwrite")
    if os.path.exists(durable_path):
        shutil.rmtree(durable_path)
    os.rename(tmp, durable_path)
    return read_parquet(df.sparkSession, durable_path)


# Scratch parents already scheduled for atexit reaping — one entry per
# (tag, application) parent, however many times the owning row runs —
# and the per-parent generation counter behind the unique subdirs.
_EPHEMERAL_REAPED: set[str] = set()
_EPHEMERAL_GEN: dict[str, int] = {}
# Guards the generation read-modify-write: two threads asking for the
# same (tag, app) parent concurrently must not receive the same g{N}
# path — a collision would hand two sinks/checkpoints one directory,
# exactly what the per-call-site tag exists to prevent (ADVICE r10).
_EPHEMERAL_LOCK = threading.Lock()


def ephemeral_io_dir(spark: SparkSession, tag: str) -> str:
    """Per-application scratch dir for driver rows whose evidence
    branches round-trip through disk (ADVICE/VERDICT r9 #4: the scan
    row used to mkdtemp a fresh never-removed tree per invocation —
    several full result copies leaked per bench pass).

    Each call returns a fresh GENERATION subdir of a deterministic
    per-(tag, application) PARENT; the parent is rmtree'd once at
    process exit — the earliest point no lazy consumer can still
    re-scan any generation. The applicationId in the parent name makes
    cross-session collisions impossible, so nothing is wiped
    mid-session. Two reasons generations ACCUMULATE instead of the
    parent being wiped per call (both measured, r10):

    - streaming checkpoints derive StateStoreIds from the checkpoint
      path, and the JVM keeps loaded StateStoreProviders (plus their
      maintenance threads) alive after a query stops — deleting or
      re-using a previous invocation's checkpoint under them triggers
      recovery churn billed to the NEXT run (stream-stream join early
      executions: 24/17/13 s with wipe-and-reuse, 19/13/12/25 s with
      wipe-then-new-subdir, 11/6.9/6.7 s flat when old state is left
      in place — the r10 spread bench's 54.8 s outlier was this);
    - the returned frames are lazy, so the previous generation cannot
      be safely removed at call time anyway.

    Bound: one small tree per invocation within a session (bench: 3-4
    per row per round), all reaped at exit."""
    import atexit
    import shutil
    import tempfile

    parent = os.path.join(
        tempfile.gettempdir(),
        f"hgn_io_{tag}_{spark.sparkContext.applicationId}",
    )
    with _EPHEMERAL_LOCK:
        gen = _EPHEMERAL_GEN.get(parent, 0)
        _EPHEMERAL_GEN[parent] = gen + 1
        if parent not in _EPHEMERAL_REAPED:
            _EPHEMERAL_REAPED.add(parent)
            atexit.register(shutil.rmtree, parent, ignore_errors=True)
    path = os.path.join(parent, f"g{gen}")
    os.makedirs(path, exist_ok=True)
    return path


def append_dedupe_reload(
    df: DataFrame, path: str, subset: list[str] | None = None
) -> DataFrame:
    """S6: append to a parquet accumulator, dedupe the union, overwrite
    the final copy, reload. The reference used this to accumulate
    shortest-path batches (graph_tools.py:148-152)."""
    spark = df.sparkSession
    pre = os.path.join(path, "pre")
    final = os.path.join(path, "final")
    write_parquet(df, pre, mode="append")
    merged = read_parquet(spark, pre).dropDuplicates(subset)
    write_parquet(merged, final, mode="overwrite")
    out = read_parquet(spark, final)
    # Compact the accumulator: replace the raw append history with the
    # deduped copy, so storage under pre/ and the next call's
    # read+dedupe stay bounded by the DISTINCT row count. Without this
    # every historical duplicate is re-read and re-deduped on every
    # call — O(calls²) total IO (the reference's overwrite-in-place
    # kept its accumulator deduped between calls too).
    write_parquet(out, pre, mode="overwrite")
    return read_parquet(spark, final)


def to_pandas_sample(df: DataFrame, max_rows: int = 10_000) -> "object":
    """S8: the collect-to-pandas escape hatch for visualization — with a
    hard row cap applied BEFORE the collect. The reference toPandas'd
    whole tables to build NetworkX graphs on the driver
    (spark_manager.py:318-333); this keeps the hatch but makes an
    unbounded driver materialization impossible. Never use on a hot
    path."""
    return df.limit(max_rows).toPandas()


def write_communities_csv(
    components: DataFrame,
    vertices: DataFrame,
    path: str,
    fill: str = "UNKNOWN",
) -> None:
    """S7 distributed: one CSV directory per community via partitionBy —
    no driver collect, no NetworkX. Null features take the reference's
    UNKNOWN fill (spark_manager.py:356)."""
    out = vertices.join(components, "id", "inner")
    str_cols = [c for c, t in out.dtypes if t == "string"]
    out = out.fillna(fill, subset=str_cols)
    out.write.mode("overwrite").partitionBy("component").option("header", True).csv(path)
