"""CSV source + sink round-trips on Quakers-shaped fixtures."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hgn_spark.sources.csv import load_edges_csv, load_nodes_csv
from hgn_spark.sources.sinks import (
    append_dedupe_reload,
    checkpoint_df,
    read_parquet,
    write_communities_csv,
    write_parquet,
)

# Mirrors the Quakers raw layout: header row, renamed via declared
# schema (reference confs/quakers.yml:42-48).
NODES_CSV = """Name,Historical Significance,Gender,ID
0,religious writer,male,10013191
1,local politician,male,10011149
2,,female,10007554
"""
EDGES_CSV = """Source,Target
0,1
1,2
0,1
"""


def test_load_nodes_declared_schema(spark, tmp_path):
    p = tmp_path / "nodes.csv"
    p.write_text(NODES_CSV)
    df = load_nodes_csv(
        spark,
        str(p),
        feature_names=["id", "significance", "gender", "internal_id"],
        has_header=True,
    )
    assert df.dtypes == [
        ("id", "bigint"),
        ("significance", "string"),
        ("gender", "string"),
        ("internal_id", "string"),
    ]
    rows = {r["id"]: r for r in df.collect()}
    assert rows[0]["significance"] == "religious writer"
    assert rows[2]["significance"] is None  # empty field → null


def test_load_edges_with_and_without_weights(spark, tmp_path):
    p = tmp_path / "edges.csv"
    p.write_text(EDGES_CSV)
    df = load_edges_csv(spark, str(p), has_header=True)
    assert df.dtypes == [("src", "bigint"), ("dst", "bigint")]
    assert df.count() == 3  # loader does not dedupe; that's P7's job
    pw = tmp_path / "wedges.csv"
    pw.write_text("0|1|0.5\n1|2|1.5\n")
    dfw = load_edges_csv(spark, str(pw), delimiter="|", has_weights=True)
    assert dfw.dtypes == [("src", "bigint"), ("dst", "bigint"), ("weight", "float")]
    assert dfw.filter("src = 1").collect()[0]["weight"] == 1.5


def test_parquet_roundtrip_and_partitioned_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id long, grp string"
    )
    path = str(tmp_path / "out")
    write_parquet(df, path, partition_cols=["grp"])
    back = read_parquet(spark, path)
    assert back.count() == 3
    assert any(d.startswith("grp=") for d in os.listdir(path))


def test_checkpoint_truncates_lineage(spark):
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    for _ in range(3):
        df = df.withColumn("x", F.col("x") + 1)
    ck = checkpoint_df(df)
    assert ck.count() == 10
    # Checkpointed plan is a scan of materialized rows — the original
    # Range + projection chain is gone from the logical plan.
    plan = ck._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan


def test_append_dedupe_reload(spark, tmp_path):
    import os

    from hgn_spark.sources.sinks import read_parquet

    base = str(tmp_path / "acc")
    a = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    b = spark.createDataFrame([(2, 3), (3, 4)], "src long, dst long")
    append_dedupe_reload(a, base)
    merged = append_dedupe_reload(b, base)
    assert merged.count() == 3  # (2,3) deduped across appends
    # accumulator compaction: pre/ holds the deduped set, not the raw
    # append history — storage and per-call IO stay bounded by the
    # distinct count instead of growing O(calls)
    assert read_parquet(spark, os.path.join(base, "pre")).count() == 3
    # a third call with all-duplicate input stays at 3
    assert append_dedupe_reload(a, base).count() == 3
    assert read_parquet(spark, os.path.join(base, "pre")).count() == 3


def test_checkpoint_df_durable_path_reuse(spark, tmp_path):
    """The durable round-trip can reuse ONE path across steps (the
    per-step reload pattern it replaces): a direct overwrite of a path
    the input is reading from would raise on step 2."""
    from hgn_spark.sources.sinks import checkpoint_df

    path = str(tmp_path / "ck")
    df = spark.range(5).withColumnRenamed("id", "x")
    ck1 = checkpoint_df(df, durable_path=path)
    ck2 = checkpoint_df(ck1.withColumn("x", F.col("x") + 1), durable_path=path)
    assert sorted(r["x"] for r in ck2.collect()) == [1, 2, 3, 4, 5]


def test_to_pandas_sample_caps_rows(spark):
    from hgn_spark.sources.sinks import to_pandas_sample

    pdf = to_pandas_sample(spark.range(100), max_rows=7)
    assert len(pdf) == 7


def test_write_communities_csv(spark, tmp_path):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "id long, component long"
    )
    verts = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "z")], "id long, attr string"
    )
    path = str(tmp_path / "communities")
    write_communities_csv(comps, verts, path)
    dirs = [d for d in os.listdir(path) if d.startswith("component=")]
    assert sorted(dirs) == ["component=1", "component=3"]
    back = spark.read.option("header", True).csv(path)
    assert back.filter("attr = 'UNKNOWN'").count() == 1


def test_events_ts_normalized_to_timestamp(spark):
    """Every events consumer needs plain TIMESTAMP: unix_micros and
    withWatermark both reject TIMESTAMP_NTZ (which parquet files written
    without isAdjustedToUTC infer as under Spark >= 3.4), and the nanos
    flavor arrives as bigint. load_table must normalize either way —
    regression guard for the round-4 driver breakage."""
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    # unix_micros is the strictest consumer — must analyze and run.
    assert e.select(F.unix_micros("ts")).first()[0] is not None


def test_orc_and_jsonl_roundtrip(spark, tmp_path):
    """Format-generic sink/scan: ORC and JSONL round-trips preserve
    values; the JSONL read uses the declared schema (no inference
    pass)."""
    from hgn_spark.catalog import load_table
    from hgn_spark.sources.sinks import read_table, write_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    want = sorted((r.doc_id, r.text, r.lang, r.source) for r in docs.collect())

    orc_path = str(tmp_path / "docs_orc")
    write_table(docs, orc_path, fmt="orc")
    got_orc = read_table(spark, orc_path, fmt="orc")
    assert sorted(
        (r.doc_id, r.text, r.lang, r.source) for r in got_orc.collect()
    ) == want

    json_path = str(tmp_path / "docs_jsonl")
    write_table(docs, json_path, fmt="json")
    got_json = read_table(spark, json_path, fmt="json", schema=docs.schema)
    assert sorted(
        (r.doc_id, r.text, r.lang, r.source) for r in got_json.collect()
    ) == want
    assert got_json.schema == docs.schema

    # partitioned hive-style layout writes one directory per key
    part_path = str(tmp_path / "docs_by_lang")
    write_table(docs, part_path, fmt="orc", partition_cols=["lang"])
    import os
    assert any(d.startswith("lang=") for d in os.listdir(part_path))

    import pytest as _pytest
    with _pytest.raises(ValueError):
        write_table(docs, str(tmp_path / "x"), fmt="avro")


def test_ephemeral_io_dir_generations(spark):
    """Scratch-tree contract (r10): each call returns a FRESH
    generation subdir (never a reused or wiped path — terminated
    streaming queries' providers may still reference earlier
    generations), all under one per-(tag, application) parent that is
    reaped at process exit."""
    import os

    from hgn_spark.sources.sinks import ephemeral_io_dir

    a = ephemeral_io_dir(spark, "pytest_gen")
    b = ephemeral_io_dir(spark, "pytest_gen")
    assert a != b
    assert os.path.dirname(a) == os.path.dirname(b)
    assert spark.sparkContext.applicationId in os.path.dirname(a)
    # earlier generations survive later calls
    assert os.path.isdir(a) and os.path.isdir(b)
