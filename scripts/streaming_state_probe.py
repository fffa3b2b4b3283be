"""Streaming dedup STATE measurement (VERDICT r7 #7): make the
"bounded state" claim for `streaming_dedup_events` a measured number
instead of an argued one.

The registered driver row drains the whole events table in ONE
availableNow micro-batch, so the watermark never advances mid-run and
no state expires — fine for the correctness oracle, blind for state
growth. This probe re-runs the same dedup over the same events SPLIT
INTO TIME-ORDERED FILES with maxFilesPerTrigger=1, so availableNow
executes one micro-batch per file and the watermark advances between
batches, exercising real state eviction. It records the
`stateOperators[0].numRowsTotal` curve from the progress events for:

- `bounded`: dropDuplicatesWithinWatermark (the engine's operator) —
  state holds only keys within the watermark horizon of the current
  maximum event time, so the curve PLATEAUS at keys-per-horizon;
- `unbounded`: plain dropDuplicates (the anti-pattern the operator's
  docstring warns about) — state accumulates every key ever seen, so
  the curve grows monotonically to the corpus' total distinct keys.

Run it on the 10x replica slice (scripts/gen_scale_slice.py) for the
scale statement: both curves grow ~10x in ABSOLUTE terms because the
key population is 10x (replica-namespaced users), but the bounded
curve's plateau stays the same FRACTION of horizon keys — state
tracks distinct-keys-in-horizon, not rows of history.

Usage: python scripts/streaming_state_probe.py [sf_dir] [n_files]
       (defaults: /tmp/hgn_scale/sf1 if present else sf0.1, 12 files)
Prints one JSON line with both curves and the distinct-key totals.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEY = ["user_id", "event_type"]
WATERMARK = "1 hour"


def split_events_by_time(
    spark: SparkSession, sf_dir: str, n_files: int, out_dir: str
) -> None:
    """Write events as n_files single-file parquets covering consecutive
    time ranges, created OLDEST FIRST so the file-stream source (which
    orders by modification time) replays them in event-time order —
    the shape a real ingestion directory has."""
    from hgn_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds() + 1.0
    bucket = F.floor(
        (F.unix_timestamp("ts") - F.lit(int(lo.timestamp())))
        / F.lit(span / n_files)
    )
    ev = ev.withColumn("_b", F.least(bucket, F.lit(n_files - 1)))
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_files):
        tmp = tempfile.mkdtemp(prefix="hgn_state_probe_part_")
        # coalesce(1): each time slice must be exactly one stream file
        # so maxFilesPerTrigger=1 maps one slice to one micro-batch.
        # Probe-only — the engine's own sinks never single-file.
        ev.filter(F.col("_b") == i).drop("_b").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), os.path.join(out_dir, f"{i:04d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)


def state_curve(
    spark: SparkSession, stream_dir: str, schema, bounded: bool
) -> list[int]:
    """numRowsTotal per micro-batch for the (un)bounded dedup."""
    s = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(stream_dir)
    )
    if bounded:
        d = s.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(KEY)
    else:
        d = s.dropDuplicates(KEY)
    ckpt = tempfile.mkdtemp(prefix="hgn_state_probe_ckpt_")
    q = (
        d.select(*KEY)
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    curve = []
    for p in q.recentProgress:
        ops = p["stateOperators"] if isinstance(p, dict) else None
        if ops is None:  # py4j StreamingQueryProgress → dict via json
            p = json.loads(p.json)
            ops = p.get("stateOperators") or []
        if ops:
            curve.append(int(ops[0]["numRowsTotal"]))
    shutil.rmtree(ckpt, ignore_errors=True)
    return curve


def probe(spark: SparkSession, sf_dir: str, n_files: int) -> dict:
    from hgn_spark.catalog import load_table

    stream_dir = tempfile.mkdtemp(prefix="hgn_state_probe_stream_")
    split_events_by_time(spark, sf_dir, n_files, stream_dir)
    schema = spark.read.parquet(stream_dir).schema
    bounded = state_curve(spark, stream_dir, schema, bounded=True)
    unbounded = state_curve(spark, stream_dir, schema, bounded=False)
    total_keys = load_table(spark, sf_dir, "events").select(*KEY).distinct().count()
    shutil.rmtree(stream_dir, ignore_errors=True)
    return {
        "sf_dir": sf_dir,
        "n_files": n_files,
        "total_distinct_keys": total_keys,
        "bounded_curve": bounded,
        "unbounded_curve": unbounded,
        "bounded_max": max(bounded) if bounded else 0,
        "unbounded_final": unbounded[-1] if unbounded else 0,
    }


def main() -> None:
    default = "/tmp/hgn_scale/sf1"
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        default if os.path.isdir(default) else "/root/testdata/sf0.1"
    )
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from hgn_spark.session import get_spark

    spark = get_spark(app_name="streaming_state_probe")
    print(json.dumps(probe(spark, sf_dir, n_files)))


if __name__ == "__main__":
    main()
