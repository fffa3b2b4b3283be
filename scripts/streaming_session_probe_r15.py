"""streaming_session_windows decomposition probe (VERDICT r14 #6): the
row reads ~2.2-2.5 s at sf0.1 and was floor-claimed without a
breakdown. Attribute the wall clock across:

- `full`      : the registered row (session_window agg -> append
                parquet file sink, availableNow) — the baseline;
- `memsink`   : same streaming aggregation into a MEMORY sink —
                isolates the parquet file sink + its commit protocol;
- `batch`     : the same session_window aggregation as a plain BATCH
                query (session_window works in batch mode) with the
                same final-watermark filter, noop sink — isolates the
                micro-batch/state-store machinery itself;
- `scan`      : the watermarked source scan alone through a memory
                sink count — the floor any streaming form pays.

Each mode runs in THIS process; the state-store provider A/B
(hdfs vs rocksdb) needs a fresh session, so run the script twice:

  python scripts/streaming_session_probe_r15.py [out.json]
  SPARK_GRAFT_STATESTORE=rocksdb python scripts/streaming_session_probe_r15.py [out.json]

The second invocation MERGES into an existing out.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPS = 4
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PROBE_session_windows_r15.json"
    provider = os.environ.get("SPARK_GRAFT_STATESTORE", "hdfs").lower() or "hdfs"

    from hgn_spark.registry import load_all
    from hgn_spark.session import get_spark
    from hgn_spark.streaming.queries import (
        _run_to_memory,
        _stream_events,
        _stream_shuffle_partitions,
    )

    spark = get_spark(app_name=f"session_probe_{provider}")
    specs = load_all()

    def best(fn, label):
        t = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            t.append(round(time.perf_counter() - t0, 3))
        print(f"{provider}/{label}: min {min(t)} all {t}", flush=True)
        return {"min": min(t), "all": t}

    res = {"n_state_partitions": _stream_shuffle_partitions(spark, SF_DIR)}

    def run_full():
        specs["streaming_session_windows"].fn(spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()

    res["full"] = best(run_full, "full (row: agg -> parquet sink -> read-back noop)")

    def agg_frame():
        s = _stream_events(spark, SF_DIR).withWatermark("ts", "1 hour")
        return (
            s.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("session_value"),
            )
            .select(
                "user_id",
                F.col("sw.start").alias("session_start"),
                "n_events",
                "session_value",
            )
        )

    def run_memsink():
        _run_to_memory(agg_frame(), "append", sf_dir=SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()

    res["memsink"] = best(run_memsink, "memsink (same agg, memory sink)")

    def run_batch():
        from hgn_spark.catalog import load_table

        e = load_table(spark, SF_DIR, "events")
        cutoff = e.agg(
            (F.unix_micros(F.max("ts")) - 3600_000_000).alias("wm_us")
        )
        sess = (
            e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("session_value"),
            )
            .crossJoin(F.broadcast(cutoff))
            .filter(F.unix_micros(F.col("sw.end")) <= F.col("wm_us"))
            .select(
                "user_id",
                F.col("sw.start").alias("session_start"),
                "n_events",
                "session_value",
            )
        )
        sess.write.format("noop").mode("overwrite").save()

    res["batch"] = best(run_batch, "batch (same session agg, no streaming)")

    def run_scan():
        _run_to_memory(
            _stream_events(spark, SF_DIR)
            .withWatermark("ts", "1 hour")
            .groupBy()
            .count(),
            "complete",
        ).write.format("noop").mode("overwrite").save()

    res["scan"] = best(run_scan, "scan (watermarked source -> trivial agg)")

    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            merged = json.load(fh)
    merged.setdefault("probe", "session_windows_r15")
    merged.setdefault("sf_dir", SF_DIR)
    merged[provider] = res
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"wrote {out_path} [{provider}]")
    spark.stop()


if __name__ == "__main__":
    main()
