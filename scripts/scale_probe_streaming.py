"""100x probe for the streaming driver rows (closing the last family
the r9 judge listed as topping out at 10x/30x evidence): time each
availableNow streaming row at sf0.1 and at the k-fold replica slice.

What scales here: the events table grows k-fold with the SAME
timestamp span (replicas are key-disjoint, not time-shifted), so the
watermark horizon holds k-fold more keys — the state store and the
per-micro-batch shuffle grow linearly, rounds stay fixed. The
stream-stream join's interval bound keeps its state bounded the same
way. Expected: linear-or-better growth for every row; anything
superlinear means join/window state is not expiring.

Protocol matches scale_probe_heavy.py: caches cleared per run, each
variant pays its own source-scan + checkpoint build. Streaming rows
drain through their own per-application scratch checkpoints
(ephemeral_io_dir), so repeated runs re-process from a fresh
checkpoint — the probe measures full reprocessing, the cost shape a
backfill at 100 TB would see.

Usage: python scripts/scale_probe_streaming.py [scaled_dir] [runs] [only,csv]
       (3rd arg: comma-separated row subset — the r11 300x tier
        focuses the steepest rows. Set SPARK_GRAFT_STATESTORE=rocksdb
        to probe the RocksDB provider; the JSON records which provider
        ran.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
PER_VARIANT_TIMEOUT = 1800

ROWS = (
    "streaming_windowed_aggs",
    "streaming_session_windows",
    "streaming_dedup_events",
    "streaming_stream_stream_join",
    "streaming_static_enrich",
    "streaming_stateful_user_counts",
)


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hgn_scale/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rows_to_probe = (
        tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 else ROWS
    )

    from hgn_spark import registry
    from hgn_spark.registry import clear_session_caches
    from hgn_spark.session import get_spark

    rows = registry.load_all()
    spark = get_spark(app_name="scale_probe_streaming")
    spark.read.parquet(f"{BASE}/nation.parquet").groupBy(
        "n_regionkey"
    ).count().write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, float | str]] = {}
    for sf_dir, label in ((BASE, "sf0.1"), (scaled, "scaled")):
        times: dict[str, float | str] = {}
        for name in rows_to_probe:
            fn = rows[name].fn
            best: float | None = None
            for _ in range(runs):
                clear_session_caches(blocking=True)
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                try:
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as exc:  # noqa: BLE001 — record, keep probing
                    times[name] = f"ERROR: {type(exc).__name__}"
                    break
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                print(f"# {label} {name}: {dt:.2f}s", file=sys.stderr, flush=True)
                if dt > PER_VARIANT_TIMEOUT / (2 * runs):
                    break
            if name not in times and best is not None:
                times[name] = round(best, 2)
        out[label] = times

    growth = {
        n: round(out["scaled"][n] / out["sf0.1"][n], 1)
        for n in rows_to_probe
        if isinstance(out["sf0.1"].get(n), float)
        and isinstance(out["scaled"].get(n), float)
    }
    print(
        json.dumps(
            {
                "probe": "streaming_100x",
                "state_store_provider": os.environ.get(
                    "SPARK_GRAFT_STATESTORE", "hdfs"
                ),
                "scaled_dir": scaled,
                "base": out["sf0.1"],
                "scaled": out["scaled"],
                "growth_factor": growth,
            }
        )
    )


if __name__ == "__main__":
    main()
