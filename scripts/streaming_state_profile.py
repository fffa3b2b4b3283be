"""Per-micro-batch state-store profile for the session-window row
(VERDICT r11 what's-wrong #4): the 300x probe measured
`streaming_session_windows` growing 13x under RocksDB vs 7x under the
HDFS-backed provider, and attributed the split to per-micro-batch
RocksDB open/commit overhead — a hypothesis. This script turns it into
a measurement: a StreamingQueryListener captures every
StreamingQueryProgress emitted during one full run, and the artifact
records per-batch input rows, state rows, and the state-store phase
timings (allUpdatesTimeMs / allRemovalsTimeMs / commitTimeMs) plus the
provider-specific customMetrics (rocksdb* latencies for RocksDB,
loadedMapCache* for HDFS), summed and per-batch.

The provider comes from SPARK_GRAFT_STATESTORE exactly as in the scale
probes (session-level conf — run the script once per provider, fresh
process each):

  python scripts/streaming_state_profile.py /tmp/hgn_scale/sf30 out.json
  SPARK_GRAFT_STATESTORE=rocksdb python scripts/streaming_state_profile.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROW = "streaming_session_windows"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hgn_scale/sf30"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql.streaming import StreamingQueryListener

    from hgn_spark import registry
    from hgn_spark.session import get_spark

    progresses: list[dict] = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802 — Spark API
            pass

        def onQueryProgress(self, event):  # noqa: N802
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    spark = get_spark(app_name="streaming_state_profile")
    spark.streams.addListener(_Capture())
    fn = registry.load_all()[ROW].fn

    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    # availableNow delivers progress events asynchronously. A fixed
    # sleep can silently miss late events on a loaded host (ADVICE
    # r12) — poll until the captured count is stable for 2 s (bounded
    # at 30 s) and record whether the drain converged so an
    # undercounted artifact is visibly flagged rather than trusted.
    drain_converged = False
    deadline = time.monotonic() + 30.0
    while time.monotonic() < deadline:
        seen = len(progresses)
        time.sleep(2.0)
        if len(progresses) == seen:
            drain_converged = True
            break

    batches = []
    for p in progresses:
        ops = p.get("stateOperators") or []
        op = ops[0] if ops else {}
        custom = {
            k: v
            for k, v in (op.get("customMetrics") or {}).items()
            if k.startswith(("rocksdb", "loadedMapCache"))
            and isinstance(v, (int, float))
            and v != 0
        }
        batches.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "batch_duration_ms": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
                "state_rows_total": op.get("numRowsTotal"),
                "updates_ms": op.get("allUpdatesTimeMs"),
                "removals_ms": op.get("allRemovalsTimeMs"),
                "commit_ms": op.get("commitTimeMs"),
                "custom": custom,
            }
        )

    def _tot(key: str) -> int:
        return sum(b[key] or 0 for b in batches if b.get(key) is not None)

    custom_totals: dict[str, float] = {}
    for b in batches:
        for k, v in b["custom"].items():
            custom_totals[k] = custom_totals.get(k, 0) + v

    out = {
        "probe": "streaming_state_profile_r12",
        "row": ROW,
        "sf_dir": sf_dir,
        "state_store_provider": os.environ.get("SPARK_GRAFT_STATESTORE", "hdfs"),
        "wall_s": wall,
        "n_batches": len(batches),
        "drain_converged": drain_converged,
        "totals_ms": {
            "updates": _tot("updates_ms"),
            "removals": _tot("removals_ms"),
            "commit": _tot("commit_ms"),
            "trigger_execution": _tot("batch_duration_ms"),
        },
        "custom_totals": custom_totals,
        "batches": batches,
    }
    js = json.dumps(out)
    print(js)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(js + "\n")


if __name__ == "__main__":
    main()
