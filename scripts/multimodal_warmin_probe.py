"""Per-execution warm-in curve for the multimodal rows (VERDICT r9
what's-wrong #1 / next-round #3): `multimodal_decode_resize` read 1.62x
its r8 value in the r9 driver bench on byte-identical code; the
suspected mechanism is that Arrow/Python-worker (mapInPandas) plans
warm in over MORE executions than the suite's warm+2 provides — the
Python worker pool, Arrow serializer paths, and per-plan codegen all
JIT deeper into the run.

This probe pins the curve: a fresh tuned session, the bench's engine
warm-up preamble, then N consecutive executions of the row with
per-execution wall clock recorded (no cache clearing — the row holds
no registered session cache; each execution re-runs the full
decode/resize pipeline). If steady state lands around execution 4+,
the suite's single warm execution leaves both timed passes in the
declining regime, and bench.py's extra multimodal warm execution (r10)
is the right fix.

Usage: python scripts/multimodal_warmin_probe.py [n_execs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from hgn_spark import registry
    from hgn_spark.session import get_spark

    rows = registry.load_all()
    spark = get_spark(app_name="multimodal_warmin_probe")
    # The bench preamble's Python-worker warm-up, verbatim in spirit:
    # without it execution 1 also pays the ~10 s worker-pool spawn.
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).groupBy(
        "n_regionkey"
    ).count().write.format("noop").mode("overwrite").save()
    spark.range(spark.sparkContext.defaultParallelism * 2).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: (pdf for pdf in it), schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for name in ("multimodal_decode_resize", "multimodal_binary_meta"):
        fn = rows[name].fn
        curve = []
        for i in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            curve.append(dt)
            print(f"# {name} exec {i + 1}: {dt:.2f}s", file=sys.stderr, flush=True)
        out[name] = curve

    print(
        json.dumps(
            {
                "probe": "multimodal_warmin",
                "sf_dir": sf_dir,
                "n_execs": n,
                "curves": out,
            }
        )
    )


if __name__ == "__main__":
    main()
