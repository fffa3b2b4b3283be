"""Round-14 optimization profiling (guide §1: measure first).

For each headline query: time the CONSTRUCTION (the registry fn call —
any driver-blocking sizing actions, checkpoints, calibrations run
here) separately from the DRAIN (noop sink), and record how many Spark
jobs each phase submitted. The bench total only shows fn+drain fused;
this split is what points at "driver-side orchestration" vs "the plan
itself" — the r14 branch_timings suggested most of the heavy rows'
cost is construction-side.

Usage: python scripts/opt_profile_r14.py [row ...]   (default: all 50)
Writes one JSON line to stdout and PROFILE_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hgn_spark.registry import clear_session_caches, load_all
    from hgn_spark.session import get_spark

    specs = load_all()
    rows = sys.argv[1:] or list(specs)
    spark = get_spark(app_name="opt_profile_r14")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # Engine warm-up (same rationale as bench.py).
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).groupBy(
        "n_regionkey"
    ).count().write.format("noop").mode("overwrite").save()
    sc.range(sc.defaultParallelism * 2).count()
    spark.range(sc.defaultParallelism * 2).repartition(
        sc.defaultParallelism
    ).mapInPandas(lambda it: (pdf for pdf in it), schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in rows:
        spec = specs.get(name)
        if spec is None:
            continue
        # Warm execution so both measured phases are steady-state.
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        clear_session_caches(blocking=True)
        sc._jvm.System.gc()

        j0 = len(tracker.getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"profile:{name}:construct")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t_construct = time.perf_counter() - t0
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"profile:{name}:drain")
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_drain = time.perf_counter() - t1
        j2 = len(tracker.getJobIdsForGroup(None) or [])
        # Second drain on the SAME frame: how much of the drain is
        # one-shot (codegen compile) vs recurring.
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_redrain = time.perf_counter() - t2
        sc.setJobDescription(None)
        out[name] = {
            "construct_s": round(t_construct, 3),
            "drain_s": round(t_drain, 3),
            "redrain_s": round(t_redrain, 3),
            "construct_jobs": j1 - j0,
            "drain_jobs": j2 - j1,
        }
        print(
            f"# {name}: construct {t_construct:.2f}s/{j1 - j0}j "
            f"drain {t_drain:.2f}s/{j2 - j1}j redrain {t_redrain:.2f}s",
            file=sys.stderr,
        )

    res = {"sf_dir": sf_dir, "rows": out}
    js = json.dumps(res)
    print(js)
    (_REPO / "PROFILE_r14.json").write_text(js + "\n")


if __name__ == "__main__":
    main()
