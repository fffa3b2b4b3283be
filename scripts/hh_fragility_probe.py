"""Pin the cause of the heavy-hitters bench fragility (VERDICT r8
"What's wrong #1"): the driver's round-8 artifact recorded
`heavy_hitters_user_events` at 2.03x its r7 number while the same
tree measured 0.97x alone — a 2x swing on an unchanged sub-second
query. Hypotheses: (a) the query is contention-sensitive beyond its
neighbors (it runs 3 tiny sequential jobs — sample-agg+limit,
broadcast build, exact agg — so per-job scheduling latency is a
large fraction of its wall time), vs (b) first-touch JIT/codegen.

Protocol: one warmed session; REPS timed runs of the heavy-hitters
row and a same-cost control row (`json_date_daily`, also sub-second,
2 jobs) interleaved, first alone, then with CPU_BURNERS spinning
processes pinning every core. Prints one JSON with both
distributions and the contended/alone ratio per query. Run on an
otherwise idle host so the 'alone' phase is actually alone.

Usage: python scripts/hh_fragility_probe.py [sf_dir] [reps] [burners]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BURN = "while True:\n pass"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_burn = int(sys.argv[3]) if len(sys.argv) > 3 else max(os.cpu_count() or 8, 8)

    from hgn_spark.registry import load_all
    from hgn_spark.session import get_spark

    specs = load_all()
    spark = get_spark(app_name="hh_fragility_probe")
    names = ["heavy_hitters_user_events", "json_date_daily"]

    # Warm: one untimed run of each (codegen compiled, events footer
    # cached) — so timed variance is steady-state, not first-touch.
    for n in names:
        specs[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def timed_phase() -> dict[str, list[float]]:
        out: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(reps):
            for n in names:
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                specs[n].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[n].append(round(time.perf_counter() - t0, 3))
        return out

    alone = timed_phase()
    burners = [
        subprocess.Popen([sys.executable, "-c", BURN]) for _ in range(n_burn)
    ]
    try:
        time.sleep(1.0)  # let the burners saturate before timing
        contended = timed_phase()
    finally:
        for p in burners:
            p.kill()

    def stats(xs: list[float]) -> dict[str, float]:
        s = sorted(xs)
        return {
            "min": s[0],
            "median": s[len(s) // 2],
            "max": s[-1],
        }

    print(
        json.dumps(
            {
                "probe": "heavy_hitters_fragility",
                "sf_dir": sf_dir,
                "reps": reps,
                "burners": n_burn,
                "alone": {n: stats(v) for n, v in alone.items()},
                "contended": {n: stats(v) for n, v in contended.items()},
                "contended_over_alone_min": {
                    n: round(min(contended[n]) / min(alone[n]), 2) for n in names
                },
                "contended_over_alone_median": {
                    n: round(
                        sorted(contended[n])[reps // 2]
                        / sorted(alone[n])[reps // 2],
                        2,
                    )
                    for n in names
                },
                "raw": {"alone": alone, "contended": contended},
            }
        )
    )


if __name__ == "__main__":
    main()
