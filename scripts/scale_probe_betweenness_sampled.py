"""Brandes source-sampled betweenness at the 1000x-class tier
(VERDICT r12 #4): `edge_betweenness_sampled` exists with small-graph
parity tests, but no scale probe measured its time+accuracy trade at
the tier where HGN's init_betweenness binds (16.7x growth at 1000x,
PROBE_hgn_phases_r12 — the steepest phase).

Per scale (sf0.1 derived graph, 1000x-class slice):
  - exact: the shipped init path (`edge_betweenness`, k=2 paths
    method) — the baseline the phase table measured;
  - sampled at source_fraction in FRACTIONS: wall + accuracy.

Accuracy is reported in the terms HGN actually consumes:
  - flag agreement at the probe threshold (betweenness > THRES is the
    deletion-rule input): precision/recall of the sampled flag vs the
    exact flag;
  - top-N edge overlap (N = 100 and 1% of edges) — ranking agreement
    for consumers that rank rather than threshold.

Notes: the sampled estimator runs the sigma/delta (Brandes) kernel,
the exact k=2 baseline runs path enumeration — at k=2 enumeration is
the faster kernel (ARCHITECTURE betweenness table: 1.9 s vs 7.7 s on
Hamsterster), so the wall comparison is dial-vs-SHIPPED-BASELINE, not
dial-vs-itself: the honest question is whether fraction f makes the
sigma kernel beat the enumeration baseline at this tier, not whether
f*T_sigma < T_sigma. Edges only reachable from unsampled sources get
estimate 0 (absent) — that is the estimator's contract.

Timed probe: run in a quiet window (memory note #7).

Usage: python scripts/scale_probe_betweenness_sampled.py [scales] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SCALES = "sf0.1=/root/testdata/sf0.1,1000x=/tmp/hgn_scale/sf100graph"
FRACTIONS = (0.25, 0.1)
THRES = 3.0  # the phases probe's betweenness_thres (delete-rule input)


def main() -> None:
    scales = [
        tuple(s.split("=", 1))
        for s in (sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SCALES).split(",")
    ]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    from hgn_spark.graph.betweenness import (
        edge_betweenness,
        edge_betweenness_sampled,
    )
    from hgn_spark.graph.queries import derived_edges
    from hgn_spark.registry import clear_session_caches
    from hgn_spark.session import get_spark

    spark = get_spark(app_name="betweenness_sampled_probe")
    out: dict = {
        "probe": "betweenness_sampled_r13",
        "thres": THRES,
        "load_avg_start": round(os.getloadavg()[0], 2),
        "scales": {},
    }
    for label, sf_dir in scales:
        if not os.path.isdir(sf_dir):
            print(f"# skip {label}: missing", file=sys.stderr)
            continue
        clear_session_caches(blocking=True)
        spark.sparkContext._jvm.System.gc()
        edges = derived_edges(spark, sf_dir).localCheckpoint(eager=True)

        # Wall = materialize the full estimate (localCheckpoint is the
        # drain); accuracy aggregations run distributed afterwards —
        # the 1000x edge set is millions of rows, never collected.
        t0 = time.perf_counter()
        exact_df = edge_betweenness(edges, max_sp_length=2).localCheckpoint(
            eager=True
        )
        t_exact = round(time.perf_counter() - t0, 2)
        n_edges = exact_df.count()
        exact_flag_df = exact_df.filter(F.col("betweenness") > THRES).select(
            "src", "dst"
        )
        n_flag_exact = exact_flag_df.count()
        top_ns = sorted({100, max(1, n_edges // 100)})
        tops_exact = {
            n_top: {
                (r["src"], r["dst"])
                for r in exact_df.orderBy(
                    F.col("betweenness").desc(), "src", "dst"
                ).limit(n_top).collect()
            }
            for n_top in top_ns
        }
        res: dict = {
            "n_edges": n_edges,
            "n_flagged_exact": n_flag_exact,
            "exact": {"secs": t_exact, "method": "paths_k2"},
        }
        for frac in FRACTIONS:
            clear_session_caches(blocking=True)
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            est_df = edge_betweenness_sampled(
                edges, max_sp_length=2, source_fraction=frac
            ).localCheckpoint(eager=True)
            t_s = round(time.perf_counter() - t0, 2)
            est_flag_df = est_df.filter(F.col("betweenness") > THRES).select(
                "src", "dst"
            )
            n_flag_est = est_flag_df.count()
            tp = est_flag_df.join(exact_flag_df, ["src", "dst"]).count()
            entry: dict = {
                "secs": t_s,
                "speedup_vs_exact": round(t_exact / t_s, 2) if t_s else None,
                "n_estimated_edges": est_df.count(),
                "flag_precision": round(tp / n_flag_est, 4) if n_flag_est else None,
                "flag_recall": round(tp / n_flag_exact, 4) if n_flag_exact else None,
            }
            for n_top in top_ns:
                got = {
                    (r["src"], r["dst"])
                    for r in est_df.orderBy(
                        F.col("betweenness").desc(), "src", "dst"
                    ).limit(n_top).collect()
                }
                entry[f"top{n_top}_overlap"] = round(
                    len(tops_exact[n_top] & got) / n_top, 4
                )
            est_df.unpersist(blocking=True)
            res[f"sampled_{frac}"] = entry
            print(f"# {label} f={frac}: {json.dumps(entry)}",
                  file=sys.stderr, flush=True)
        exact_df.unpersist(blocking=True)
        out["scales"][label] = res
        print(f"# {label} exact: {json.dumps(res['exact'])}",
              file=sys.stderr, flush=True)
    js = json.dumps(out)
    print(js)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(js + "\n")


if __name__ == "__main__":
    main()
