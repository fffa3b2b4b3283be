"""HGN 1000x-class phase attribution (VERDICT r11 #7): the r11 graph
probe measured the HGN row growing 13.7x for 1000x data — the
steepest of the three graph rows (pagerank 3.1x, LPA 4.7x) — with no
attribution of WHICH phase carries the growth. This probe re-runs the
registered row's exact configuration (derived_edges + supplier
vertices, max_steps=3 — graph/queries.py:839-864) through
`hgn_communities(phase_timings=...)`, whose eager-checkpoint phase
boundaries yield true materialization costs per phase:

  init_canonicalize | init_sims | init_betweenness
  loop_delete_rule (accumulated) | loop_anti_join (accumulated)
  final_cc | final_drain (the returned plan's noop evaluation)

Run at two scales and the per-phase growth factors name the
superlinear phase (if any) the way the IVF probe named the exact
assign.

r13 (VERDICT r12 #3): each scale now runs BOTH delete-rule
formulations — "arrays" (the r12 shape: neighbor arrays +
interpreted array_intersect per edge) and "pairs"
(r_metrics_edges_pairs: flat (id, nb) equi-joins, codegen, no
arrays) — so the mitigation dial's delta is attributed per phase in
one window. Results are bit-identical across impls (pinned by
tests/test_graph.py); only the plan shape differs.

Usage: python scripts/scale_probe_hgn_phases.py [scales] [out.json]
  scales default:
  "sf0.1=/root/testdata/sf0.1,1000x=/tmp/hgn_scale/sf100graph"
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SCALES = "sf0.1=/root/testdata/sf0.1,1000x=/tmp/hgn_scale/sf100graph"


def main() -> None:
    scales = [
        tuple(s.split("=", 1))
        for s in (sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SCALES).split(",")
    ]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table
    from hgn_spark.graph.hgn import HGNParams, hgn_communities
    from hgn_spark.graph.queries import R1_THRES, R2_THRES, derived_edges
    from hgn_spark.registry import clear_session_caches
    from hgn_spark.session import get_spark

    spark = get_spark(app_name="hgn_phase_probe")
    out: dict = {"probe": "hgn_phases_r13", "load_avg_start": round(os.getloadavg()[0], 2), "scales": {}}
    for label, sf_dir in scales:
        if not os.path.isdir(sf_dir):
            print(f"# skip {label}: missing", file=sys.stderr)
            continue
        per_impl: dict = {}
        # r13 (VERDICT r12 #3): both delete-rule formulations, same
        # config — the "pairs" column is the dial turned; "arrays" is
        # the r12 baseline re-measured in the same window. The inputs
        # are re-derived AFTER each cache clear (clearing drops the
        # session-cached derived_edges' checkpoint blocks — deriving
        # first then clearing is a CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
        for impl in ("arrays", "pairs"):
            clear_session_caches(blocking=True)
            spark.sparkContext._jvm.System.gc()
            edges = derived_edges(spark, sf_dir)
            vertices = load_table(spark, sf_dir, "supplier").select(
                F.col("s_suppkey").alias("id"),
                F.col("s_nationkey").alias("nationkey"),
            )
            params = HGNParams(
                r_lvl1_thres=R1_THRES,
                r_lvl2_thres=R2_THRES,
                max_edge_weight=0.5,
                betweenness_thres=3.0,
                feature_min_avg=0.5,
                max_steps=3,
                max_sp_length=2,
                delete_rule_impl=impl,
            )
            timings: dict[str, float] = {}
            t0 = time.perf_counter()
            res = hgn_communities(
                vertices, edges, ["nationkey"], params, phase_timings=timings
            )
            t1 = time.perf_counter()
            res.write.format("noop").mode("overwrite").save()
            timings["final_drain"] = round(time.perf_counter() - t1, 3)
            timings["total"] = round(time.perf_counter() - t0, 3)
            per_impl[impl] = timings
            print(f"# {label}/{impl}: {json.dumps(timings)}",
                  file=sys.stderr, flush=True)
        out["scales"][label] = per_impl

    labels = [lb for lb, _ in scales if lb in out["scales"]]
    if len(labels) == 2:
        a, b = labels
        out["phase_growth"] = {
            impl: {
                k: round(out["scales"][b][impl][k] / out["scales"][a][impl][k], 1)
                for k in out["scales"][a][impl]
                if k != "n_steps"
                and isinstance(out["scales"][a][impl].get(k), (int, float))
                and isinstance(out["scales"][b][impl].get(k), (int, float))
                and out["scales"][a][impl][k] > 0
            }
            for impl in ("arrays", "pairs")
            if impl in out["scales"][a] and impl in out["scales"][b]
        }
    js = json.dumps(out)
    print(js)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(js + "\n")


if __name__ == "__main__":
    main()
