"""Sub-attribution of HGN's loop_delete_rule phase (r13 follow-up to
PROBE_hgn_phases_r13): the pair-form dial moved the phase only ~8% at
1000x (105.5 -> 97.3 s), so the dominant term is SHARED by the array
and pair forms. This probe times the phase's component frames
separately (each drained via noop write, session caches cleared
between components) to name that term:

  - p2_expand: neighbor_pairs(level=2) — the sym⋈sym 2-hop expansion
    + distinct, the input both r-metric forms share;
  - rmetrics_scored: r_metrics_edges_pairs scored frame (includes its
    own p2 recompute — subtract p2_expand for the marginal cost);
  - members2: the common-member rows (ditto);
  - weights: hybrid_edge_weights_pairs over materialized
    scored/members2 + precomputed sims — the weights pipeline alone;
  - betw_join_filter: the to_delete join/filter over materialized
    weights + betweenness.

One iteration's shape (the registered config runs 2 near-identical
steps). Timed probe — quiet window.

Usage: python scripts/hgn_delete_rule_subphase.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hgn_scale/sf100graph"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table
    from hgn_spark.graph.betweenness import edge_betweenness
    from hgn_spark.graph.core import canonicalize, neighbor_pairs
    from hgn_spark.graph.queries import R1_THRES, R2_THRES, derived_edges
    from hgn_spark.graph.rmetrics import r_metrics_edges_pairs
    from hgn_spark.graph.weights import (
        hybrid_edge_weights_pairs,
        one_hot_cosine_similarities,
    )
    from hgn_spark.registry import clear_session_caches
    from hgn_spark.session import get_spark

    spark = get_spark(app_name="hgn_delete_rule_subphase")
    out: dict = {
        "probe": "hgn_delete_rule_subphase_r13",
        "sf_dir": sf_dir,
        "load_avg_start": round(os.getloadavg()[0], 2),
    }

    def _noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    clear_session_caches(blocking=True)
    spark.sparkContext._jvm.System.gc()
    e = canonicalize(derived_edges(spark, sf_dir)).localCheckpoint(eager=True)
    vertices = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_nationkey").alias("nationkey")
    )
    sims = one_hot_cosine_similarities(e, vertices, ["nationkey"])
    sims = sims.union(
        sims.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "similarity"
        )
    ).localCheckpoint(eager=True)
    betw = edge_betweenness(e, max_sp_length=2).localCheckpoint(eager=True)
    out["n_edges"] = e.count()

    spark.sparkContext._jvm.System.gc()
    out["p2_expand_secs"] = _noop(neighbor_pairs(e, level=2))
    out["p2_rows"] = neighbor_pairs(e, level=2).count()

    spark.sparkContext._jvm.System.gc()
    scored, members2 = r_metrics_edges_pairs(e, R1_THRES, R2_THRES)
    out["rmetrics_scored_secs"] = _noop(scored)
    spark.sparkContext._jvm.System.gc()
    out["members2_secs"] = _noop(members2)
    out["members2_rows"] = members2.count()

    # materialize r-metrics outputs so the weights timing is ITS cost
    spark.sparkContext._jvm.System.gc()
    scored_m = scored.localCheckpoint(eager=True)
    members_m = members2.localCheckpoint(eager=True)
    spark.sparkContext._jvm.System.gc()
    weights = hybrid_edge_weights_pairs(scored_m, members_m, sims, 0.5)
    out["weights_secs"] = _noop(weights)

    spark.sparkContext._jvm.System.gc()
    weights_m = weights.localCheckpoint(eager=True)
    to_delete = (
        weights_m.join(betw, ["src", "dst"], "inner")
        .filter(
            (F.col("edge_weight") < 0.5)
            | ((F.col("edge_weight") >= 0.5) & (F.col("betweenness") > 3.0))
        )
        .select("src", "dst")
    )
    out["betw_join_filter_secs"] = _noop(to_delete)

    js = json.dumps(out)
    print(js)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(js + "\n")


if __name__ == "__main__":
    main()
