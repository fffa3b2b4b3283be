"""Committed diagnostic for the round-8 PageRank progression
(VERDICT r8 #8): measure the NAIVE branch union — `pagerank` +
`personalized_pagerank` run as two independent loops, each building
its own link table — against the shipped fused row
(`graph_pagerank`), on the same tree, alone, min of N passes.

The naive number was quoted in ARCHITECTURE.md's round-8 paragraph
from an uncommitted diagnostic pass (~12 s); this script makes it
reproducible and its output (PROBE_pagerank_naive_r9.json) is the
committed artifact the narrative traces to. Run it on an otherwise
idle host — the bench-integrity policy applies to diagnostics too.

Usage: python scripts/pagerank_naive_probe.py [sf_dir] [n_passes]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from hgn_spark.graph.pagerank import personalized_pagerank
    from hgn_spark.graph.pagerank import pagerank as pr_uniform
    from hgn_spark.graph.queries import (
        PPR_N_SEEDS,
        PR_DAMPING,
        PR_ITER,
        derived_edges,
        graph_pagerank,
    )
    from hgn_spark.registry import clear_session_caches
    from hgn_spark.session import get_spark

    spark = get_spark(app_name="pagerank_naive_probe")
    # Engine warm-up, untimed (same rationale as bench.py/scale_probe):
    # scan + shuffle + codegen, so pass-1 timings don't carry one-time
    # session costs (measured: 19 s cold vs 5.6 s warm for the same
    # fused variant).
    spark.read.parquet(f"{sf_dir}/nation.parquet").groupBy(
        "n_regionkey"
    ).count().write.format("noop").mode("overwrite").save()
    derived_edges(spark, sf_dir).groupBy("src").count().write.format(
        "noop"
    ).mode("overwrite").save()

    def naive_union(spark, sf_dir):
        """The rejected design: two seed-folded loops, no shared link
        table — 2x graph builds, 2x PR_ITER shuffle rounds."""
        e = derived_edges(spark, sf_dir)
        seeds = (
            e.select(F.col("src").alias("id"))
            .distinct()
            .orderBy("id")
            .limit(PPR_N_SEEDS)
        )
        uni = pr_uniform(e, damping=PR_DAMPING, n_iter=PR_ITER).select(
            F.lit("uniform").alias("method"),
            "id",
            F.round("pagerank", 6).alias("pagerank"),
        )
        ppr = personalized_pagerank(
            e, seeds, damping=PR_DAMPING, n_iter=PR_ITER
        ).select(
            F.lit("ppr").alias("method"),
            "id",
            F.round("pagerank", 6).alias("pagerank"),
        )
        return uni.unionByName(ppr)

    variants = {"fused_shipped": graph_pagerank, "naive_union": naive_union}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(n_passes):
        for name, fn in variants.items():
            clear_session_caches()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))

    out = {
        "probe": "pagerank_naive_vs_fused",
        "sf_dir": sf_dir,
        "n_iter": PR_ITER,
        "passes": times,
        "min_sec": {k: min(v) for k, v in times.items()},
        "ratio_naive_over_fused": round(
            min(times["naive_union"]) / min(times["fused_shipped"]), 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
