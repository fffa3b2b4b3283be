"""Data-bound scaling probe (VERDICT r6 #4): time the heaviest
data-proportional queries at sf0.1 and at the k×-replicated slice
(scripts/gen_scale_slice.py), print per-query growth factors.

At sf0.1 the suite is overhead-bound (ARCHITECTURE.md's measured-
scaling caveat); at 10× the data the fixed JVM costs amortize and the
growth factor becomes a real statement about the plan's data term —
the first empirical support for the 100 TB claims.

Usage: python scripts/scale_probe.py [scaled_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

# The data-proportional headline set: per-doc HOF text passes, the two
# shingle-bucket dedup pipelines, the multikey/theta self-join, and the
# iterative HGN loop (graph k× larger, same structure per replica).
PROBES = [
    "text_profile",
    "decontaminate_ngram_overlap",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "join_theta_multikey",
    "hgn_communities",
    # round-7 additions: scan-side chunking/pair-counting (pure
    # data-proportional HOF passes) and cluster-bucketed semantic
    # dedup (pair work bounded by cluster sizes).
    "chunk_documents",
    "text_vocab_top_pairs",
    "dedup_semantic_clusters",
]


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hgn_scale/sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from hgn_spark.registry import clear_session_caches, load_all
    from hgn_spark.session import get_spark

    specs = load_all()
    spark = get_spark(app_name="scale_probe")
    # Engine warm-up (same rationale as bench.py): one shuffle + one
    # mapInPandas + one HOF pass, untimed.
    spark.read.parquet(f"{BASE}/nation.parquet").groupBy(
        "n_regionkey"
    ).count().write.format("noop").mode("overwrite").save()
    spark.range(64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()
    # HOF warm-up: the interpreted lambda evaluator + its ~5 s one-time
    # JIT/codegen cost must not bill to the first (HOF-heavy) probe.
    _v = spark.range(64).agg(
        F.collect_list(F.col("id").cast("double")).alias("a")
    )
    _v.select(
        F.aggregate(
            F.zip_with("a", "a", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dot"),
        F.transform("a", lambda x: x * 2).alias("t"),
    ).write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, float]] = {}
    for sf_dir, label in ((BASE, "sf0.1"), (scaled, "scaled")):
        times: dict[str, float] = {}
        for _ in range(runs):
            clear_session_caches()
            spark.sparkContext._jvm.System.gc()
            for name in PROBES:
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                times[name] = min(times.get(name, float("inf")), dt)
                print(f"# {label} {name}: {dt:.2f}s", file=sys.stderr, flush=True)
        out[label] = {n: round(t, 2) for n, t in times.items()}

    growth = {
        n: round(out["scaled"][n] / out["sf0.1"][n], 2)
        for n in PROBES
        if out["sf0.1"].get(n)
    }
    print(json.dumps({"base": out["sf0.1"], "scaled": out["scaled"], "growth": growth}))


if __name__ == "__main__":
    main()
