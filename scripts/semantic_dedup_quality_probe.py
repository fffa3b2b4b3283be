"""Semantic-dedup (SemDeDup) duplicate-detection QUALITY probe
(VERDICT r13 #8): `dedup_semantic_clusters` has driver-hash
correctness, but its ceil(sqrt(n)) cluster-count heuristic had never
been measured on a corpus with real cluster structure — the same gap
the ANN/text guards closed in r12/r13. The operator's documented
blind spot is CROSS-CLUSTER near-dups (a pair straddling two
k-means-style cells is never verified); this probe turns that prose
caveat into a per-stratum number.

Corpus: the mixture-of-Gaussians clustered corpus (the hard case for
cell-bucketed dedup — real cluster structure the seeds may or may not
align with) + hicos planted companions at cos ~{0.851, 0.901, 0.951}
(gen_probe_corpus.py hicos over probe_clustered_*), so the truth at
the probe threshold 0.9 contains the planted 0.901/0.951 pairs plus
whatever natural tight-cluster pairs cross it — ALL recovered exactly
by blocked numpy (same rounding as the operator: round(cos, 6) >=
thres).

Measured per scale:
  - expected drops: {v : exists u < v with cos(u, v) >= thres}
    (the operator's own parallel-safe drop rule, evaluated globally
    — i.e. what a cluster-free exact pass would drop);
  - recall = |dropped ∩ expected| / |expected| — the fraction the
    cluster bucketing actually catches (misses == cross-cluster
    pairs, the heuristic's cost);
  - per-stratum recall, stratified by each expected-drop's BEST
    earlier-neighbor cosine (0.90/0.95 strata hold the planted
    pairs);
  - false drops (must be 0 — the within-cluster verify is exact, so
    any nonzero value is a BUG, not a tradeoff);
  - n_clusters = ceil(sqrt n) and secs_spark for the cost side.

Quality numbers are load-immune; secs_* are not.

Usage: python scripts/semantic_dedup_quality_probe.py [scales] [out.json] [thres]
  scales default:
  "2k=/tmp/hgn_scale/probe_semdup_2k,24k=/tmp/hgn_scale/probe_semdup_24k"
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

DEFAULT_SCALES = (
    "2k=/tmp/hgn_scale/probe_semdup_2k,24k=/tmp/hgn_scale/probe_semdup_24k"
)
THRES = 0.9
STRATA = (0.90, 0.95)


def main() -> None:
    scales = [
        tuple(s.split("=", 1))
        for s in (sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SCALES).split(",")
    ]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    thres = float(sys.argv[3]) if len(sys.argv) > 3 else THRES

    from recall_probe import _load_vectors, _np_threshold_pairs

    from hgn_spark.operators.dedup import dedup_semantic_clusters
    from hgn_spark.registry import clear_session_caches
    from hgn_spark.session import get_spark

    spark = get_spark(app_name="semantic_dedup_quality")
    out: dict = {
        "probe": "semantic_dedup_quality_r14",
        "thres": thres,
        "load_avg_start": round(os.getloadavg()[0], 2),
        "scales": {},
    }
    for label, sf_dir in scales:
        if not os.path.isdir(sf_dir):
            print(f"# skip {label}: missing {sf_dir}", file=sys.stderr)
            continue
        ids, mat = _load_vectors(sf_dir)
        n = len(ids)
        # Exact truth with the operator's own rounding; block=1024
        # keeps the per-block cosine slab ~1024 x n doubles.
        pairs = _np_threshold_pairs(ids, mat, thres, block=1024, scores=True)
        # Best earlier-neighbor cosine per expected-drop vector (the
        # operator drops v2 of every (v1 < v2) in-threshold pair).
        best: dict[int, float] = {}
        for (_, v2), c in pairs.items():
            if c > best.get(v2, -1.0):
                best[v2] = c
        expected = set(best)
        res: dict = {
            "n": n,
            "n_true_pairs": len(pairs),
            "n_expected_drops": len(expected),
        }
        import math

        res["n_clusters"] = math.ceil(math.sqrt(n))
        # m = 2 (top-2 cell assignment, the IVF-multiprobe idea
        # applied to SemDeDup's cell partition) is the shipped r14
        # default after this probe's m1-vs-m2 A/B; m = 1 stays the
        # blind-spot baseline column.
        for m in (1, 2):
            clear_session_caches(blocking=True)
            t0 = time.perf_counter()
            rows = (
                dedup_semantic_clusters(
                    spark, sf_dir, thres=thres, multi_assign=m
                )
                .filter("NOT kept")
                .select("vec_id")
                .collect()
            )
            entry: dict = {"secs_spark": round(time.perf_counter() - t0, 2)}
            dropped = {r["vec_id"] for r in rows}
            entry["n_dropped"] = len(dropped)
            entry["false_drops"] = len(dropped - expected)
            if expected:
                entry["recall"] = round(
                    len(dropped & expected) / len(expected), 4
                )
            for lo in STRATA:
                hi = lo + 0.05
                bucket = {v for v, c in best.items() if lo <= c < hi}
                if bucket:
                    entry[f"recall_cos_{lo:.2f}"] = round(
                        len(dropped & bucket) / len(bucket), 4
                    )
                    entry[f"n_cos_{lo:.2f}"] = len(bucket)
            res[f"m{m}"] = entry
            print(f"# {label} m={m}: {json.dumps(entry)}",
                  file=sys.stderr, flush=True)
        out["scales"][label] = res
    js = json.dumps(out)
    print(js)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(js + "\n")


if __name__ == "__main__":
    main()
