"""Recall probe for every scale-guard variant (VERDICT r10 #1): each
guard is hash-proven to return *different* (fewer) results than its
exact twin — this probe measures HOW MUCH of the truth each guard
keeps, per scale, so "proven different" becomes "proven good".

For each guard: recall = |guard-results ∩ exact-results| /
|exact-results|, where "exact" is the strongest ground truth that
exists for that family:

- jaccard ``cap`` / ``vs_corpus_cap`` / ``in_batch_cap``: the UNCAPPED
  exact-jaccard pair list — a true exact twin (same verify, candidate
  generation un-gated).
- ``simhash_cap``: the uncapped simhash pair list (the guard's exact
  twin per the judge's framing — what the cap itself loses; simhash's
  own recall vs jaccard truth is pinned separately in tests).
- ``srp_adaptive`` (and the pinned 16-bit SRP for context): TWO
  numbers — (a) recall vs the brute-force cosine>=EMB_COS_THRES pair
  set (numpy oracle, cross-validated against a Spark brute-force at
  the base scale), the intrinsic sketch recall; (b) overlap vs the
  pinned-width twin, what the adaptive knob itself changes.
- ``ivf_adaptive`` / ``lsh_adaptive``: mean top-k overlap vs the exact
  brute-force top-k (numpy oracle, cross-validated against the
  registered `simsearch_exact_topk` at the base scale).

Ground-truth scaling: the numpy oracle (blocked matmul over the raw
parquet vectors) runs far past where the interpreted-HOF Spark exact
twin is practical, so the probe covers sf0.1 (base), 10x and 30x; the
base-scale cross-validation is what entitles the numpy numbers to be
called "exact".

Recall caveat that the artifact must carry: the embedding corpus is
ISOTROPIC (mean same-cluster cosine ~0.002, documented on
simsearch_topk_cosine), which is the worst case for every
locality-sensitive method — there is no cluster structure for buckets
to exploit, so ANN recall here is a LOWER bound on structured-corpus
recall. The tuning rows (nprobe / multiprobe sweeps) demonstrate the
recall/cost dial the deployment would turn.

Usage: python scripts/recall_probe.py [scales] [guards] [out.json]
  scales: comma list of label=dir, default
          "sf0.1=/root/testdata/sf0.1,10x=/tmp/hgn_scale/sf1,30x=/tmp/hgn_scale/sf3"
  guards: comma subset of
          jaccard_cap,inc_cap,simhash_cap,minhash,srp,ann (default all)

r12 corpora (scripts/gen_probe_corpus.py; PROBE_recall_r12 merges the
runs): labels ending in the BASE_LABEL re-cross-validate the numpy
truth against the Spark exact paths, so name them accordingly —
  python scripts/gen_probe_corpus.py hicos /root/testdata/sf0.1 DIR
  python scripts/recall_probe.py "hicos_sf0.1=DIR,..." srp out.json
  python scripts/gen_probe_corpus.py clustered 2000 DIR2
  python scripts/recall_probe.py "clustered_sf0.1=DIR2,..." srp,ann out2.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_SCALES = (
    "sf0.1=/root/testdata/sf0.1,10x=/tmp/hgn_scale/sf1,30x=/tmp/hgn_scale/sf3"
)
BASE_LABEL = "sf0.1"  # the scale where Spark exact twins cross-validate numpy


def _log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _pairs(df, c1: str, c2: str) -> set[tuple[int, int]]:
    return {(r[c1], r[c2]) for r in df.select(c1, c2).collect()}


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def _recall(guard: set, exact: set) -> float | None:
    return round(len(guard & exact) / len(exact), 4) if exact else None


# ---------------------------------------------------------------- numpy oracle


def _load_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, float64 matrix) from the embeddings parquet — via
    Arrow buffers, not fetchall (identical values; fetchall builds one
    Python tuple per row, which is minutes at 10^6+ vectors vs seconds
    here — the r13 srp-cap probe's lesson, now shared by every probe
    so the r14 1000x ANN tier loads in seconds)."""
    import duckdb

    p = os.path.join(sf_dir, "embeddings.parquet")
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    tbl = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{pat}') ORDER BY vec_id"
    ).arrow()
    ids = tbl["vec_id"].to_numpy()
    emb = tbl["embedding"].combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim).astype(np.float64)


def _np_threshold_pairs(
    ids: np.ndarray,
    mat: np.ndarray,
    thres: float,
    block: int = 4096,
    scores: bool = False,
):
    """All (v1 < v2) pairs with round(cosine, 6) >= thres — blocked so
    the pair matrix never materializes beyond block x n. With
    ``scores``, returns {pair: cosine} instead of a set."""
    nrm = np.sqrt((mat * mat).sum(axis=1))
    unit = mat / nrm[:, None]
    n = len(ids)
    out: dict[tuple[int, int], float] | set[tuple[int, int]] = (
        {} if scores else set()
    )
    for s in range(0, n, block):
        e = min(s + block, n)
        cos = unit[s:e] @ unit.T  # (e-s, n)
        cos = np.round(cos, 6)
        ii, jj = np.nonzero(cos >= thres)
        for bi, j in zip(ii, jj):
            i = s + bi
            if i < j:
                key = (int(ids[i]), int(ids[j]))
                if scores:
                    out[key] = float(cos[bi, j])
                else:
                    out.add(key)
    return out


def _np_exact_topk(
    ids: np.ndarray, mat: np.ndarray, stride: int, k: int
) -> dict[int, list[int]]:
    """Exact top-k per standing query (vec_id % stride == 0), ranked by
    (round(cos,6) DESC, vec_id ASC), self excluded — the registered
    exact variant's convention."""
    nrm = np.sqrt((mat * mat).sum(axis=1))
    unit = mat / nrm[:, None]
    qmask = ids % stride == 0
    out: dict[int, list[int]] = {}
    qs = np.nonzero(qmask)[0]
    # k >= n would let the self sentinel (-2.0) become the kth value —
    # the query's own vec_id could then pass the >= kth filter — and
    # k > n flips np.partition's kth index negative (ADVICE r11 #2).
    # The full-lexsort code this replaced excluded self unconditionally;
    # clamping to n-1 (corpus minus self) restores that.
    k = min(k, len(ids) - 1)
    for s in range(0, len(qs), 512):
        qi = qs[s : s + 512]
        cos = np.round(unit[qi] @ unit.T, 6)
        for row, i in enumerate(qi):
            c = cos[row].copy()
            c[i] = -2.0  # exclude self
            # Exact top-k without a full-corpus lexsort (which made the
            # 300x truth phase O(q * n log n) — 75 CPU-min): partition
            # for the k-th largest cosine, keep EVERY entry at or above
            # it (so rounding ties cannot drop the vec_id-asc winners),
            # and lexsort only that candidate set.
            kth = np.partition(c, len(c) - k)[len(c) - k]
            cand = np.nonzero(c >= kth)[0]
            order = cand[np.lexsort((ids[cand], -c[cand]))]
            out[int(ids[i])] = [int(ids[j]) for j in order[:k]]
    return out


def _topk_overlap(
    guard: dict[int, set[int]], exact: dict[int, list[int]], k: int
) -> float:
    """Mean over queries of |guard-top-k ∩ exact-top-k| / k."""
    tot = sum(
        len(guard.get(q, set()) & set(v)) / max(len(v), 1)
        for q, v in exact.items()
    )
    return round(tot / max(len(exact), 1), 4)


def _collect_topk(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("q_id", "vec_id").collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


# ------------------------------------------------------------------- families


def probe_jaccard_cap(spark, sf_dir: str) -> dict:
    from hgn_spark.operators.dedup import (
        CAP_DF,
        dedup_ngram_jaccard_pairs,
        ngram_jaccard_pairs_capped,
    )
    from hgn_spark.registry import clear_session_caches

    clear_session_caches(blocking=True)
    exact, t_exact = _timed(
        lambda: _pairs(dedup_ngram_jaccard_pairs(spark, sf_dir), "d1", "d2")
    )
    clear_session_caches(blocking=True)
    guard, t_guard = _timed(
        lambda: _pairs(
            ngram_jaccard_pairs_capped(spark, sf_dir, df_cap=CAP_DF), "d1", "d2"
        )
    )
    res = {
        "exact_twin": "dedup_ngram_jaccard_pairs (uncapped exact jaccard)",
        "knob": {"df_cap": CAP_DF},
        "exact_n": len(exact),
        "guard_n": len(guard),
        "recall": _recall(guard, exact),
        "secs_exact": t_exact,
        "secs_guard": t_guard,
    }
    if res["recall"] is not None and res["recall"] < 0.9:
        # CAP_DF=2 is the driver-evidence value (non-vacuous at
        # sf0.01); the production cap is corpus-sized. Sweep sane caps.
        for cap in (16, 128):
            clear_session_caches(blocking=True)
            g2, t2 = _timed(
                lambda c=cap: _pairs(
                    ngram_jaccard_pairs_capped(spark, sf_dir, df_cap=c),
                    "d1",
                    "d2",
                )
            )
            res[f"tuned_cap_{cap}"] = {
                "guard_n": len(g2),
                "recall": _recall(g2, exact),
                "secs_guard": t2,
            }
            if res[f"tuned_cap_{cap}"]["recall"] >= 0.99:
                break
    return res


def probe_inc_cap(spark, sf_dir: str) -> dict:
    from hgn_spark.operators.dedup import CAP_DF, neardup_incremental
    from hgn_spark.registry import clear_session_caches

    clear_session_caches(blocking=True)
    ex_rows, t_exact = _timed(
        lambda: neardup_incremental(spark, sf_dir).select(
            "op", "d1", "d2"
        ).collect()
    )
    clear_session_caches(blocking=True)
    g_rows, t_guard = _timed(
        lambda: neardup_incremental(spark, sf_dir, df_cap=CAP_DF)
        .select("op", "d1", "d2")
        .collect()
    )
    out = {
        "exact_twin": "neardup_incremental (uncapped)",
        "knob": {"df_cap": CAP_DF},
        "secs_exact": t_exact,
        "secs_guard": t_guard,
    }

    def _per_op(rows_g, tag: str) -> float | None:
        worst = None
        for op in ("vs_corpus", "in_batch"):
            ex = {(r["d1"], r["d2"]) for r in ex_rows if r["op"] == op}
            gd = {(r["d1"], r["d2"]) for r in rows_g if r["op"] == op}
            rec = _recall(gd, ex)
            out[f"{op}{tag}"] = {
                "exact_n": len(ex),
                "guard_n": len(gd),
                "recall": rec,
            }
            if rec is not None:
                worst = rec if worst is None else min(worst, rec)
        return worst

    worst = _per_op(g_rows, "")
    if worst is not None and worst < 0.9:
        for cap in (16, 128):
            clear_session_caches(blocking=True)
            g2, t2 = _timed(
                lambda c=cap: neardup_incremental(spark, sf_dir, df_cap=c)
                .select("op", "d1", "d2")
                .collect()
            )
            out[f"secs_guard_cap_{cap}"] = t2
            if (_per_op(g2, f"_cap{cap}") or 0) >= 0.99:
                break
    return out


def probe_simhash_cap(spark, sf_dir: str) -> dict:
    from hgn_spark.operators.dedup import SIMHASH_CAP, dedup_simhash_pairs
    from hgn_spark.registry import clear_session_caches

    clear_session_caches(blocking=True)
    exact, t_exact = _timed(
        lambda: _pairs(dedup_simhash_pairs(spark, sf_dir), "d1", "d2")
    )
    clear_session_caches(blocking=True)
    guard, t_guard = _timed(
        lambda: _pairs(
            dedup_simhash_pairs(spark, sf_dir, bucket_cap=SIMHASH_CAP),
            "d1",
            "d2",
        )
    )
    res = {
        "exact_twin": "dedup_simhash_pairs (uncapped)",
        "knob": {"bucket_cap": SIMHASH_CAP},
        "exact_n": len(exact),
        "guard_n": len(guard),
        "recall": _recall(guard, exact),
        "secs_exact": t_exact,
        "secs_guard": t_guard,
    }
    if res["recall"] is not None and res["recall"] < 0.9:
        # Tuned-knob re-measure (the judge's contract): a cap of 2 is
        # deliberately tight so the driver branch is non-vacuous at
        # sf0.01; the production dial is corpus-sized.
        for cap in (8, 32):
            clear_session_caches(blocking=True)
            g2, t2 = _timed(
                lambda c=cap: _pairs(
                    dedup_simhash_pairs(spark, sf_dir, bucket_cap=c), "d1", "d2"
                )
            )
            res[f"tuned_cap_{cap}"] = {
                "guard_n": len(g2),
                "recall": _recall(g2, exact),
                "secs_guard": t2,
            }
    # r11 production path: Manku combination bucketing — identical
    # verified result to the uncapped chunk scheme by pigeonhole, so
    # the expected recall is EXACTLY 1.0; the probe measures it rather
    # than asserting it so the artifact carries the number.
    clear_session_caches(blocking=True)
    gm, tm = _timed(
        lambda: _pairs(
            dedup_simhash_pairs(spark, sf_dir, scheme="combo"), "d1", "d2"
        )
    )
    res["simhash_manku"] = {
        "guard_n": len(gm),
        "recall": _recall(gm, exact),
        "secs_guard": tm,
        "knob": {"scheme": "combo", "tables": 20, "key_bits": 24},
    }
    return res


def probe_minhash(spark, sf_dir: str) -> dict:
    """Recall of the PRODUCTION near-dup path (minhash-LSH band join +
    exact-jaccard verify) vs the uncapped exact-jaccard pair truth —
    the number that decides whether a 100 TB deployment can skip the
    quadratic inverted-index path entirely. The judge's r10 list named
    only the guards; this family completes the story for the branch
    the guards exist to protect."""
    from hgn_spark.operators.dedup import (
        BANDS,
        NUM_PERM,
        dedup_ngram_jaccard_pairs,
        minhash_lsh_pairs,
    )
    from hgn_spark.registry import clear_session_caches

    clear_session_caches(blocking=True)
    exact, t_exact = _timed(
        lambda: _pairs(dedup_ngram_jaccard_pairs(spark, sf_dir), "d1", "d2")
    )
    clear_session_caches(blocking=True)
    guard, t_guard = _timed(
        lambda: _pairs(minhash_lsh_pairs(spark, sf_dir), "d1", "d2")
    )
    return {
        "exact_twin": "dedup_ngram_jaccard_pairs (uncapped exact jaccard)",
        "knob": {"num_perm": NUM_PERM, "bands": BANDS},
        "exact_n": len(exact),
        "guard_n": len(guard),
        "recall": _recall(guard, exact),
        "secs_exact": t_exact,
        "secs_guard": t_guard,
    }


def _recall_by_bucket(
    guard: set, truth_scores: dict[tuple[int, int], float]
) -> dict[str, float | int]:
    """Recall stratified by the TRUE cosine — LSH recall rises steeply
    with similarity (per-bit agreement p = 1 - acos(cos)/pi), so the
    overall number on a low-threshold isotropic corpus under-represents
    the near-dup regime the sketch targets. Buckets of 0.05; the
    65..95 strata are empty on the shipped isotropic corpus (max pair
    cosine 0.479) and populated by gen_probe_corpus.py's hicos
    planting — the cos>=0.85 rows are THE srp_adaptive
    production-operating-point measurement (VERDICT r11 #1)."""
    out: dict[str, float | int] = {}
    for lo10 in (40, 45, 50, 55, 60, 65, 70, 75, 80, 85, 90, 95):
        lo = lo10 / 100.0
        bucket = {p for p, c in truth_scores.items() if lo <= c < lo + 0.05}
        if bucket:
            out[f"recall_cos_{lo:.2f}"] = round(
                len(guard & bucket) / len(bucket), 4
            )
            out[f"n_cos_{lo:.2f}"] = len(bucket)
    return out


def probe_srp(spark, sf_dir: str, label: str) -> dict:
    from hgn_spark.operators.dedup import (
        EMB_COS_THRES,
        dedup_embedding_neardup_pairs,
        dedup_embedding_neardup_pairs_adaptive,
        srp_adaptive_bits,
    )
    from hgn_spark.registry import clear_session_caches

    ids, mat = _load_vectors(sf_dir)
    truth_scores, t_truth = _timed(
        lambda: _np_threshold_pairs(ids, mat, EMB_COS_THRES, scores=True)
    )
    truth = set(truth_scores)
    _log(f"{label} srp truth: {len(truth)} pairs in {t_truth}s")
    res: dict = {
        "exact_twin": f"brute-force cosine >= {EMB_COS_THRES} (numpy oracle)",
        "exact_n": len(truth),
        "secs_exact_numpy": t_truth,
    }
    if label.endswith(BASE_LABEL):
        # Cross-validate the numpy oracle against a Spark brute force
        # — also for the base-sized hicos/clustered probe corpora
        # (labels like 'hicos_sf0.1'), so each corpus family's truth
        # is validated once at its smallest scale.
        # built from the engine's own cosine path.
        from pyspark.sql import functions as F

        from hgn_spark.operators.similarity import (
            cosine_prenormed,
            load_embeddings,
        )

        emb = load_embeddings(spark, sf_dir)
        e1 = emb.select(
            F.col("vec_id").alias("v1"),
            F.col("embedding").alias("e1"),
            F.col("nrm").alias("n1"),
        )
        e2 = emb.select(
            F.col("vec_id").alias("v2"),
            F.col("embedding").alias("e2"),
            F.col("nrm").alias("n2"),
        )
        spark_truth = _pairs(
            e1.join(e2, F.col("v1") < F.col("v2"))
            .withColumn(
                "cosine",
                F.round(
                    cosine_prenormed(
                        F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2")
                    ),
                    6,
                ),
            )
            .filter(F.col("cosine") >= EMB_COS_THRES),
            "v1",
            "v2",
        )
        res["oracle_validated"] = spark_truth == truth
        res["oracle_mismatch_n"] = len(spark_truth ^ truth)
    from hgn_spark.operators.dedup import (
        dedup_embedding_neardup_pairs_recall,
        srp_recall_bands,
    )

    pinned = adaptive = None
    for name, fn in (
        ("srp_pinned16", lambda: dedup_embedding_neardup_pairs(spark, sf_dir)),
        (
            "srp_adaptive",
            lambda: dedup_embedding_neardup_pairs_adaptive(spark, sf_dir),
        ),
        # r12: the recall-targeted multi-band sizing (srp_recall_bands)
        # — the production candidate for the cos>=0.9 operating point
        # the srp_adaptive label claimed without measurement.
        (
            "srp_recall",
            lambda: dedup_embedding_neardup_pairs_recall(spark, sf_dir),
        ),
    ):
        clear_session_caches(blocking=True)
        got, t = _timed(lambda f=fn: _pairs(f(), "v1", "v2"))
        res[name] = {
            "guard_n": len(got),
            "recall_vs_exact": _recall(got, truth),
            "secs_guard": t,
            **_recall_by_bucket(got, truth_scores),
        }
        if name == "srp_pinned16":
            pinned = got
        elif name == "srp_adaptive":
            adaptive = got
        else:
            res[name]["knob"] = dict(
                zip(("n_bits", "n_bands"), srp_recall_bands(len(ids)))
            )
    if pinned is not None and adaptive is not None and pinned:
        res["srp_adaptive"]["overlap_vs_pinned"] = _recall(adaptive, pinned)
    if res["srp_adaptive"]["recall_vs_exact"] is not None and (
        res["srp_adaptive"]["recall_vs_exact"] < 0.9
    ):
        # More-bands dial (the judge's suggested knob): same adaptive
        # total width, narrower bands — recall 1-(1-p^w)^b rises as w
        # shrinks, candidate volume rises ~b * n^2 / 2^w. The verify
        # stays exact, so precision is unchanged. Width guard: a band
        # narrower than log2(n) - 8 puts > 256*n candidate pairs
        # through the verify — past the point the dial is informative
        # (the probe would measure a deliberate blowup, not a knob).
        n = len(ids)
        bits = srp_adaptive_bits(n)
        min_w = max(3, (max(n, 2) - 1).bit_length() - 8)
        for bands in (4, 8):
            if bits // bands < min_w:
                res[f"srp_adaptive_bands{bands}"] = {
                    "skipped": f"band width {bits // bands} < {min_w} — "
                    "candidate volume past the informative range"
                }
                continue
            clear_session_caches(blocking=True)
            got, t = _timed(
                lambda b=bands: _pairs(
                    dedup_embedding_neardup_pairs_adaptive(
                        spark, sf_dir, n_bands=b
                    ),
                    "v1",
                    "v2",
                )
            )
            res[f"srp_adaptive_bands{bands}"] = {
                "guard_n": len(got),
                "recall_vs_exact": _recall(got, truth),
                "secs_guard": t,
                **_recall_by_bucket(got, truth_scores),
            }
            if res[f"srp_adaptive_bands{bands}"]["recall_vs_exact"] >= 0.9:
                break
    return res


def probe_ann(spark, sf_dir: str, label: str) -> dict:
    from hgn_spark.operators.similarity import (
        TOP_K,
        QUERY_STRIDE,
        _ivf_query,
        _ivf_seed_frames_adaptive,
        lsh_adaptive_bits,
        simsearch_lsh_topk,
    )
    from hgn_spark.registry import clear_session_caches

    ids, mat = _load_vectors(sf_dir)
    truth, t_truth = _timed(
        lambda: _np_exact_topk(ids, mat, QUERY_STRIDE, TOP_K)
    )
    _log(f"{label} ann truth: {len(truth)} queries in {t_truth}s")
    res: dict = {
        "exact_twin": "brute-force top-k (numpy oracle)",
        "n_queries": len(truth),
        "k": TOP_K,
        "secs_exact_numpy": t_truth,
    }
    if label.endswith(BASE_LABEL):
        from hgn_spark.operators.similarity import simsearch_exact_topk

        spark_truth = _collect_topk(simsearch_exact_topk(spark, sf_dir))
        np_sets = {q: set(v) for q, v in truth.items()}
        res["oracle_validated"] = spark_truth == np_sets
        res["oracle_mismatch_n"] = sum(
            1 for q in np_sets if spark_truth.get(q) != np_sets[q]
        )

    n = len(ids)
    # ivf_adaptive at the pinned NPROBE, then the nprobe dial.
    for nprobe in (3, 8, 16, 32):
        clear_session_caches(blocking=True)
        got, t = _timed(
            lambda p=nprobe: _collect_topk(
                _ivf_query(
                    spark,
                    sf_dir,
                    refine=False,
                    frames=_ivf_seed_frames_adaptive(spark, sf_dir, n=n),
                    nprobe=p,
                )
            )
        )
        key = "ivf_adaptive" if nprobe == 3 else f"ivf_adaptive_nprobe{nprobe}"
        res[key] = {
            "recall_at_k": _topk_overlap(got, truth, TOP_K),
            "secs_guard": t,
            "knob": {"nprobe": nprobe},
        }
        if res[key]["recall_at_k"] >= 0.9:
            break
    # lsh_adaptive at the pinned multiprobe, then the multiprobe dial.
    bits = lsh_adaptive_bits(n)
    for mp in (1, 2, 3):
        clear_session_caches(blocking=True)
        got, t = _timed(
            lambda m=mp: _collect_topk(
                simsearch_lsh_topk(spark, sf_dir, n_bits=bits, multiprobe=m)
            )
        )
        key = "lsh_adaptive" if mp == 1 else f"lsh_adaptive_multiprobe{mp}"
        res[key] = {
            "recall_at_k": _topk_overlap(got, truth, TOP_K),
            "secs_guard": t,
            "knob": {"bits": bits, "multiprobe": mp},
        }
        if res[key]["recall_at_k"] >= 0.9:
            break
    return res


FAMILIES = {
    "jaccard_cap": lambda spark, d, label: probe_jaccard_cap(spark, d),
    "inc_cap": lambda spark, d, label: probe_inc_cap(spark, d),
    "simhash_cap": lambda spark, d, label: probe_simhash_cap(spark, d),
    "minhash": lambda spark, d, label: probe_minhash(spark, d),
    "srp": probe_srp,
    "ann": probe_ann,
}


def main() -> None:
    scales = [
        tuple(s.split("=", 1))
        for s in (sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SCALES).split(",")
    ]
    only = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2 and sys.argv[2] != "all"
        else set(FAMILIES)
    )
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from hgn_spark.session import get_spark

    spark = get_spark(app_name="recall_probe")
    out: dict = {"probe": "recall_r12", "scales": {}}
    for label, sf_dir in scales:
        if not os.path.isdir(sf_dir):
            _log(f"skip {label}: {sf_dir} missing")
            continue
        res: dict = {}
        for fam, fn in FAMILIES.items():
            if fam not in only:
                continue
            _log(f"== {label} {fam}")
            try:
                res[fam] = fn(spark, sf_dir, label)
            except Exception as exc:  # noqa: BLE001 — record, keep probing
                res[fam] = {"error": f"{type(exc).__name__}: {exc}"}
            _log(f"{label} {fam}: {json.dumps(res[fam])[:400]}")
        out["scales"][label] = res
    js = json.dumps(out)
    print(js)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(js + "\n")


if __name__ == "__main__":
    main()
