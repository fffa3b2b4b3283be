"""srp_recall band-budget boundary probe (VERDICT r12 #2 / what's-
wrong #1): measures the ACTUAL recall shortfall the old silent b<=64
cap caused, at a tier where the sizing formula demands more than 64
bands (b_want = 77 at n in (2^20, 2^21]), against the r13 budgeted
default that builds the full b_want.

Corpus: a hicos tier built on an isotropic base past 2^20 vectors
(gen_probe_corpus.py isotropic + hicos). Truth protocol is
srp_operating_point_100x.py's: exact companion-row cosines (every
>=0.85 pair involves a planted companion; the no-high-cos restriction
is verified on a sampled original block and the artifact is stamped
truth_invalid + exit 3 if violated).

Outputs per config (capped_64 = the r12 silent cap, budgeted = the
r13 SRP_MAX_BANDS default): measured recall per 0.05 cosine stratum,
the formula's PREDICTED recall at the design point (so the artifact
shows measurement vs theory, ~0.92 predicted for capped_64 vs >=0.95
budgeted at this tier), bands/bits built, and wall time.

Recall numbers are load-immune (memory note); secs_guard is not —
run in a quiet window if the timing matters.

Usage: python scripts/srp_cap_boundary_probe.py [corpus_dir] [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

ORIGINAL_SAMPLE = 4096
# float32 candidate screen with a guard band, float64 re-verify of the
# (few) hits: the r12 protocol's full-matrix float64 np.round was the
# wall-clock killer at 10^6+ vectors (8.5 GB temporaries per block,
# kernel page churn measured at ~100% system time); float32 error is
# ~1e-7 relative, so a 5e-4 guard band cannot miss a 0.85 pair.
SCREEN = np.float32(0.8495)


def _load_vectors_fast(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(ids, float64 matrix) via Arrow buffers — recall_probe's
    fetchall loader builds 10^6 python tuples (minutes); this is
    seconds at the same values."""
    import duckdb

    p = os.path.join(sf_dir, "embeddings.parquet")
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    tbl = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{pat}') ORDER BY vec_id"
    ).arrow()
    ids = tbl["vec_id"].to_numpy()
    emb = tbl["embedding"].combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // len(ids)
    return ids, flat.reshape(len(ids), dim).astype(np.float64)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hgn_scale/probe_hicos_cap"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from recall_probe import _pairs, _recall

    ids, mat = _load_vectors_fast(sf_dir)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    unit64 = mat / nrm[:, None]
    unit = unit64.astype(np.float32)
    max_non_res = int(ids[ids % 50 != 1].max())
    comp_mask = (ids % 50 == 1) & (ids > max_non_res)
    n_comp = int(comp_mask.sum())

    t0 = time.perf_counter()
    truth_scores: dict[tuple[int, int], float] = {}
    comp_idx = np.nonzero(comp_mask)[0]
    for s in range(0, len(comp_idx), 512):
        blk = comp_idx[s : s + 512]
        cos = unit[blk] @ unit.T
        ii, jj = np.nonzero(cos >= SCREEN)
        for bi, j in zip(ii, jj):
            i = blk[bi]
            if i == j:
                continue
            exact = round(float(unit64[i] @ unit64[j]), 6)
            if exact < 0.85:
                continue  # guard-band screen-in, float64 says no
            a, b = int(ids[i]), int(ids[j])
            truth_scores[(min(a, b), max(a, b))] = exact
    orig_idx = np.nonzero(~comp_mask)[0]
    rng = np.random.default_rng(3)
    sample = rng.choice(orig_idx, min(ORIGINAL_SAMPLE, len(orig_idx)), replace=False)
    viol = 0
    unit_orig = unit[orig_idx]
    for s in range(0, len(sample), 512):
        blk = sample[s : s + 512]
        cos = unit[blk] @ unit_orig.T
        ii, jj = np.nonzero(cos >= SCREEN)
        for bi, j in zip(ii, jj):
            i = blk[bi]
            if orig_idx[j] == i:
                continue  # self
            if round(float(unit64[i] @ unit64[orig_idx[j]]), 6) >= 0.85:
                viol += 1
    t_truth = round(time.perf_counter() - t0, 2)
    del unit, unit64, unit_orig, mat, nrm  # free before the Spark phase

    import warnings as _warnings

    from hgn_spark.operators.dedup import (
        SRP_MAX_BANDS,
        dedup_embedding_neardup_pairs_recall,
        srp_recall_bands,
    )
    from hgn_spark.registry import clear_session_caches
    from hgn_spark.session import get_spark

    spark = get_spark(app_name="srp_cap_boundary")
    n = len(ids)
    p = 1.0 - math.acos(0.9) / math.pi
    out: dict = {
        "probe": "srp_cap_boundary_r13",
        "n": n,
        "n_companions": n_comp,
        "truth_n": len(truth_scores),
        "original_sample_checked": int(len(sample)),
        "original_high_cos_violations": viol,
        "secs_truth": t_truth,
        "load_avg_start": round(os.getloadavg()[0], 2),
    }
    for name, max_bands in (("capped_64", 64), ("budgeted", SRP_MAX_BANDS)):
        with _warnings.catch_warnings(record=True) as wlist:
            _warnings.simplefilter("always")
            n_bits, n_bands = srp_recall_bands(n, max_bands=max_bands)
        w = n_bits // n_bands
        clear_session_caches(blocking=True)
        t0 = time.perf_counter()
        got = _pairs(
            dedup_embedding_neardup_pairs_recall(spark, sf_dir, max_bands=max_bands),
            "v1",
            "v2",
        )
        t = round(time.perf_counter() - t0, 2)
        res: dict = {
            "n_bits": n_bits,
            "n_bands": n_bands,
            "band_width": w,
            "warned": bool(wlist),
            "predicted_recall_cos_0.90": round(
                1.0 - (1.0 - p**w) ** n_bands, 4
            ),
            "secs_guard": t,
            "guard_n": len(got),
        }
        for lo in (0.85, 0.90, 0.95):
            bucket = {q for q, c in truth_scores.items() if lo <= c < lo + 0.05}
            if bucket:
                res[f"recall_cos_{lo:.2f}"] = _recall(got & bucket, bucket)
                res[f"n_cos_{lo:.2f}"] = len(bucket)
        out[name] = res
        print(f"# {name}: {json.dumps(res)}", file=sys.stderr, flush=True)

    out["truth_invalid"] = bool(viol > 0)
    js = json.dumps(out)
    print(js)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(js + "\n")
    if viol > 0:
        print(
            f"# TRUTH INVALID: {viol} original-original pair(s) at cos>=0.85",
            file=sys.stderr,
            flush=True,
        )
        sys.exit(3)


if __name__ == "__main__":
    main()
