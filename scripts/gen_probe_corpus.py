"""Generate recall-probe embedding corpora (VERDICT r11 #1 and #3).

Two corpus families, both written as `{out_dir}/embeddings.parquet`
with the testdata schema (vec_id int64, embedding list<float32>,
label int32) so every existing probe path (`recall_probe.py`,
`load_embeddings`, the SRP/ANN pipelines) reads them unchanged:

- **hicos**: an existing corpus (sf0.1 or a scale slice) plus planted
  companion vectors at cosine ~{0.851, 0.901, 0.951} to a
  deterministic ~1.5% sample of the originals. This is the measurement
  VERDICT r11 what's-wrong #1 demands: `srp_adaptive`'s
  production-at-scale label claims the true near-dup regime
  (cos >= 0.9), but the shipped corpus's max pair cosine is 0.479, so
  every recorded SRP number is an extrapolation. Targets are the
  judge's {0.85, 0.9, 0.95} nominal points offset by +0.001 so each
  planted pair sits strictly INSIDE its 0.05-wide recall stratum
  after float32 storage rounding (the stratum edge is exactly the
  nominal value; a -1e-7 storage error must not drop a 0.85 pair into
  the 0.80 bucket).

  Companion construction: for original v with unit direction v_hat,
  draw a deterministic Gaussian direction (md5-seeded by vec_id),
  orthogonalize against v_hat -> w_hat, and emit
  u = ||v|| * (c * v_hat + sqrt(1-c^2) * w_hat): cos(u, v) = c exactly
  in float64, and ||u|| = ||v|| keeps the companion in-distribution.
  Companion ids sit at pad + 50*i + 1 (pad a multiple of 50), so no
  companion lands on the ANN query (%50) or centroid (%25) strides —
  the hicos corpora change the SRP pair population, not the ANN query
  set.

- **clustered**: a mixture-of-Gaussians corpus (VERDICT r11 what's-
  missing #3) sized like a target scale: K = n/CLUSTER_SIZE unit-norm
  center directions, members = center + sigma*noise with sigma drawn
  per-cluster from [0.055, 0.115] — two members' expected pairwise
  cosine is 1/(1+EMB_DIM*sigma^2), so the range spans ~0.54-0.84
  (measured corpus mean ~0.70) — plus an isotropic background
  fraction. Every recorded ANN/SRP
  recall so far is on the ISOTROPIC corpus — the worst case for
  locality-sensitive methods; this corpus measures the "clustered
  data buys more recall" claim instead of asserting it. vec_ids are
  0..n-1 so the query/centroid strides apply as on testdata; label
  carries the true cluster id (-1 for background), which doubles as
  ground truth for stratified analysis.

Determinism: every random draw comes from numpy Generators seeded
with fixed integers or md5(vec_id) — two invocations produce
byte-identical corpora, so probe artifacts are reproducible.

Usage:
  python scripts/gen_probe_corpus.py hicos SRC_DIR OUT_DIR
  python scripts/gen_probe_corpus.py clustered N OUT_DIR
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Nominal judge-specified operating points + the in-stratum offset.
HICOS_TARGETS = (0.851, 0.901, 0.951)
HICOS_MOD = 67        # plant a companion for vec_id % 67 == 0 (~1.5%)
CLUSTER_SIZE = 25     # expected members per mixture component
BACKGROUND_FRAC = 0.2  # isotropic fraction of the clustered corpus
EMB_DIM = 64


def _read_embeddings(src_dir: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    import duckdb

    p = os.path.join(src_dir, "embeddings.parquet")
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM read_parquet('{pat}') "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows], dtype=np.int32)
    return ids, mat, labels


def _write_embeddings(
    out_dir: str, ids: np.ndarray, mat: np.ndarray, labels: np.ndarray
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    emb32 = mat.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [row for row in emb32], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def gen_hicos(src_dir: str, out_dir: str) -> None:
    ids, mat, labels = _read_embeddings(src_dir)
    sel = np.nonzero(ids % HICOS_MOD == 0)[0]
    pad = ((int(ids.max()) + 50) // 50) * 50
    new_ids, new_vecs, new_labels = [], [], []
    planted = {c: 0 for c in HICOS_TARGETS}
    for i, src_idx in enumerate(sel):
        v = mat[src_idx]
        nv = np.linalg.norm(v)
        v_hat = v / nv
        c = HICOS_TARGETS[(int(ids[src_idx]) // HICOS_MOD) % len(HICOS_TARGETS)]
        seed = int.from_bytes(
            hashlib.md5(f"hicos:{int(ids[src_idx])}".encode()).digest()[:8],
            "big",
        )
        g = np.random.default_rng(seed).standard_normal(mat.shape[1])
        w = g - (g @ v_hat) * v_hat
        w_hat = w / np.linalg.norm(w)
        u = nv * (c * v_hat + np.sqrt(1.0 - c * c) * w_hat)
        new_ids.append(pad + 50 * i + 1)
        new_vecs.append(u)
        new_labels.append(labels[src_idx])
        planted[c] += 1
    out_ids = np.concatenate([ids, np.array(new_ids, dtype=np.int64)])
    out_mat = np.vstack([mat, np.array(new_vecs)])
    out_labels = np.concatenate(
        [labels, np.array(new_labels, dtype=np.int32)]
    )
    _write_embeddings(out_dir, out_ids, out_mat, out_labels)
    print(
        f"hicos: {len(ids)} base + {len(new_ids)} planted "
        f"({ {round(c, 3): n for c, n in planted.items()} }) -> {out_dir}"
    )


def gen_clustered(n: int, out_dir: str) -> None:
    rng = np.random.default_rng(20260816)
    n_bg = int(n * BACKGROUND_FRAC)
    n_cl = n - n_bg
    k = max(2, n_cl // CLUSTER_SIZE)
    centers = rng.standard_normal((k, EMB_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sigmas = rng.uniform(0.055, 0.115, size=k)
    assign = rng.integers(0, k, size=n_cl)
    members = centers[assign] + rng.standard_normal((n_cl, EMB_DIM)) * (
        sigmas[assign][:, None]
    )
    background = rng.standard_normal((n_bg, EMB_DIM)) * 0.35
    mat = np.vstack([members, background])
    labels = np.concatenate(
        [assign.astype(np.int32), np.full(n_bg, -1, dtype=np.int32)]
    )
    # Shuffle deterministically so cluster membership is uncorrelated
    # with vec_id — stride-derived query/centroid sets then sample
    # clusters uniformly, as they would on real data.
    perm = rng.permutation(n)
    mat, labels = mat[perm], labels[perm]
    ids = np.arange(n, dtype=np.int64)
    _write_embeddings(out_dir, ids, mat, labels)
    intra = _mean_intra_cosine(mat, labels)
    print(
        f"clustered: n={n} k={k} bg={n_bg} "
        f"mean_intra_cos={intra:.3f} -> {out_dir}"
    )


def _mean_intra_cosine(
    mat: np.ndarray, labels: np.ndarray, sample: int = 2000
) -> float:
    rng = np.random.default_rng(7)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    vals = []
    for lab in np.unique(labels):
        if lab < 0:
            continue
        idx = np.nonzero(labels == lab)[0]
        if len(idx) < 2:
            continue
        for _ in range(min(20, len(idx))):
            a, b = rng.choice(idx, 2, replace=False)
            vals.append(float(unit[a] @ unit[b]))
        if len(vals) >= sample:
            break
    return float(np.mean(vals)) if vals else float("nan")


def gen_isotropic(n: int, out_dir: str) -> None:
    """Pure isotropic Gaussian corpus (r13): the base for hicos tiers
    past the replica slices' 600k ceiling (the srp_recall band-budget
    boundary sits at n ~ 2^20, VERDICT r12 what's-wrong #1 — probing
    it needs a 1M+ base). No original-original pair can plausibly
    reach cos 0.85 in 64 dims (tail mass ~(1-0.85^2)^31 ~ 5e-18 per
    pair, ~1e-5 expected over 10^12 pairs); the hicos probe verifies
    that restriction on a sample regardless (and r13 fails loudly if
    violated). Scaled like the testdata embeddings; generated in
    1e5-row blocks so memory stays bounded."""
    rng = np.random.default_rng(20260816 + n)
    blocks = []
    for s in range(0, n, 100_000):
        e = min(s + 100_000, n)
        blocks.append(rng.standard_normal((e - s, EMB_DIM)))
    mat = np.vstack(blocks)
    ids = np.arange(n, dtype=np.int64)
    labels = np.zeros(n, dtype=np.int32)
    _write_embeddings(out_dir, ids, mat, labels)
    print(f"isotropic: n={n} dim={EMB_DIM} -> {out_dir}")


def main() -> None:
    mode = sys.argv[1]
    if mode == "hicos":
        gen_hicos(sys.argv[2], sys.argv[3])
    elif mode == "clustered":
        gen_clustered(int(sys.argv[2]), sys.argv[3])
    elif mode == "isotropic":
        gen_isotropic(int(sys.argv[2]), sys.argv[3])
    else:
        raise SystemExit(f"unknown mode {mode!r} (hicos|clustered|isotropic)")


if __name__ == "__main__":
    main()
