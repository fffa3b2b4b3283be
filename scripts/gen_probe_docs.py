"""Boilerplate-heavy document corpus with planted near-dup pairs
(VERDICT r12 #5): the text-side recall evidence so far
(PROBE_recall_r11/r12) runs on the testdata documents, whose shingle
df distribution is benign — but the df cap and the minhash production
path exist FOR the adversarial shape: mega-buckets from shared
boilerplate. This generator builds that shape with exact, analytic
ground truth:

- T templates of B tokens each (the boilerplate); every document is
  one template block followed by a globally-unique tail, so every
  template-interior 3-gram shingle has df = N/T (mega-buckets, df in
  the hundreds-to-thousands — far past PRODUCTION_CAP_DF=16), while
  every tail shingle has df 1 (or 2 for planted pairs).
- Same-template non-dup pairs share exactly B-2 shingles → jaccard
  (B-2)/(2S-(B-2)) ≈ 0.33 at the defaults — comfortably below
  JACCARD_THRES=0.8, so boilerplate NEVER creates true positives,
  only candidate pressure.
- Planted companions (doc_id % 67 == 0, the hicos convention): copy
  the original and replace m tokens in the tail, isolated (spacing
  >= 3, away from the template boundary and the end), so each
  replacement removes exactly 3 shingles from the intersection and
  adds 3 to the union: jaccard = (S-3m)/(S+3m) EXACTLY. m cycles
  {1, 2, 4} → strata {~0.95, ~0.90, ~0.815} — one per 0.05 bucket
  above the 0.8 threshold.

The generator VERIFIES rather than trusts the analytics: it recomputes
the shingle-set jaccard of every planted pair with python sets
(asserting the closed form) and checks a sample of same-template
pairs stays under the threshold, then writes the truth to
`planted_pairs.json` beside the parquet. The probe
(text_clustered_recall_probe.py) additionally cross-validates the
truth against the Spark exact-jaccard path at a small scale.

Usage: python scripts/gen_probe_docs.py N OUT_DIR
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

T_TEMPLATES = 20
B_TEMPLATE = 60   # tokens of boilerplate per document
L_DOC = 120       # total tokens per document
MOD = 67          # plant a companion for doc_id % MOD == 0
M_CYCLE = (1, 2, 4)  # replacements per companion, cycled by doc_id


def _shingle_set(toks: list[str]) -> set[str]:
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def main() -> None:
    n = int(sys.argv[1])
    out_dir = sys.argv[2]
    s = L_DOC - 2  # distinct shingles per doc (all tokens unique)

    ids: list[int] = []
    texts: list[str] = []
    sources: list[str] = []
    docs_tokens: dict[int, list[str]] = {}
    for d in range(n):
        tpl = d % T_TEMPLATES
        toks = [f"t{tpl}x{j}" for j in range(B_TEMPLATE)] + [
            f"u{d}x{j}" for j in range(L_DOC - B_TEMPLATE)
        ]
        ids.append(d)
        docs_tokens[d] = toks
        texts.append(" ".join(toks))
        sources.append(f"tpl{tpl}")

    pad = ((n + 49) // 50) * 50
    planted: list[tuple[int, int, float]] = []
    comp_i = 0
    for d in range(0, n, MOD):
        m = M_CYCLE[(d // MOD) % len(M_CYCLE)]
        toks = list(docs_tokens[d])
        # replacement positions: inside the tail, >= 3 past the
        # template boundary, spacing 6, >= 3 from the end
        for k in range(m):
            pos = B_TEMPLATE + 3 + 6 * k
            assert pos < L_DOC - 3
            toks[pos] = f"r{d}x{k}"
        cid = pad + comp_i
        comp_i += 1
        jac = (s - 3 * m) / (s + 3 * m)
        # verify the closed form on the actual shingle sets
        a, b = _shingle_set(docs_tokens[d]), _shingle_set(toks)
        got = len(a & b) / len(a | b)
        assert abs(got - jac) < 1e-12, (d, m, got, jac)
        ids.append(cid)
        docs_tokens[cid] = toks
        texts.append(" ".join(toks))
        sources.append(f"tpl{d % T_TEMPLATES}")
        planted.append((d, cid, round(jac, 6)))

    # soundness sample: same-template non-planted pairs stay far under
    # the 0.8 threshold (shared shingles = template interior only)
    worst = 0.0
    for tpl in range(min(T_TEMPLATES, 5)):
        members = [d for d in range(tpl, min(n, tpl + 50 * T_TEMPLATES), T_TEMPLATES)]
        for i in range(min(10, len(members) - 1)):
            a = _shingle_set(docs_tokens[members[i]])
            b = _shingle_set(docs_tokens[members[i + 1]])
            worst = max(worst, len(a & b) / len(a | b))
    assert worst < 0.5, worst

    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    with open(os.path.join(out_dir, "planted_pairs.json"), "w") as fh:
        json.dump(
            {
                "n_docs": len(ids),
                "n_planted": len(planted),
                "templates": T_TEMPLATES,
                "boilerplate_shingle_df": n // T_TEMPLATES,
                "max_nonplanted_jaccard_sampled": round(worst, 4),
                "pairs": planted,
            },
            fh,
        )
    print(
        f"boilerplate docs: n={len(ids)} ({n} originals + {len(planted)} "
        f"companions), template df={n // T_TEMPLATES}, "
        f"worst non-planted sampled jaccard={worst:.3f} -> {out_dir}"
    )


if __name__ == "__main__":
    main()
