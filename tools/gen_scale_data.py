"""Generate a ~10x-sf0.1 synthetic documents/embeddings set for the
scaling-decade audit (VERDICT r7 #6).

The driver's testdata stops at sf0.1 (5,000 docs / 2,000 vectors), so
the `bench.py --scaling` sf0.01->sf0.1 ratio is the only measured
decade for the candidate-pair family.  This script extends the ladder
one decade further LOCALLY, matching the measured distributional
structure of the driver data (the generating formulas observable at
sf0.1) rather than inventing a new corpus:

- documents: same 31-word vocab (extracted from the real table), same
  lang marginal, 20 sources, uniform 10-100 words/doc, the same
  ~0.16% exact-dup rate, plus a near-dup tail (copy + k random word
  substitutions) mirroring the shingle-collision density the pair
  family actually faces.
- embeddings: 10 label clusters whose centers and within-cluster
  radial spread are FIT from the real sf0.1 vectors, then sampled at
  10x and L2-normalized - so IVF/LSH bucket occupancy scales the way
  real data would, not like isotropic noise.

Output: /root/repo/localdata/sf1/{documents,embeddings}.parquet plus
symlinks for the other 8 tables back to /root/testdata/sf0.1 (the
pair family never reads them, but queries() callables expect a full
sf dir).  Deterministic (numpy PCG64, seed 42).  Gitignored - the
committed artifact is the ratio table, not the data.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
OUT = str(Path(__file__).resolve().parent.parent / "localdata" / "sf1")
SCALE = 10


def gen_documents(rng: np.random.Generator) -> pd.DataFrame:
    real = pd.read_parquet(f"{SRC}/documents.parquet")
    vocab = sorted({w for t in real.text for w in t.split()})
    langs, lang_p = np.unique(real.lang, return_counts=True)
    lang_p = lang_p / lang_p.sum()
    sources = sorted(real.source.unique())
    n = len(real) * SCALE

    lens = rng.integers(10, 101, size=n)
    texts = [
        " ".join(rng.choice(vocab, size=ln).tolist()) for ln in lens
    ]
    # near-dup tail: ~2% of docs are a copy of an earlier doc with k<=3
    # word substitutions (the structure dedup_near's prefix filter and
    # the LSH paths key on); ~0.16% are EXACT copies (observed rate).
    n_near = int(n * 0.02)
    n_exact = max(1, int(n * 0.0016))
    for i in rng.choice(n, size=n_near, replace=False):
        j = int(rng.integers(0, n))
        words = texts[j].split()
        for _ in range(int(rng.integers(1, 4))):
            words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
        texts[i] = " ".join(words)
    for i in rng.choice(n, size=n_exact, replace=False):
        texts[i] = texts[int(rng.integers(0, n))]

    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(langs, size=n, p=lang_p),
            "source": rng.choice(sources, size=n),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(rng: np.random.Generator) -> pd.DataFrame:
    real = pd.read_parquet(f"{SRC}/embeddings.parquet")
    E = np.vstack(real.embedding.values).astype(np.float64)
    labels = real.label.values
    ks = np.unique(labels)
    centers, spreads, props = [], [], []
    for k in ks:
        Ek = E[labels == k]
        c = Ek.mean(axis=0)
        c /= np.linalg.norm(c)
        centers.append(c)
        # per-dimension residual std around the center (pre-normalization
        # noise scale; normalization below reapplies the real geometry)
        spreads.append((Ek - c).std())
        props.append(len(Ek))
    props = np.array(props, dtype=float)
    props /= props.sum()

    m = len(real) * SCALE
    lab = rng.choice(ks, size=m, p=props).astype(np.int32)
    X = np.empty((m, E.shape[1]), dtype=np.float64)
    for idx, k in enumerate(ks):
        sel = lab == k
        X[sel] = centers[idx] + rng.normal(
            0.0, spreads[idx], size=(sel.sum(), E.shape[1])
        )
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(m, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in X],
            "label": lab,
        }
    )


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    docs = gen_documents(rng)
    docs.to_parquet(f"{OUT}/documents.parquet", index=False)
    emb = gen_embeddings(rng)
    emb.to_parquet(f"{OUT}/embeddings.parquet", index=False)
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"wrote {len(docs)} docs / {len(emb)} vectors to {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
