"""Derive an sf1-scale documents/embeddings fixture from the driver's
read-only sf0.1 tables (r16 verdict item 5: "bench the scale claims once
at sf1 for the dedup/ANN band").

The driver generates /root/testdata/sf{0.001,0.01,0.1} only, and that
tree is read-only — so the 10x fixture is DERIVED, deterministically
(seed 42), from sf0.1's own empirical distributions:

- ``documents`` (50,000 rows): unigram word frequencies, word-count
  distribution, lang/source marginals all resampled from the sf0.1
  corpus; exact-duplicate and near-duplicate structure implanted at the
  MEASURED sf0.1 rates (8/5000 exact dups; 256 minhash pairs / 5000
  docs ~= 5% of docs in a near-dup pair — implanted as doc_id % 20 ==
  19 copying its predecessor with ~8% of words resampled).
- ``embeddings`` (20,000 rows, dim 64, L2-normalized): per-label
  gaussians fitted to sf0.1's per-label per-dim mean/std, sampled 10x,
  renormalized — preserving the 10-cluster structure the IVF/LSH
  operators key on.

Output goes to ``<repo>/.sf1/`` (gitignored — ~10 MB of derived data
is regenerable in ~5 s; only this generator and the measured
BENCH_SF1_SPOT.json are committed). Growth measured against this
fixture is apples-to-apples with sf0.1 because every distribution the
banded/bucketed plans key on (shingle collision rates, band sizes,
cluster occupancy) scales linearly by construction.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
N_DOCS = 50_000
N_VECS = 20_000
SEED = 42

#: implant rates, matched to sf0.1 measurements (see module docstring)
EXACT_DUP_EVERY = 625  # 8/5000
NEAR_DUP_EVERY = 20  # ~5% of docs in a near-dup pair
NEAR_DUP_MUTATE = 0.08  # fraction of words resampled in a near-dup


def out_dir() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo, ".sf1")


def generate(dest: str | None = None) -> str:
    dest = dest or out_dir()
    os.makedirs(dest, exist_ok=True)
    rng = np.random.default_rng(SEED)

    docs = pq.read_table(os.path.join(SF01, "documents.parquet"))
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()

    # empirical distributions
    word_lists = [t.split() for t in texts]
    vocab: dict[str, int] = {}
    for wl in word_lists:
        for w in wl:
            vocab[w] = vocab.get(w, 0) + 1
    words = np.array(list(vocab))
    freqs = np.array([vocab[w] for w in words], dtype=float)
    freqs /= freqs.sum()
    wc_pop = np.array([len(wl) for wl in word_lists])
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    lang_p = lang_counts / lang_counts.sum()
    src_vals, src_counts = np.unique(sources, return_counts=True)
    src_p = src_counts / src_counts.sum()

    new_texts: list[str] = []
    for i in range(N_DOCS):
        if i % EXACT_DUP_EVERY == EXACT_DUP_EVERY - 1 and i > 0:
            new_texts.append(new_texts[i - 1])
            continue
        if i % NEAR_DUP_EVERY == NEAR_DUP_EVERY - 1 and i > 0:
            base = new_texts[i - 1].split()
            n_mut = max(1, int(len(base) * NEAR_DUP_MUTATE))
            idx = rng.choice(len(base), size=min(n_mut, len(base)), replace=False)
            for j in idx:
                base[j] = words[rng.choice(len(words), p=freqs)]
            new_texts.append(" ".join(base))
            continue
        wc = int(wc_pop[rng.integers(len(wc_pop))])
        new_texts.append(
            " ".join(words[rng.choice(len(words), size=wc, p=freqs)])
        )
    doc_tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
            "text": pa.array(new_texts),
            "lang": pa.array(
                lang_vals[rng.choice(len(lang_vals), size=N_DOCS, p=lang_p)]
            ),
            "source": pa.array(
                src_vals[rng.choice(len(src_vals), size=N_DOCS, p=src_p)]
            ),
            "n_chars": pa.array(
                [len(t) for t in new_texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(doc_tbl, os.path.join(dest, "documents.parquet"))

    emb = pq.read_table(os.path.join(SF01, "embeddings.parquet"))
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(emb.column("label").to_pylist())
    dim = vecs.shape[1]
    lab_vals, lab_counts = np.unique(labels, return_counts=True)
    new_vecs = np.empty((N_VECS, dim))
    new_labels = np.empty(N_VECS, dtype=np.int32)
    pos = 0
    scale = N_VECS / len(vecs)
    for lv, lc in zip(lab_vals, lab_counts):
        n = int(round(lc * scale))
        n = min(n, N_VECS - pos)
        sub = vecs[labels == lv]
        mu, sd = sub.mean(axis=0), sub.std(axis=0)
        sample = rng.normal(mu, sd, size=(n, dim))
        sample /= np.linalg.norm(sample, axis=1, keepdims=True)
        new_vecs[pos : pos + n] = sample
        new_labels[pos : pos + n] = lv
        pos += n
    # rounding slack: fill any remainder from the largest cluster
    if pos < N_VECS:
        lv = lab_vals[np.argmax(lab_counts)]
        sub = vecs[labels == lv]
        mu, sd = sub.mean(axis=0), sub.std(axis=0)
        sample = rng.normal(mu, sd, size=(N_VECS - pos, dim))
        sample /= np.linalg.norm(sample, axis=1, keepdims=True)
        new_vecs[pos:] = sample
        new_labels[pos:] = lv
    order = rng.permutation(N_VECS)
    emb_tbl = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in new_vecs[order]],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(new_labels[order], type=pa.int32()),
        }
    )
    pq.write_table(emb_tbl, os.path.join(dest, "embeddings.parquet"))
    return dest


if __name__ == "__main__":
    dest = generate(sys.argv[1] if len(sys.argv) > 1 else None)
    print(dest)
