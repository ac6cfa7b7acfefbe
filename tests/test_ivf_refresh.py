"""Pins for the IVF codebook refresh (r13 verdict item 5): injected
gaussian drift collapses nprobe=1 recall under the frozen codebook, a
k-means retrain through :func:`ivf_refresh` recovers it, and the
(codebook, index) swap is a single catalog transaction — no txn in the
log ever pairs an old codebook with a new index."""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import functions as F

from serverless_mapreduce_spark.operators.similarity import (
    _ivf_assign,
    ivf_drift_metrics,
    ivf_refresh,
)
from serverless_mapreduce_spark.sources.snapshots import (
    MultiTableCatalog,
    SnapshotTable,
)

DIM = 32
RNG = np.random.default_rng(7)


def _cluster(mean_dim: int, n: int, scale: float = 0.15) -> np.ndarray:
    mu = np.zeros(DIM)
    mu[mean_dim] = 1.0
    return mu + RNG.normal(0.0, scale, size=(n, DIM))


def _vdf(spark, ids, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _norm(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _recall(probes: np.ndarray, corpus_ids, corpus, cents, k: int = 5) -> float:
    """nprobe=1 IVF recall@k vs brute force, numpy ground truth."""
    cn, xn, pn = _norm(cents), _norm(corpus), _norm(probes)
    assign_x = (xn @ cn.T).argmax(axis=1)
    total = 0.0
    for p in pn:
        cell = (p @ cn.T).argmax()
        sims = xn @ p
        brute = set(np.asarray(corpus_ids)[np.argsort(-sims)[:k]])
        in_cell = np.where(assign_x == cell)[0]
        got = set(
            np.asarray(corpus_ids)[in_cell[np.argsort(-sims[in_cell])[:k]]]
        )
        total += len(brute & got) / k
    return total / len(pn)


def _kmeans(x: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    rng = np.random.default_rng(11)
    cents = x[rng.choice(len(x), k, replace=False)]
    for _ in range(iters):
        a = (_norm(x) @ _norm(cents).T).argmax(axis=1)
        for j in range(k):
            if (a == j).any():
                cents[j] = x[a == j].mean(axis=0)
    return cents


def test_refresh_recovers_recall_and_swap_is_one_txn(spark, tmp_path):
    # standing corpus: 4 separated clusters in dims 0..3
    a_vecs = np.vstack([_cluster(d, 50) for d in range(4)])
    a_ids = np.arange(200)
    a_probes = np.vstack([_cluster(d, 5) for d in range(4)])
    old_cents = a_vecs[[0, 50, 100, 150]]
    pre_drift = _recall(a_probes, a_ids, a_vecs, old_cents)

    # drift: 3 NEW clusters in dims 16..18 — orthogonal to every old
    # centroid, so their cell assignment is argmax over pure noise and
    # the mass SPLITS across old cells: frozen-codebook recall collapses
    b_vecs = np.vstack([_cluster(16 + d, 20) for d in range(3)])
    b_ids = np.arange(1000, 1060)
    b_probes = np.vstack([_cluster(16 + d, 4) for d in range(3)])
    corpus_vecs = np.vstack([a_vecs, b_vecs])
    corpus_ids = np.concatenate([a_ids, b_ids])
    drift_recall = _recall(b_probes, corpus_ids, corpus_vecs, old_cents)
    assert drift_recall < pre_drift - 0.2  # drift really hurt

    # machinery: corpus/codebook/index tables + catalog
    root = str(tmp_path)
    corpus_t = SnapshotTable(f"{root}/corpus")
    codebook_t = SnapshotTable(f"{root}/codebook")
    index_t = SnapshotTable(f"{root}/index")
    cat = MultiTableCatalog(root)
    cv = corpus_t.commit(_vdf(spark, corpus_ids, corpus_vecs))
    wc = codebook_t.commit(_vdf(spark, [0, 50, 100, 150], old_cents))
    cb = codebook_t.read(spark, wc).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")
    )
    wi = index_t.commit(
        _ivf_assign(corpus_t.read(spark, cv), cb).drop("c_cos")
    )
    cat.publish({"ivf_codebook": wc, "ivf_index": wi})

    # the drifted batch's drift metrics under the frozen codebook: the
    # mean assignment cosine collapses vs the standing baseline (the
    # verdict's assignment-distance signal)
    standing = _ivf_assign(_vdf(spark, a_ids, a_vecs), cb)
    drifted = _ivf_assign(_vdf(spark, b_ids, b_vecs), cb)
    _, base_cos = ivf_drift_metrics(standing)
    _, drift_cos = ivf_drift_metrics(drifted)
    assert drift_cos < base_cos - 0.3

    # retrain (k-means on the CURRENT corpus) + atomic swap
    new_cents = _kmeans(corpus_vecs, 7)
    ivf_refresh(
        spark,
        cat,
        corpus_t,
        codebook_t,
        index_t,
        _vdf(spark, range(7), new_cents),
        cv,
        "ivf",
        0,
    )

    # post-refresh recall SERVED FROM THE SWAPPED TABLES
    head = cat._head()["tables"]
    cb2 = codebook_t.read(spark, head["ivf_codebook"]).collect()
    cents2 = np.array(
        [r["embedding"] for r in sorted(cb2, key=lambda r: r["vec_id"])]
    )
    idx_rows = index_t.read(spark, head["ivf_index"]).collect()
    cn2 = _norm(cents2)
    cent_ids2 = [r["vec_id"] for r in sorted(cb2, key=lambda r: r["vec_id"])]
    by_cell: dict[int, list] = {}
    for r in idx_rows:
        by_cell.setdefault(r["centroid"], []).append(
            (r["vec_id"], np.array(r["embedding"]))
        )
    xn = _norm(corpus_vecs)
    id_to_pos = {int(i): p for p, i in enumerate(corpus_ids)}
    total = 0.0
    for p in _norm(b_probes):
        cell = cent_ids2[int((p @ cn2.T).argmax())]
        sims = xn @ p
        brute = set(corpus_ids[np.argsort(-sims)[:5]])
        members = by_cell.get(cell, [])
        got = {
            vid
            for vid, _v in sorted(
                members, key=lambda t: -sims[id_to_pos[int(t[0])]]
            )[:5]
        }
        total += len(brute & got) / 5
    post_refresh = total / len(b_probes)
    assert post_refresh >= pre_drift - 0.05
    assert post_refresh > drift_recall + 0.2

    # atomicity: in the whole txn log, every change to ivf_codebook
    # happens in the SAME txn as a change to ivf_index — no reader can
    # resolve a mixed pair from any head
    states = []
    for n in cat.txns():
        with open(cat._txn_path(n)) as fh:
            t = json.load(fh)["tables"]
        states.append((t.get("ivf_codebook"), t.get("ivf_index")))
    for (cb_a, ix_a), (cb_b, ix_b) in zip(states, states[1:]):
        if cb_b != cb_a:
            assert ix_b != ix_a, "codebook flipped without its index"
    # and the refresh really landed as one new txn with both flipped
    assert states[-1][0] != wc and states[-1][1] != wi
