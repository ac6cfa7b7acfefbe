"""Recall of the KMeans-trained IVF against exact brute force: nprobe
cells must recover most true neighbors, and widening nprobe to all cells
must recover all of them (IVF's defining trade)."""

from __future__ import annotations

from serverless_mapreduce_spark.operators.similarity import (
    N_CENTROIDS,
    ann_ivf_kmeans,
    ann_topk_bruteforce,
)


def _pairs(df):
    return {(r.q_id, r.vec_id) for r in df.collect()}


def test_kmeans_ivf_recall_vs_bruteforce(spark, sf_dir):
    truth = _pairs(ann_topk_bruteforce(spark, sf_dir))
    assert truth

    got = _pairs(ann_ivf_kmeans(spark, sf_dir))
    recall = len(got & truth) / len(truth)
    # Default nprobe (3 of 8 cells): most neighbors live in the nearest cells.
    assert recall >= 0.5, f"recall {recall:.2f}"

    # Probing every cell makes IVF exhaustive — exact recovery.
    full = _pairs(ann_ivf_kmeans(spark, sf_dir, nprobe=N_CENTROIDS))
    assert full == truth
