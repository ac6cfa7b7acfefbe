"""Persistent IVF-PQ index (round 11): cross-batch visibility through the
versioned code table on a crafted corpus where the planted near-duplicate
is only reachable via the batch-1 append, codebook-identity enforcement,
and recall against the raw-embedding persistent index on the fixtures."""

from __future__ import annotations

from oracle import agree_rows, crafted_dir

from serverless_mapreduce_spark.operators.similarity import (
    ann_persistent_ivf,
    ann_persistent_ivfpq,
)

# PQ sub-quantizer candidates per dim come from the SAME deterministic
# centroid sample (vecs 0 and 50). B differs from A in dims 1-3 so the
# per-dim codebook actually discriminates there; dims 4-15 are zero in
# every vector (16 dims / IVFPQ_M=16 -> one dim per sub-quantizer).
_PAD = [0.0] * 12
_A = [1.0, 0.0, 0.0, 0.0] + _PAD   # vec 0: coarse centroid + PQ entry
_B = [0.0, 1.0, 1.0, 1.0] + _PAD   # vec 50: coarse centroid + PQ entry


def test_ivfpq_cross_batch_neighbor_via_codes(spark, tmp_path_factory):
    """vec 7 (batch 2) shares vec 13's (batch 1) distinctive code pattern
    [A,A,B,A] — ADC distance 0.130001 — while every standing cell-A
    member codes to [A,A,A,A] at ADC 0.730001. Rank 1 must be the
    batch-1 vector, reachable only through the index version that
    appended batch 1's codes; a lost append silently falls back to
    vec 0."""
    rows = [
        {"vec_id": 0, "embedding": _A},
        {"vec_id": 50, "embedding": _B},
        {"vec_id": 1, "embedding": [0.9, 0.1, 0.0, 0.0] + _PAD},    # standing, A
        {"vec_id": 21, "embedding": [0.0, 0.9, 0.9, 0.9] + _PAD},   # standing, B
        {"vec_id": 13, "embedding": [0.7, 0.0, 0.8, 0.0] + _PAD},   # batch 1, A
        {"vec_id": 7, "embedding": [0.7, 0.0, 0.8, 0.001] + _PAD},  # batch 2, A
    ]
    d = crafted_dir(tmp_path_factory, "ivfpq", rows, table_name="embeddings")
    got = agree_rows(
        spark, d, ann_persistent_ivfpq, "ann_persistent_ivfpq", as_dicts=True
    )
    by = {(r["batch"], r["q_id"], r["rnk"]): r for r in got}
    # batch 1 probe (13): only standing cell-A members, identical codes,
    # tie broken by nb_id
    assert by[(1, 13, 1)]["nb_id"] == 0
    assert abs(by[(1, 13, 1)]["adist2"] - 0.73) < 1e-9
    assert by[(1, 13, 2)]["nb_id"] == 1
    assert (1, 13, 3) not in by
    # batch 2 probe (7): rank 1 is the BATCH-1 vector through its code —
    # visible only via the persisted append
    assert by[(2, 7, 1)]["nb_id"] == 13
    assert abs(by[(2, 7, 1)]["adist2"] - 0.130001) < 1e-9
    assert by[(2, 7, 2)]["nb_id"] == 0


def test_ivfpq_recall_vs_raw_persistent_index(spark, sf_dir):
    """The 32x-smaller code index must still retrieve most of what the
    raw-embedding persistent index retrieves (same cells, same batches —
    the only difference is ADC-over-codes vs exact cosine ranking)."""
    raw = {
        (r.batch, r.q_id, r.nb_id)
        for r in ann_persistent_ivf(spark, sf_dir).collect()
    }
    pq = {
        (r.batch, r.q_id, r.nb_id)
        for r in ann_persistent_ivfpq(spark, sf_dir).collect()
    }
    assert raw and pq
    recall = len(pq & raw) / len(raw)
    # The synthetic fixtures are ~random unit vectors — PQ's worst case
    # (no low-rank structure); measured 0.39 at IVFPQ_M=16 (vs 0.24 at
    # the demo encoder's M=4 — the constant's rationale). Deterministic
    # computation, floored with margin for tie shuffles only.
    assert recall >= 0.3, f"IVFPQ recall vs raw index {recall:.2f}"


def test_rerank_buys_back_quantization_loss(spark, sf_dir):
    """The two-tier serve (ADC shortlist R=20 + exact re-rank) must
    recover most of the exact same-cell ranking that pure ADC loses:
    measured 0.87 recall vs the cell-exact truth on the worst-case
    synthetic fixtures (pure ADC: 0.39). Deterministic computation;
    floored with margin for tie shuffles only."""
    from serverless_mapreduce_spark.operators.similarity import (
        QUERY_MOD,
        TOP_K,
        _ivf_ranked,
        ann_ivfpq_rerank_topk,
        cosine,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    got = {
        (r.q_id, r.nb_id)
        for r in ann_ivfpq_rerank_topk(spark, sf_dir).collect()
    }
    # cell-exact truth: same candidates (own cell), exact cosine top-k
    ranked = _ivf_ranked(spark, sf_dir).select("vec_id", "embedding", "centroid")
    q = ranked.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        "centroid",
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    truth = {
        (r.q_id, r.vec_id)
        for r in ranked.join(F.broadcast(q), "centroid")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("cs", F.round(cosine(F.col("embedding"), F.col("q_emb")), 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .collect()
    }
    assert truth and got
    recall = len(got & truth) / len(truth)
    assert recall >= 0.7, f"rerank recall vs cell-exact truth {recall:.2f}"
