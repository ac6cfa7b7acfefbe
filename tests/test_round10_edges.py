"""Round-10 edge pins: persistent IVF cross-batch retrieval visibility.

ann_persistent_ivf is green on the synthetic fixtures, but nothing at
sf0.01 guarantees a batch-2 probe's TOP neighbor is a batch-1 vector — a
broken index append (batch 2 probing only the standing corpus) could stay
green at the driver's correctness SF (the r7 VACUOUS-GREEN trap, same
reasoning as test_round9_edges for the band index). This crafted corpus
makes the cross-batch neighbor the unique rank-1 answer, dual-engine
verified through the shared comparator.
"""

from __future__ import annotations

from oracle import agree_rows, crafted_dir

from serverless_mapreduce_spark.operators.similarity import ann_persistent_ivf

_A = [1.0, 0.0, 0.0, 0.0]        # centroid of cell A (vec 0)
_B = [0.0, 1.0, 0.0, 0.0]        # centroid of cell B (vec 50)


def test_ann_persistent_ivf_cross_batch_neighbor(spark, tmp_path_factory):
    """vec 7 (batch 2) is nearly identical to vec 13 (batch 1) — cosine
    ~1.0 — while its best STANDING neighbor is the centroid itself at
    0.8. Rank 1 must be the batch-1 vector, reachable only through the
    index version that appended batch 1's assignments; if the append were
    lost, rank 1 would silently fall back to vec 0."""
    rows = [
        {"vec_id": 0, "embedding": _A},
        {"vec_id": 50, "embedding": _B},
        {"vec_id": 1, "embedding": [0.9, 0.1, 0.0, 0.0]},     # standing, cell A
        {"vec_id": 21, "embedding": [0.1, 0.95, 0.0, 0.0]},   # standing, cell B
        {"vec_id": 13, "embedding": [0.8, 0.0, 0.6, 0.0]},    # batch 1, cell A
        {"vec_id": 7, "embedding": [0.8, 0.0, 0.6, 0.001]},   # batch 2, cell A
    ]
    d = crafted_dir(tmp_path_factory, "persistivf", rows, table_name="embeddings")
    got = agree_rows(spark, d, ann_persistent_ivf, "ann_persistent_ivf",
                     as_dicts=True)
    by = {(r["batch"], r["q_id"], r["rnk"]): r for r in got}
    # batch 1 probe 13 sees only the standing cell-A members (0 and 1)
    assert by[(1, 13, 1)]["nb_id"] == 0 and by[(1, 13, 1)]["cos_sim"] == 0.8
    assert by[(1, 13, 2)]["nb_id"] == 1
    assert (1, 13, 3) not in by
    # batch 2 probe 7's rank-1 is the BATCH-1 vector at cosine ~1.0 —
    # visible only through the persisted append; the standing centroid
    # (0.8) is the runner-up
    assert by[(2, 7, 1)]["nb_id"] == 13 and by[(2, 7, 1)]["cos_sim"] >= 0.999999
    assert by[(2, 7, 2)]["nb_id"] == 0 and by[(2, 7, 2)]["cos_sim"] == 0.8
