"""Round-9 edge pins: persistent band-index cross-batch visibility.

dedup_persistent_index is green on the synthetic fixtures, but at sf0.01
no batch-2 doc's BEST match is a batch-1 doc — so a broken index append
(batch 2 probing only the standing corpus) could stay green at the
driver's correctness SF (the r7 VACUOUS-GREEN trap). This crafted corpus
makes the cross-batch match the UNIQUE best answer, dual-engine verified
through the shared comparator.
"""

from __future__ import annotations

from oracle import agree_rows, crafted_dir

from serverless_mapreduce_spark.operators.dedup import dedup_persistent_index

_T1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def test_dedup_persistent_index_cross_batch_match(spark, tmp_path_factory):
    """doc 15 (batch 2) is an exact copy of doc 10 (batch 1) and a partial
    copy of doc 11 (standing corpus). Its best match MUST be doc 10 at
    jaccard 1.0 — visible only through the index version that appended
    batch 1's bands. If the append were lost, doc 15 would still match
    doc 11 (j=0.8) and the pinned best_match would flip."""
    rows = [
        {"doc_id": 3, "text": "zulu yankee xray whiskey victor uniform tango"},
        {"doc_id": 10, "text": _T1},                 # batch 1 (rem 0)
        {"doc_id": 11, "text": _T1 + " kilo lima"},  # standing (rem 1)
        {"doc_id": 15, "text": _T1},                 # batch 2 (rem 5)
        {"doc_id": 20, "text": "papa oscar november mike lima kilo quebec"},
        {"doc_id": 25, "text": "romeo sierra tango uniform victor whiskey xray"},
    ]
    d = crafted_dir(tmp_path_factory, "persistidx", rows)
    got = agree_rows(spark, d, dedup_persistent_index, "dedup_persistent_index",
                     as_dicts=True)
    by = {(r["batch"], r["doc_id"]): r for r in got}
    assert set(by) == {(1, 10), (1, 20), (2, 15), (2, 25)}
    # batch 1: doc 10 matches the standing doc 11 (8 shared 3-shingles of
    # 10 union => j=0.8), doc 20 is new
    assert by[(1, 10)]["best_match"] == 11
    assert by[(1, 10)]["best_jaccard"] == 0.8
    assert by[(1, 20)]["n_matches"] == 0 and by[(1, 20)]["best_match"] is None
    # batch 2: doc 15's best match is the BATCH-1 doc at j=1.0 — reachable
    # only through the persisted append; doc 11 (j=0.8) is the runner-up
    assert by[(2, 15)]["n_matches"] == 2
    assert by[(2, 15)]["best_match"] == 10
    assert by[(2, 15)]["best_jaccard"] == 1.0
    assert by[(2, 25)]["n_matches"] == 0 and by[(2, 25)]["best_match"] is None
