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


def test_filter_cascade_audit_keeps_null_text_docs(spark, tmp_path_factory):
    """A NULL-text document has content_key NULL on both engines; the
    oracle's keeper window groups all NULLs together, so the Spark side
    must use a NULL-SAFE dedup join — a plain inner equi-join silently
    dropped these docs from the funnel (r9 review). Both NULL-text docs
    must appear (first-failure 'lang': NULL token stats classify
    'unknown'), with the min doc_id as their shared exact-dup keeper."""
    from serverless_mapreduce_spark.operators.text import filter_cascade_audit

    rows = [
        {"doc_id": 1, "source": "web", "lang": "en", "text": None},
        {"doc_id": 2, "source": "web", "lang": "en", "text": None},
        {"doc_id": 3, "source": "web", "lang": "en",
         "text": "the cat is on the mat and the dog is in the yard"},
    ]
    d = crafted_dir(tmp_path_factory, "cascade_null", rows)
    got = agree_rows(spark, d, filter_cascade_audit, "filter_cascade_audit",
                     as_dicts=True)
    total_docs = sum(r["n_docs"] for r in got)
    assert total_docs == 3, f"NULL-text docs dropped from the funnel: {got}"


def test_bm25_guard_catches_avgdl_numerator_overflow():
    """The avgdl-milli numerator sdl*1000 wraps independently of the
    per-doc scoring term (short-doc corpora: huge n, small max_dl) — the
    guard must bound BOTH intermediates (r9 review)."""
    import pytest

    from serverless_mapreduce_spark.operators.text import _bm25_int64_guard

    imax = (1 << 63) - 1
    # short-doc shape: per-doc term tiny, corpus total past the envelope
    with pytest.raises(ValueError, match="avgdl"):
        _bm25_int64_guard(10, imax // 1000 + 1, 10_000)
    # the existing per-doc-term branch still trips
    with pytest.raises(ValueError, match="integer arithmetic"):
        _bm25_int64_guard(10**6, 10**6, 10**6)
    # boundary: both intermediates inside the envelope pass
    _bm25_int64_guard(100, imax // 1000, 10_000)


def test_corpus_version_diff_new_source_in_delta(spark, tmp_path_factory):
    """The FULL OUTER merge's new-source arm never fires on the synthetic
    fixtures (every source spans both versions) — pin it on a crafted
    corpus where source 'fresh' exists ONLY in the ingest delta
    (doc_id % DIFF_MOD == 0) and 'legacy' only in v1."""
    from serverless_mapreduce_spark.sources.snapshots import corpus_version_diff

    rows = [
        {"doc_id": 1, "source": "legacy", "text": "one two three"},
        {"doc_id": 2, "source": "legacy", "text": "four five"},
        {"doc_id": 10, "source": "fresh", "text": "six seven eight nine"},
        {"doc_id": 20, "source": "fresh", "text": "ten"},
        {"doc_id": 3, "source": "both", "text": "a b"},
        {"doc_id": 30, "source": "both", "text": "c"},
    ]
    d = crafted_dir(tmp_path_factory, "versiondiff", rows)
    got = agree_rows(spark, d, corpus_version_diff, "corpus_version_diff",
                     as_dicts=True)
    by = {r["source"]: r for r in got}
    assert by["fresh"]["n_docs_v1"] == 0 and by["fresh"]["n_docs_added"] == 2
    assert by["fresh"]["n_tokens_v2"] == 5
    assert by["legacy"]["n_docs_added"] == 0 and by["legacy"]["n_docs_v2"] == 2
    assert by["both"] == {"source": "both", "n_docs_v1": 1, "n_tokens_v1": 2,
                          "n_docs_added": 1, "n_tokens_added": 1,
                          "n_docs_v2": 2, "n_tokens_v2": 3}
