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


def test_semantic_pack_spans_split_carry(spark, tmp_path_factory):
    """A 1200-token document must split across packs 0/1/2 (512+512+176)
    and the next document must START mid-pack-2 at offset 176 — the
    split/carry layout the loader consumes without re-cutting. Every pack
    except the cell's last must be exactly PACK_BUDGET tokens full."""
    from serverless_mapreduce_spark.operators.similarity import (
        PACK_BUDGET,
        semantic_pack_spans,
    )

    assert PACK_BUDGET == 512  # the expectations below are written for 512
    docs = [
        {"doc_id": 1, "text": " ".join(f"w{i}" for i in range(1200))},
        {"doc_id": 2, "text": " ".join(f"x{i}" for i in range(100))},
        {"doc_id": 3, "text": ""},  # zero tokens -> no span
    ]
    embs = [
        {"vec_id": 0, "embedding": [1.0, 0.0]},   # the only centroid
        {"vec_id": 1, "embedding": [1.0, 0.0]},
        {"vec_id": 2, "embedding": [0.9, 0.1]},
        {"vec_id": 3, "embedding": [0.8, 0.2]},
    ]
    d = crafted_dir(
        tmp_path_factory, "packspans",
        tables={"documents": docs, "embeddings": embs},
    )
    got = agree_rows(spark, d, semantic_pack_spans, "semantic_pack_spans",
                     as_dicts=True)
    rows = {(r["doc_id"], r["pack_id"]):
            (r["pack_offset"], r["tok_start"], r["tok_end"], r["span_len"])
            for r in got}
    assert rows == {
        (1, 0): (0, 0, 512, 512),
        (1, 1): (0, 512, 1024, 512),
        (1, 2): (0, 1024, 1200, 176),
        (2, 2): (176, 0, 100, 100),
    }
    # invariant: non-terminal packs are exactly full
    from collections import defaultdict

    fill = defaultdict(int)
    for r in got:
        fill[(r["centroid"], r["pack_id"])] += r["span_len"]
    last = max(p for _, p in fill)
    for (c, p), tot in fill.items():
        assert tot == 512 or p == last


def test_dedup_purge_rewrite_removes_losers(spark, tmp_path_factory):
    """Crafted corpus with real exact duplicates (the synthetic fixture
    has none below sf0.1): the purge must keep exactly the min-doc_id
    copy of each content group — including the NULL-text group (the
    NULL-safe-window lesson) — and drop the rest, dual-engine verified."""
    from serverless_mapreduce_spark.operators.dedup import dedup_purge_rewrite

    rows = [
        {"doc_id": 1, "source": "web", "text": "alpha bravo charlie"},
        {"doc_id": 2, "source": "web", "text": "alpha  bravo   charlie"},  # ws-dup of 1
        {"doc_id": 3, "source": "web", "text": "unique one"},
        {"doc_id": 4, "source": "book", "text": "ALPHA BRAVO CHARLIE"},    # case-dup of 1
        {"doc_id": 5, "source": "book", "text": None},
        {"doc_id": 6, "source": "book", "text": None},                     # NULL-dup of 5
        {"doc_id": 7, "source": "book", "text": "unique two"},
    ]
    d = crafted_dir(tmp_path_factory, "purge", rows)
    got = agree_rows(spark, d, dedup_purge_rewrite, "dedup_purge_rewrite",
                     as_dicts=True)
    by = {r["source"]: r for r in got}
    # survivors: web {1, 3}; book {5, 7} (4 lost to 1 cross-source, 6 to 5)
    assert by["web"]["n_docs"] == 2 and by["web"]["xor_doc_id"] == 1 ^ 3
    assert by["book"]["n_docs"] == 2 and by["book"]["xor_doc_id"] == 5 ^ 7


def test_span_corruption_invariants(spark, sf_dir):
    """The layout's structural promises: spans confined to their segment
    (hence never overlapping), in-bounds, lengths in 2..4, and corpus
    corruption density near the 15 % target (the segment construction
    biases slightly low — floor twice — so assert a band, not a point)."""
    from serverless_mapreduce_spark.operators.dedup import _tokens
    from serverless_mapreduce_spark.operators.text import (
        SPANC_MIN_TOKENS,
        span_corruption_layout,
    )
    from serverless_mapreduce_spark.catalog import table as _table
    from pyspark.sql import functions as F

    spans = span_corruption_layout(spark, sf_dir).collect()
    ntok = {
        r.doc_id: r.n
        for r in _table(spark, sf_dir, "documents")
        .select("doc_id", F.size(_tokens("text")).alias("n"))
        .collect()
    }
    assert spans
    by_doc = {}
    for r in spans:
        assert 2 <= r.span_len <= 4
        assert 0 <= r.span_start and r.span_start + r.span_len <= ntok[r.doc_id]
        by_doc.setdefault(r.doc_id, []).append((r.mask_id, r.span_start, r.span_len))
    corrupted = total = 0
    for doc_id, ss in by_doc.items():
        assert ntok[doc_id] >= SPANC_MIN_TOKENS
        ss.sort()
        for (_, s1, l1), (_, s2, _) in zip(ss, ss[1:]):
            assert s1 + l1 <= s2  # non-overlap, ordered by segment
        corrupted += sum(l for _, _, l in ss)
        total += ntok[doc_id]
    assert 0.08 <= corrupted / total <= 0.18
