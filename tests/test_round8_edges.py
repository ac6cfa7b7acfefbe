"""Round-8 edge coverage: crafted-corpus dual-engine agreement for the new
operators whose interesting branches the generated fixtures never fire —
the SemDeDup cluster cap's one-sided bias (fixture clusters top out at 62
members, SEMDEDUP_CAP is 64), zero-token documents in the length-bucket
batching plan, and per-source dropout/full-survival edges of the
quality-filter threshold sweep.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from oracle import agree_rows, assert_matches_oracle, crafted_dir
from serverless_mapreduce_spark import registry
from serverless_mapreduce_spark.operators.similarity import (
    SEMDEDUP_CAP,
    semdedup_prune,
)
from serverless_mapreduce_spark.operators.text import (
    MAX_SEQ_LEN,
    SWEEP_MAX_MILLI,
    length_bucket_batch_plan,
    quality_filter_sweep,
)


# canonical helpers live in tests/oracle.py (single comparator source)
def _dir_with(tmp_path_factory, name, table_name, rows):
    return crafted_dir(tmp_path_factory, name, rows, table_name=table_name)


_agree = agree_rows


# --- semdedup_prune: cap branch -------------------------------------------------


@pytest.fixture(scope="module")
def mega_cluster_dir(tmp_path_factory):
    """One cluster with SEMDEDUP_CAP + 8 members. vec_ids 0..69 are exact
    copies of the basis vector e0 (so every one of 1..69 is a true
    near-dup of vec 0); vec_ids 70 and 71 are copies of e1 — near-dups of
    EACH OTHER but orthogonal to everything ranked inside the cap. All 72
    vectors land in centroid 0's cluster (cosine ties break to the lowest
    centroid id on both engines), so ranks 65..72 exist and the
    rn <= SEMDEDUP_CAP gate actually cuts."""
    assert SEMDEDUP_CAP == 64  # the shapes below assume the shipped cap
    e0 = [1.0, 0.0, 0.0, 0.0]
    e1 = [0.0, 1.0, 0.0, 0.0]
    emb = [e0] * 70 + [e1, e1]
    return _dir_with(
        tmp_path_factory,
        "semdedup_mega",
        "embeddings",
        {
            "vec_id": np.arange(72, dtype=np.int64),
            "embedding": [np.array(v, dtype=np.float32) for v in emb],
        },
    )


def test_semdedup_cap_one_sided_bias(spark, mega_cluster_dir):
    """Members ranked past SEMDEDUP_CAP can still BE pruned but never
    prune others: vec 71's only true near-dup is vec 70 (rank 71 > cap),
    so 71 must survive; vecs 64..69 sit past the cap themselves yet are
    pruned by in-cap vec 0. Dual-engine agreement runs through the shared
    comparator first, then content is pinned."""
    rows = _agree(spark, mega_cluster_dir, semdedup_prune, "semdedup_prune")
    # sorted(df.columns) = [centroid, max_lower_sim, pruned, vec_id]
    by_vec = {int(r[3]): r for r in rows}
    assert len(by_vec) == 72
    # every vector assigned to centroid 0 (tie-break): one mega-cluster
    assert {r[0] for r in rows} == {"0"}
    pruned = {v for v, r in by_vec.items() if r[2] == "1"}
    # copies of e0 except the canonical lowest id — INCLUDING ranks past
    # the cap (they are pruned BY vec 0, which is inside the cap)
    assert pruned == set(range(1, 70))
    # vec 70 is orthogonal to every in-cap member: kept
    assert by_vec[70][2] == "0"
    # vec 71's only near-dup (70) ranks past the cap and so cannot prune
    # it — the documented one-sided load-shedding bias, observed
    assert by_vec[71][2] == "0"
    assert float(by_vec[71][1]) == 0.0
    # and the in-cap near-dups really matched at cosine 1.0
    assert float(by_vec[69][1]) == 1.0


# --- length_bucket_batch_plan: zero-token and truncation edges -------------------


@pytest.fixture(scope="module")
def batching_docs_dir(tmp_path_factory):
    """Two zero-token docs (empty text / whitespace runs) that must be
    dropped on BOTH engines, one doc far past MAX_SEQ_LEN that must
    truncate into the top bucket, and one 1-token doc in the smallest
    bucket."""
    long_doc = " ".join(["w"] * (MAX_SEQ_LEN + 37))
    return _dir_with(
        tmp_path_factory,
        "batching_docs",
        "documents",
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["", "   ", long_doc, "solo", "a b c"],
            "lang": ["en"] * 5,
            "source": ["s1"] * 5,
        },
    )


def test_length_bucket_zero_token_and_truncation(spark, batching_docs_dir):
    rows = _agree(
        spark, batching_docs_dir, length_bucket_batch_plan, "length_bucket_batch_plan"
    )
    # sorted(df.columns) = [bucket_len, n_batches, n_docs, n_truncated,
    #                       pad_tokens, sum_tokens, waste_ppm]
    by_bucket = {int(r[0]): r for r in rows}
    # zero-token docs dropped: only the 16 bucket (2 docs) and 64 bucket
    assert set(by_bucket) == {16, MAX_SEQ_LEN}
    assert int(by_bucket[16][2]) == 2
    top = by_bucket[MAX_SEQ_LEN]
    assert int(top[2]) == 1 and int(top[3]) == 1  # one doc, truncated
    assert int(top[5]) == MAX_SEQ_LEN  # eff tokens capped at the window
    assert int(top[4]) == 0 and int(top[6]) == 0  # truncation pads nothing


# --- quality_filter_sweep: dropout and full-survival edges -----------------------


@pytest.fixture(scope="module")
def sweep_docs_dir(tmp_path_factory):
    """Source s_zero scores 0 permille everywhere (no stopwords) — it may
    appear ONLY at threshold 0; source s_all is pure stopwords (1000
    permille) and must survive every threshold with surviving_ppm
    = 1000000 at each."""
    return _dir_with(
        tmp_path_factory,
        "sweep_docs",
        "documents",
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "quick brown fox jumps",
                "lazy dog sleeps",
                "the a of and",
                "to in is the the",
            ],
            "lang": ["en"] * 4,
            "source": ["s_zero", "s_zero", "s_all", "s_all"],
        },
    )


def test_quality_filter_sweep_dropout_and_survival(spark, sweep_docs_dir):
    rows = _agree(spark, sweep_docs_dir, quality_filter_sweep, "quality_filter_sweep")
    # sorted(df.columns) = [n_docs_surviving, n_tokens_surviving, source,
    #                       surviving_ppm, thresh_milli]
    zero = [r for r in rows if r[2] == "s_zero"]
    full = [r for r in rows if r[2] == "s_all"]
    n_thresh = SWEEP_MAX_MILLI // 25 + 1
    assert [int(r[4]) for r in zero] == [0]  # dropout past threshold 0
    assert int(zero[0][3]) == 1000000
    assert len(full) == n_thresh  # survives the whole grid
    assert all(int(r[3]) == 1000000 and int(r[0]) == 2 for r in full)


# --- label_knn_disagreement: suspect / agreeing / singleton branches --------------


@pytest.fixture(scope="module")
def labeled_cells_dir(tmp_path_factory):
    """Two cells: cell A (near e0) holds vecs 0..9 all labeled 7 except
    vec 5 (labeled 3 — the planted label error); cell B is vec 50 alone
    (a singleton: zero neighbors, never a suspect). vec 50 is the second
    deterministic centroid (vec_id % 50 == 0)."""
    rows = []
    for k in range(10):
        rows.append((k, [1.0, k * 0.01, 0.0, 0.0], 3 if k == 5 else 7))
    rows.append((50, [0.0, 0.0, 1.0, 0.0], 7))
    return _dir_with(
        tmp_path_factory,
        "labeled_cells",
        "embeddings",
        {
            "vec_id": np.array([r[0] for r in rows], dtype=np.int64),
            "embedding": [np.array(r[1], dtype=np.float32) for r in rows],
            "label": np.array([r[2] for r in rows], dtype=np.int32),
        },
    )


def test_label_knn_disagreement_branches(spark, labeled_cells_dir):
    from serverless_mapreduce_spark.operators.similarity import (
        label_knn_disagreement,
    )

    rows = _agree(
        spark, labeled_cells_dir, label_knn_disagreement, "label_knn_disagreement"
    )
    # sorted(df.columns) = [label, n_disagree, n_neighbors, suspect, vec_id]
    by_vec = {int(r[4]): r for r in rows}
    assert len(by_vec) == 11
    # the planted error: all 5 of vec 5's neighbors carry label 7
    assert by_vec[5][:4] == ("3", "5", "5", "1")
    # a clean member sees vec 5 among its 5 neighbors at most once:
    # 2*1 > 5 is false, so no clean member is a suspect
    for k in [0, 1, 2, 3, 4, 6, 7, 8, 9]:
        assert by_vec[k][3] == "0", k
        assert int(by_vec[k][2]) == 5
    # the singleton cell: zero neighbors, zero disagreement, not suspect
    assert by_vec[50][:4] == ("7", "0", "0", "0")


# --- ngram_novelty_score: df counting, short-doc and blank-doc conventions -------


@pytest.fixture(scope="module")
def novelty_docs_dir(tmp_path_factory):
    """docs 1+2 are identical (every shingle df>=2 → novelty 0); doc 3 is
    unique (novelty 1e6); doc 4 is shorter than the shingle width (whole
    text becomes its one — unique — shingle); doc 5 is blank (must be
    absent); doc 6 shares one of its two shingles with docs 1/2
    (novelty exactly 500000)."""
    return _dir_with(
        tmp_path_factory,
        "novelty_docs",
        "documents",
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "alpha beta gamma delta",
                "alpha beta gamma delta",
                "epsilon zeta eta",
                "hi there",
                "",
                "alpha beta gamma unique1",
            ],
            "lang": ["en"] * 6,
            "source": ["s1"] * 6,
        },
    )


def test_ngram_novelty_conventions(spark, novelty_docs_dir):
    from serverless_mapreduce_spark.operators.dedup import ngram_novelty_score

    rows = _agree(spark, novelty_docs_dir, ngram_novelty_score, "ngram_novelty_score")
    # sorted(df.columns) = [doc_id, n_novel, n_shingles, novelty_ppm]
    by_doc = {int(r[0]): (int(r[2]), int(r[1]), int(r[3])) for r in rows}
    assert set(by_doc) == {1, 2, 3, 4, 6}  # blank doc 5 absent
    assert by_doc[1] == (2, 0, 0)  # both shingles shared with doc 2 (+1 with 6)
    assert by_doc[2] == (2, 0, 0)
    assert by_doc[3] == (1, 1, 1000000)  # unique trigram
    assert by_doc[4] == (1, 1, 1000000)  # short doc: whole text, unique
    assert by_doc[6] == (2, 1, 500000)  # one shared, one novel


# --- embedding_cluster_balance: majority tie-break --------------------------------


def test_cluster_balance_majority_tie_break(spark, tmp_path_factory):
    """A cell whose two labels tie on count must report the SMALLEST label
    as majority on both engines (rank: count DESC, label ASC), with the
    exact rational Gini: counts {1:2, 2:2} → gini = (16-8)·1e6 // 16."""
    from serverless_mapreduce_spark.operators.similarity import (
        embedding_cluster_balance,
    )

    d = _dir_with(
        tmp_path_factory,
        "balance_tie",
        "embeddings",
        {
            "vec_id": np.arange(4, dtype=np.int64),
            "embedding": [np.array([1.0, 0.0], dtype=np.float32)] * 4,
            "label": np.array([1, 1, 2, 2], dtype=np.int32),
        },
    )
    rows = _agree(spark, d, embedding_cluster_balance, "embedding_cluster_balance")
    # sorted(df.columns) = [centroid, label_gini_ppm, majority_label,
    #                       majority_ppm, n_labels, n_vecs]
    assert len(rows) == 1
    r = rows[0]
    assert r == ("0", "500000", "1", "500000", "2", "4")


# --- graph LPA + modularity: oscillation, empty-within arm, negative q ------------


def test_lpa_star_oscillation_and_negative_modularity(spark, tmp_path_factory):
    """A star graph makes synchronous LPA oscillate (center and leaves swap
    labels every round) — the fixed-round contract must still agree across
    engines at exactly LPA_ROUNDS=3: center ends labeled 2, leaves labeled
    1. Both final communities have ZERO internal edges, exercising the
    e_within LEFT-JOIN/COALESCE arm, and both take NEGATIVE exact
    modularity: q = (0 - d_c^2)·1e6 // D^2 = -250000 each (D = 6)."""
    from serverless_mapreduce_spark.operators.graph import (
        LPA_ROUNDS,
        graph_lpa_communities,
        graph_modularity_report,
    )

    assert LPA_ROUNDS == 3  # the hand-simulated labels below assume 3 rounds
    # co-purchase star: orders {1,2}, {1,3}, {1,4} → edges 1-2, 1-3, 1-4
    d = _dir_with(
        tmp_path_factory,
        "lpa_star",
        "lineitem",
        {
            "l_orderkey": [1, 1, 2, 2, 3, 3],
            "l_partkey": [1, 2, 1, 3, 1, 4],
        },
    )
    rows = _agree(spark, d, graph_lpa_communities, "graph_lpa_communities")
    # sorted(df.columns) = [comm_size, community, node]
    got = {int(r[2]): (int(r[1]), int(r[0])) for r in rows}
    # round 1: center 1 -> min(2,3,4)=2 (vote tie-break), leaves -> 1;
    # round 2 swaps back; round 3 swaps again — the frozen state:
    assert got == {1: (2, 1), 2: (1, 3), 3: (1, 3), 4: (1, 3)}

    mrows = _agree(spark, d, graph_modularity_report, "graph_modularity_report")
    # sorted(df.columns) = [community, degree_sum, e_boundary, e_within,
    #                       n_nodes, q_contrib_ppm]
    by_comm = {int(r[0]): r for r in mrows}
    assert set(by_comm) == {1, 2}
    assert by_comm[2][1:] == ("3", "3", "0", "1", "-250000")  # the center
    assert by_comm[1][1:] == ("3", "3", "0", "3", "-250000")  # the leaves


# --- truncating division on NEGATIVES: the modularity contract --------------------


def test_trunc_div_negative_parity(spark):
    """Round 7 pinned Spark ``DIV`` == DuckDB ``//`` on POSITIVES; the
    modularity report extends the reliance to NEGATIVE numerators (its q
    contributions). Both must truncate toward zero (unlike Python's
    flooring ``//``) on an adversarial operand set."""
    import duckdb

    pairs = [
        (-7, 2), (7, 2), (-9000000, 36), (-9000001, 36), (-1, 3), (1, 3),
        (-(10**12) - 1, 7), (10**12 + 1, 7), (-5, 5), (0, 9),
        (-(2**62), 3), (2**62, 3),
    ]
    sdf = spark.createDataFrame(pairs, "a long, b long").selectExpr(
        "a", "b", "a DIV b AS q"
    )
    got = {(r.a, r.b): r.q for r in sdf.collect()}
    con = duckdb.connect()
    exp = {
        (a, b): con.execute(
            "SELECT CAST(? AS BIGINT) // CAST(? AS BIGINT)", [a, b]
        ).fetchone()[0]
        for a, b in pairs
    }
    assert got == exp
    # and both differ from Python's flooring // exactly on inexact negatives
    assert got[(-7, 2)] == -3 and (-7) // 2 == -4


# --- int64-envelope guards: synthetic bounds past the envelope --------------------


def test_int64_guards_fire_past_envelope():
    """The modularity and gini guards must pass at the documented bounds
    and raise loudly just past them (the DSIR guard contract: the scale
    story lives in code). Envelope: x²·1e6 ≤ 2^63-1 ⇔ x ≤ 3_037_000."""
    from serverless_mapreduce_spark.operators.graph import (
        _modularity_int64_guard,
    )
    from serverless_mapreduce_spark.operators.similarity import _gini_int64_guard

    _modularity_int64_guard(3_037_000)
    _gini_int64_guard(3_037_000)
    with pytest.raises(ValueError, match="DECIMAL"):
        _modularity_int64_guard(3_037_001)
    with pytest.raises(ValueError, match="DECIMAL"):
        _gini_int64_guard(3_037_001)


# --- bm25_search_topk: idf arms and length normalization --------------------------


def test_bm25_idf_arms_and_length_norm(spark, tmp_path_factory):
    """Pins: the df=0 idf arm ('hash' absent from this corpus — must
    contribute 0, not divide by zero), rare-term dominance (the one 'dup'
    doc outranks every 'query' doc through the floor-log2 idf ladder),
    length normalization (equal tf, shorter doc ranks higher), and that
    term-less docs never appear."""
    from serverless_mapreduce_spark.operators.text import bm25_search_topk

    d = _dir_with(
        tmp_path_factory,
        "bm25_corpus",
        "documents",
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
            "text": [
                "dup alpha beta",
                "query alpha beta",
                "query alpha beta gamma delta epsilon",
                "query query alpha beta gamma delta",
                "alpha beta",
                "no terms here",
                "filler filler filler",
                "more filler words",
            ],
            "lang": ["en"] * 8,
            "source": ["s1"] * 8,
        },
    )
    rows = _agree(spark, d, bm25_search_topk, "bm25_search_topk")
    # sorted(df.columns) = [doc_id, rnk, score]
    by_rank = {int(r[1]): int(r[0]) for r in rows}
    assert set(by_rank.values()) == {1, 2, 3, 4}  # term-less docs excluded
    assert by_rank[1] == 1  # rare 'dup' (idf 3000) dominates
    # equal tf=1 for 'query': shorter doc 2 beats longer doc 3
    assert by_rank.get(2) is not None
    r2 = [int(r[1]) for r in rows if int(r[0]) == 2][0]
    r3 = [int(r[1]) for r in rows if int(r[0]) == 3][0]
    assert r2 < r3
