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

from oracle import assert_matches_oracle
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


def _dir_with(tmp_path_factory, name, table_name, rows):
    d = tmp_path_factory.mktemp(name)
    pd.DataFrame(rows).to_parquet(d / f"{table_name}.parquet")
    return str(d)


def _agree(spark, sf_dir, fn, name):
    """Driver-faithful parity via the shared dtype-gated comparator."""
    got = fn(spark, sf_dir)
    assert_matches_oracle(got, registry.all_oracles()[name], sf_dir)
    cols = sorted(got.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in got.collect())


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
