"""Round-7 edge coverage: dual-engine agreement for the DSIR family,
temperature sampling, and lexical diversity on crafted degenerate corpora
(empty target slice, token-less documents, single-source skew), plus
property pins for the integer-exactness mechanisms the round introduced
(truncating division on positives, FLOOR-quantized correctly-rounded sqrt).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oracle import agree_rows, assert_matches_oracle, crafted_dir
from serverless_mapreduce_spark import registry
from serverless_mapreduce_spark.operators.nlp import (
    dsir_importance_weights,
    dsir_select_topk,
)
from serverless_mapreduce_spark.operators.text import (
    lexical_diversity_gini,
    source_temperature_sample,
)


# canonical helpers live in tests/oracle.py (single comparator source)
_docs_dir = crafted_dir
_agree = agree_rows


@pytest.fixture(scope="module")
def no_target_dir(tmp_path_factory):
    """No en documents at all: the DSIR target model is EMPTY and every
    bucket ratio collapses to the +1-smoothed prior."""
    return _docs_dir(
        tmp_path_factory,
        "dsir_notarget",
        {
            "doc_id": [1, 2, 3],
            "text": ["hola mundo bueno", "bon jour monde", "guten tag welt"],
            "lang": ["es", "fr", "de"],
            "source": ["s1", "s1", "s2"],
        },
    )


@pytest.fixture(scope="module")
def tokenless_dir(tmp_path_factory):
    """Raw docs with no [a-z] tokens must drop out of the scored set on
    BOTH engines (no zero-division, no phantom rows)."""
    return _docs_dir(
        tmp_path_factory,
        "dsir_tokenless",
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["the quick fox", "12345 !!!", "", "palabra uno dos"],
            "lang": ["en", "es", "fr", "es"],
            "source": ["s1", "s2", "s2", "s3"],
        },
    )


def test_dsir_empty_target_slice(spark, no_target_dir):
    rows = _agree(spark, no_target_dir, dsir_importance_weights,
                  "dsir_importance_weights")
    assert len(rows) == 3  # every raw doc still scored


def test_dsir_tokenless_docs_drop_out(spark, tokenless_dir):
    got = dsir_importance_weights(spark, tokenless_dir)
    ids = {r.doc_id for r in got.collect()}
    assert ids == {4}, ids  # only the tokenized raw doc survives
    _agree(spark, tokenless_dir, dsir_importance_weights,
           "dsir_importance_weights")


def test_dsir_topk_quota_respected(spark, tokenless_dir):
    rows = _agree(spark, tokenless_dir, dsir_select_topk, "dsir_select_topk")
    assert len(rows) == 1


def test_temperature_single_source(spark, tmp_path_factory):
    """One source owns the corpus: p=1, sqrt(1)=1 exactly — the FLOOR
    boundary case that is exact-representable on both engines — and the
    normalized share must be the full 1e6 ppm."""
    d = _docs_dir(
        tmp_path_factory,
        "temp_single",
        {
            "doc_id": [1, 2],
            "text": ["a b", "c d"],
            "lang": ["en", "en"],
            "source": ["only", "only"],
        },
    )
    rows = _agree(spark, d, source_temperature_sample,
                  "source_temperature_sample")
    (row,) = rows
    # sorted column order: expected_docs_milli, n_docs, samp_ppm, source, w_micro
    assert row[2] == "1000000" and row[4] == "1000000"


def test_gini_single_token_source(spark, tmp_path_factory):
    """A source whose corpus is one token repeated: diversity exactly 0;
    a uniform two-token source: 1 - 2*(1/2)^2 = 0.5 exactly."""
    d = _docs_dir(
        tmp_path_factory,
        "gini_edge",
        {
            "doc_id": [1, 2],
            "text": ["spam spam spam spam", "alpha beta"],
            "lang": ["en", "en"],
            "source": ["loop", "flat"],
        },
    )
    rows = _agree(spark, d, lexical_diversity_gini, "lexical_diversity_gini")
    by_src = {r[2]: r for r in rows}
    # sorted columns: distinct_tokens, gini_simpson_ppm, source, total_tokens, ttr_ppm
    assert by_src["loop"][1] == "0"
    assert by_src["flat"][1] == "500000"


@given(
    a=st.integers(min_value=0, max_value=10**15),
    b=st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=200, deadline=None)
def test_truncating_div_equals_floor_on_positives(a, b):
    """DuckDB '//' equals Python floor-division for non-negative operands
    (the oracle half of the round's integer-division contract; the Spark
    DIV half is pinned by test_spark_div_matches_floor_grid below)."""
    con = duckdb.connect()
    duck = con.execute(f"SELECT {a} // {b}").fetchone()[0]
    assert duck == a // b == math.floor(a / b) if a < 2**52 else duck == a // b


def test_spark_div_matches_floor_grid(spark):
    """The Spark leg: `a DIV b` equals Python floor-division across a
    grid that covers the pipelines' ranges and the double-precision cliff
    (2^52), including b=1 and a=0 edges — completing the three-engine
    contract the dsir/temperature/gini integer arithmetic relies on."""
    cases = [
        (0, 1), (1, 1), (7, 3), (10**6, 7), (10**12, 999983),
        (2**52 - 1, 3), (2**52 + 1, 3), (10**15, 10**9),
        (999999999999999, 1), (123456789012345, 987654321),
    ]
    df = spark.createDataFrame(cases, "a long, b long").selectExpr(
        "a", "b", "a DIV b AS d"
    )
    for r in df.collect():
        assert r.d == r.a // r.b, (r.a, r.b, r.d)


@given(n=st.integers(min_value=1, max_value=10**9),
       total=st.integers(min_value=1, max_value=10**9))
@settings(max_examples=200, deadline=None)
def test_sqrt_micro_quantization_cross_engine(n, total):
    """FLOOR(sqrt(n/N)*1e6) computed by DuckDB equals the same expression
    in python/libm for arbitrary count pairs — sqrt is IEEE
    correctly-rounded, so the quantized weight can never disagree."""
    if n > total:
        n, total = total, n
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT CAST(FLOOR(sqrt(CAST({n} AS DOUBLE) / CAST({total} AS DOUBLE))"
        f" * 1000000) AS BIGINT)"
    ).fetchone()[0]
    py = math.floor(math.sqrt(n / total) * 1_000_000)
    assert duck == py


def test_vocab_typo_pairs_crafted_corpus(spark, tmp_path_factory):
    """The generated fixtures contain NO edit-distance-1 word pairs, so the
    registry comparison for vocab_typo_pairs is vacuously green (0 vs 0).
    This crafted corpus exercises every branch non-vacuously: substitution
    (hello/hallo), deletion/insertion (world/worlds, splice/slice), a
    distance-2 neighborhood collision that MUST be filtered (maple/marls
    shares no pair; abcde/azcye never collides; crafted 'abcde'/'abzde'
    covers substitution at an interior position), and words below the
    length gate that must not pair."""
    from serverless_mapreduce_spark.operators.nlp import vocab_typo_pairs

    d = _docs_dir(
        tmp_path_factory,
        "typo_corpus",
        {
            "doc_id": [1, 2],
            "text": [
                "hello hallo world worlds splice",
                "slice abcde abzde abed abc",
            ],
            "lang": ["en", "en"],
            "source": ["s1", "s1"],
        },
    )
    rows = _agree(spark, d, vocab_typo_pairs, "vocab_typo_pairs")
    got = {(r[1], r[2]) for r in rows}  # sorted cols: dist, word_a, word_b
    assert ("hallo", "hello") in got
    assert ("world", "worlds") in got
    assert ("slice", "splice") in got
    assert ("abcde", "abzde") in got
    # short words (abc, abed<5? 'abed' len 4) never enter the neighborhood
    assert all(len(a) >= 5 and len(b) >= 5 for a, b in got)


def test_vocab_typo_pairs_rejects_distance_two(spark, tmp_path_factory):
    """Neighborhood collisions at distance 2 (same-position deletions from
    different words, e.g. 'abcxe' vs 'abcye' collide on 'abce' but also
    truly ARE distance 1 — use 'axcde' vs 'aycdf' which shares no single
    deletion; and 'abcde' vs 'bcdea' (rotation, distance 2) which can
    collide via end deletions) must be filtered by the exact verify."""
    from serverless_mapreduce_spark.operators.nlp import vocab_typo_pairs

    d = _docs_dir(
        tmp_path_factory,
        "typo_dist2",
        {
            "doc_id": [1],
            "text": ["abcdx abcdy wxyzaa wxyzbb"],
            "lang": ["en"],
            "source": ["s1"],
        },
    )
    rows = _agree(spark, d, vocab_typo_pairs, "vocab_typo_pairs")
    got = {(r[1], r[2]) for r in rows}
    assert ("abcdx", "abcdy") in got  # genuine substitution pair survives
    # wxyzaa vs wxyzbb is distance 2: blocked candidates (if any) must die
    assert ("wxyzaa", "wxyzbb") not in got
