"""Edge cases surfaced by review: blank-document oracle parity for the
minhash-family dedup operators, the media decoders' malformed-input error
contract, and scratch-path collision safety for same-basename fixture dirs."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from serverless_mapreduce_spark import registry
from serverless_mapreduce_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from serverless_mapreduce_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)
from serverless_mapreduce_spark.paths import sf_tag

DOCS = {
    "doc_id": [0, 10, 20, 30, 40],
    "text": [
        "",  # token-less: must pair with NOTHING, not with doc 10
        "   ",
        "the cat sat on the mat today fine",
        "the cat sat on the mat today fine",
        "totally different words here now",
    ],
}


@pytest.fixture(scope="module")
def blank_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blankdocs")
    pd.DataFrame(DOCS).to_parquet(d / "documents.parquet")
    return str(d)


def _oracle_pairs(blank_dir: str, name: str) -> set[tuple[int, int]]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{blank_dir}/documents.parquet'"
    )
    return {(a, b) for a, b, _ in con.execute(registry.all_oracles()[name]).fetchall()}


@pytest.mark.parametrize(
    "fn,name",
    [(dedup_minhash_lsh, "dedup_minhash_lsh"), (dedup_ngram_jaccard, "dedup_ngram_jaccard")],
)
def test_blank_docs_never_pair(spark, blank_dir, fn, name):
    """Two token-less docs must not be reported as near-duplicates, and the
    Spark result must agree with the DuckDB oracle on a corpus containing
    them (regression: the oracle used to give blank docs a real '' shingle
    while the Arrow pass dropped them)."""
    got = {(r.doc_a, r.doc_b) for r in fn(spark, blank_dir).collect()}
    assert got == _oracle_pairs(blank_dir, name) == {(20, 30)}


# --- decoder error contract ----------------------------------------------------

def test_decode_bmp_truncated_header():
    with pytest.raises(ValueError, match="truncated BMP header"):
        decode_bmp(b"BM\x00")


def test_decode_bmp_truncated_pixels():
    blob = encode_bmp(b"x" * 300, width=10)
    with pytest.raises(ValueError, match="truncated BMP pixel data"):
        decode_bmp(blob[:-20])


def test_decode_bmp_top_down_negative_height():
    """A top-down BMP (negative biHeight) decodes as |height| rows in stored
    order — same checksum, no silent empty result."""
    import struct

    blob = bytearray(encode_bmp(b"abcdef" * 20, width=5))
    (height,) = struct.unpack_from("<i", blob, 22)
    struct.pack_into("<i", blob, 22, -height)
    up = decode_bmp(encode_bmp(b"abcdef" * 20, width=5))
    down = decode_bmp(bytes(blob))
    assert down == up and down["height"] == height


def test_decode_wav_truncated():
    blob = encode_wav(b"y" * 100, sample_rate=8000)
    with pytest.raises(ValueError, match="truncated WAV"):
        decode_wav(blob[:-5])
    with pytest.raises(ValueError, match="truncated WAV header"):
        decode_wav(b"RIFF")


# --- scratch-path collision safety ---------------------------------------------

def test_sf_tag_distinguishes_same_basename(tmp_path):
    a = tmp_path / "a" / "sf0.01"
    b = tmp_path / "b" / "sf0.01"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    assert sf_tag(str(a)) != sf_tag(str(b))
    assert sf_tag(str(a)) == sf_tag(str(a) + "/")  # trailing slash stable


# --- approximate distinct: HLL estimate stays inside its error bound ------------

def test_approx_distinct_within_rsd(spark, sf_dir):
    """approx_distinct_users has no DuckDB oracle (different HLL impls give
    legitimately different estimates); this is its accuracy gate: every
    group's estimate must land within 5x the configured rsd (1%) of the
    exact distinct count — generous enough to never flake, tight enough to
    catch a wired-wrong column or sketch."""
    from serverless_mapreduce_spark.registry import all_queries

    approx = {
        r["event_type"]: r["approx_users"]
        for r in all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    }
    import duckdb

    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) "
            f"FROM '{sf_dir}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for et, est in approx.items():
        assert abs(est - exact[et]) <= max(1, 0.05 * exact[et]), (
            f"{et}: estimate {est} vs exact {exact[et]}"
        )
