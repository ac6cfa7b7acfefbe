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
    """Accuracy gate for the HLL estimate itself (the registered query's
    driver oracle only hashes the within-3rsd boolean; different HLL impls
    give legitimately different estimates, so the raw estimate can't be
    oracle-hashed): every group's estimate must land within 5x the
    configured rsd (1%) of the exact distinct count — generous enough to
    never flake, tight enough to catch a wired-wrong column or sketch."""
    from serverless_mapreduce_spark.operators.analytics import (
        approx_distinct_estimates,
    )

    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_estimates(spark, sf_dir).collect()
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


# --- round-4 operators: chunking boundaries, split disjointness, pagerank ----

CHUNK_DOCS = {
    "doc_id": [0, 1, 2, 3],
    "lang": ["en", "en", "de", "de"],
    "source": ["s", "s", "s", "s"],
    "text": [
        "",                      # token-less: yields NO chunks
        "one two three",         # shorter than the window: exactly one chunk
        " ".join(f"w{i}" for i in range(64)),   # exactly one full window
        " ".join(f"w{i}" for i in range(65)),   # one token past: two chunks
    ],
}


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunkdocs")
    pd.DataFrame(CHUNK_DOCS).to_parquet(d / "documents.parquet")
    return str(d)


def test_chunking_boundaries(spark, chunk_dir):
    from serverless_mapreduce_spark.operators.text import (
        CHUNK_STRIDE,
        docs_chunk_sliding,
    )

    rows = docs_chunk_sliding(spark, chunk_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 0 not in by_doc                      # empty doc → no chunks
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_tokens == 3
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 64
    two = sorted(by_doc[3], key=lambda r: r.chunk_idx)
    assert [r.n_tokens for r in two] == [64, 65 - CHUNK_STRIDE]
    # overlap invariant: consecutive chunks start CHUNK_STRIDE tokens apart,
    # so every token of doc 3 lands in at least one chunk
    assert two[0].chunk_idx == 0 and two[1].chunk_idx == 1


def test_split_is_exhaustive_and_disjoint(spark, sf_dir):
    from serverless_mapreduce_spark.operators.text import train_val_test_split

    agg = train_val_test_split(spark, sf_dir).collect()
    n_split = sum(r.n_docs for r in agg)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # every document lands in exactly one split (disjoint + exhaustive)
    assert n_split == n_docs
    assert {r.split for r in agg} <= {"train", "val", "test"}


def test_pagerank_mass_conserved(spark, sf_dir):
    """With no dangling nodes, total rank mass stays 1 every iteration —
    a global invariant the per-row oracle comparison can't see."""
    from serverless_mapreduce_spark.operators.graph import graph_pagerank

    total = (
        graph_pagerank(spark, sf_dir)
        .agg({"pagerank": "sum"})
        .collect()[0][0]
    )
    assert abs(total - 1.0) < 1e-6


def test_triangle_count_positive_and_bounded(spark, sf_dir):
    from serverless_mapreduce_spark.operators.graph import graph_triangles

    r = graph_triangles(spark, sf_dir).collect()[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    # each triangle needs 3 distinct edges; wildly loose upper bound that
    # still catches double-counting (6x) regressions on the fixture graph
    assert 0 < r.n_triangles < r.n_edges * r.n_edges


PII_DOCS = {
    "doc_id": [0, 1, 2],
    "lang": ["en", "en", "en"],
    "source": ["s", "s", "s"],
    "text": [
        "contact alice.smith+spam@example.co.uk or call +1 (415) 555-0199 now",
        "no pii here at all",
        "two mails a@b.io c@d.org and digits 12345678",
    ],
}


def test_pii_scrub_redacts(spark, tmp_path_factory):
    from serverless_mapreduce_spark.operators.text import pii_scrub

    d = tmp_path_factory.mktemp("piidocs")
    pd.DataFrame(PII_DOCS).to_parquet(d / "documents.parquet")
    rows = {r.doc_id: r for r in pii_scrub(spark, str(d)).collect()}
    assert rows[0].n_emails == 1 and rows[0].n_phones == 1
    assert rows[1].n_emails == 0 and rows[1].n_phones == 0
    assert rows[2].n_emails == 2 and rows[2].n_phones == 1
    # scrubbed content actually changed where PII existed, not elsewhere
    import hashlib

    assert rows[1].scrubbed_md5 == hashlib.md5(
        PII_DOCS["text"][1].encode()
    ).hexdigest()
    assert rows[0].scrubbed_md5 != hashlib.md5(
        PII_DOCS["text"][0].encode()
    ).hexdigest()


def test_repetition_filter_flags_looping_text(spark, tmp_path_factory):
    from serverless_mapreduce_spark.operators.text import repetition_filter

    d = tmp_path_factory.mktemp("repdocs")
    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "text": [
                "buy now " * 30,                       # generation loop
                "a perfectly ordinary varied sentence with no repeats",
            ],
        }
    ).to_parquet(d / "documents.parquet")
    rows = {r.doc_id: r for r in repetition_filter(spark, str(d)).collect()}
    assert rows[0].flagged and rows[0].top_share > 0.4
    assert not rows[1].flagged


def test_boilerplate_chunks_detects_shared_passage(spark, tmp_path_factory):
    from serverless_mapreduce_spark.operators.text import boilerplate_chunks

    passage = " ".join(f"lic{i}" for i in range(64))  # one full license block
    d = tmp_path_factory.mktemp("bpdocs")
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "text": [
                passage + " body of the first document here",
                passage + " entirely different second body text",
                "no shared passage in this one at all " * 4,
            ],
        }
    ).to_parquet(d / "documents.parquet")
    hits = boilerplate_chunks(spark, str(d)).collect()
    # the shared 64-token block is chunk 0 of docs 0 and 1 — exactly one hit
    assert len(hits) == 1
    assert hits[0].n_docs == 2 and hits[0].n_occurrences == 2


def test_approx_quantiles_near_exact(spark, sf_dir):
    """Accuracy gate for the quantile sketch itself (the registered query
    hashes only the rank-bound booleans): each group's estimate must sit
    within 2 percentage points of rank of the exact percentile — loose
    enough to never flake at fixture sizes, tight enough to catch a
    swapped column or a broken accuracy knob."""
    from pyspark.sql import functions as F

    from serverless_mapreduce_spark.catalog import table
    from serverless_mapreduce_spark.operators.analytics import (
        approx_quantile_estimates,
    )

    est = {r.event_type: r for r in approx_quantile_estimates(spark, sf_dir).collect()}
    exact = {
        r.event_type: r
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("e50"),
            F.expr("percentile(value, 0.95)").alias("e95"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    for et, e in exact.items():
        a = est[et]
        ranks = (
            table(spark, sf_dir, "events")
            .filter(F.col("event_type") == et)
            .agg(
                F.sum(F.when(F.col("value") <= a.q50, 1).otherwise(0)).alias("r50"),
                F.sum(F.when(F.col("value") <= a.q95, 1).otherwise(0)).alias("r95"),
            )
            .collect()[0]
        )
        assert abs(ranks.r50 / e.n - 0.5) <= 0.02, (et, ranks.r50, e.n)
        assert abs(ranks.r95 / e.n - 0.95) <= 0.02, (et, ranks.r95, e.n)


def test_hll_sketch_merge_near_exact(spark, sf_dir):
    """Accuracy gate for the MERGED per-day sketches (the registered
    hll_sketch_rollup hashes only the bound boolean): the union of daily
    sketches must estimate each group within 5x the configured relative
    error — a mis-keyed or double-counted merge lands far outside."""
    from pyspark.sql import functions as F

    from serverless_mapreduce_spark.catalog import table
    from serverless_mapreduce_spark.operators.analytics import HLL_ROLLUP_LGK

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_ROLLUP_LGK)).alias("sketch")
    )
    merged = {
        r.event_type: r.est
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
        .collect()
    }
    exact = {
        r.event_type: r.ex
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("ex"))
        .collect()
    }
    err = 5 * 1.04 / (2 ** (HLL_ROLLUP_LGK / 2))
    for et, ex in exact.items():
        assert abs(merged[et] - ex) / ex <= err, (et, merged[et], ex)


def test_bucket_search_matches_linear_scan(spark):
    """The balanced binary-search bucket tree must equal the linear
    |{b : v > b}| count on boundary hits, duplicates, extremes, and NULL
    (which lands in bucket 0, the chained-when fall-through)."""
    from pyspark.sql import functions as F

    from serverless_mapreduce_spark.operators.relational import _bucket_search

    bounds = [1.0, 2.5, 2.5, 4.0, 7.5, 9.0, 12.0]
    vals = [None, -5.0, 1.0, 1.5, 2.5, 3.0, 4.0, 7.5, 8.0, 9.0, 11.0, 12.0, 99.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {
        r["value"]: r["b"]
        for r in df.select(
            "value", _bucket_search(F.col("value"), bounds).alias("b")
        ).collect()
    }
    for v in vals:
        expect = 0 if v is None else sum(1 for b in bounds if v > b)
        assert got[v] == expect, (v, got[v], expect)


# --- augmentation ops on an empty-text document ---------------------------------

def test_augment_ops_agree_with_oracle_on_empty_text(
    spark, tmp_path_factory
):
    """An empty-text document yields a zero-height BMP / zero-sample WAV;
    Spark emits the zero row and the oracle's UNION ALL zero-branch must
    produce the identical row (the review-fix branch that is latent on
    the fixture, exercised here on a crafted corpus)."""
    import pandas as pd

    from serverless_mapreduce_spark import registry
    from serverless_mapreduce_spark.operators.multimodal import (
        multimodal_audio_downsample,
        multimodal_augment_flip,
    )

    d = tmp_path_factory.mktemp("emptydocs")
    pd.DataFrame(
        {
            "doc_id": [2, 4, 3, 5],
            "text": ["", "abcdefgh" * 5, "", "xyz" * 20],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0, 40, 0, 60],
        }
    ).to_parquet(d / "documents.parquet")
    sf = str(d)

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    for fn, name in (
        (multimodal_augment_flip, "multimodal_augment_flip"),
        (multimodal_audio_downsample, "multimodal_audio_downsample"),
    ):
        got = sorted(tuple(r) for r in fn(spark, sf).collect())
        exp = sorted(
            tuple(r) for r in con.execute(registry.all_oracles()[name]).fetchall()
        )
        assert got == exp, name
        # the empty doc is PRESENT with zeroed metrics, not dropped
        ids = {t[0] for t in got}
        assert (2 in ids) if name.endswith("flip") else (3 in ids)


def test_time_ops_agree_with_oracle_on_degenerate_events(
    spark, tmp_path_factory
):
    """Crafted events with (a) a user whose events all share one
    timestamp (zero total hold — the DuckDB NaN-crash case TWAP's
    sd > 0 guard fixed) and (b) a same-instant click+purchase tie (the
    strictly-before attribution rule): Spark and the DuckDB oracle must
    agree on the full result for all three operators."""
    import duckdb
    import pandas as pd

    from serverless_mapreduce_spark import registry
    from serverless_mapreduce_spark.operators.analytics import (
        attribution_last_touch,
        attribution_linear_touch,
        time_weighted_avg_user,
    )

    d = tmp_path_factory.mktemp("degenevents")
    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",  # u1 click (tie with purchase)
            "2024-01-01 00:00:00",  # u1 purchase same instant -> direct
            "2024-01-01 05:00:00",  # u1 purchase 5h later -> click
            "2024-01-02 00:00:00",  # u2: all same instant (zero hold)
            "2024-01-02 00:00:00",
            "2024-01-03 00:00:00",  # u3 normal series
            "2024-01-03 01:00:00",
        ]
    )
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6, 7],
            "ts": ts,
            "user_id": [1, 1, 1, 2, 2, 3, 3],
            "event_type": [
                "click",
                "purchase",
                "purchase",
                "view",
                "view",
                "view",
                "view",
            ],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
        }
    ).to_parquet(d / "events.parquet")
    sf = str(d)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    for fn, name in (
        (time_weighted_avg_user, "time_weighted_avg_user"),
        (attribution_last_touch, "attribution_last_touch"),
        (attribution_linear_touch, "attribution_linear_touch"),
    ):
        got = sorted(tuple(str(c) for c in r) for r in fn(spark, sf).collect())
        exp = sorted(
            tuple(str(c) for c in r)
            for r in con.execute(registry.all_oracles()[name]).fetchall()
        )
        assert got == exp, name
    # semantic spot checks: zero-hold user absent from TWAP; the tied
    # purchase is 'direct' in last-touch
    twap_users = {
        r["user_id"] for r in time_weighted_avg_user(spark, sf).collect()
    }
    assert 2 not in twap_users and 3 in twap_users
    last = {
        (r["user_id"], r["channel"]): r["n_purchases"]
        for r in attribution_last_touch(spark, sf).collect()
    }
    assert last == {(1, "direct"): 1, (1, "click"): 1}


def test_ewma_agrees_with_oracle_on_negative_spend(spark, tmp_path_factory):
    """Refund days (negative totalprice) hit the Python-floors-vs-
    DuckDB-truncates divergence the _tdiv2 fix closed: both engines must
    produce identical EWMA series on a corpus with negative cents."""
    import duckdb
    import pandas as pd

    from serverless_mapreduce_spark import registry
    from serverless_mapreduce_spark.operators.analytics import ewma_user_spend

    d = tmp_path_factory.mktemp("refundorders")
    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_custkey": [10, 10, 10, 11, 11],
            "o_orderstatus": ["F"] * 5,
            # day2 is a net refund; odd cents force the floor/trunc split
            "o_totalprice": [100.37, -55.11, 20.01, -10.03, -70.99],
            # micros, not pandas' default nanos: only events.ts gets the
            # nanos normalization (catalog._to_ntz); orders must match the
            # fixture's TIMESTAMP(MICROS) encoding
            "o_orderdate": pd.to_datetime(
                [
                    "2024-01-01",
                    "2024-01-02",
                    "2024-01-03",
                    "2024-01-01",
                    "2024-01-02",
                ]
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 5,
        }
    ).to_parquet(d / "orders.parquet")
    sf = str(d)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    got = sorted(
        tuple(str(c) for c in r)
        for r in ewma_user_spend(spark, sf).collect()
    )
    exp = sorted(
        tuple(str(c) for c in r)
        for r in con.execute(
            registry.all_oracles()["ewma_user_spend"]
        ).fetchall()
    )
    assert got == exp
    # the running value actually goes negative (the case under test)
    assert any(int(t[3]) < 0 for t in got)


def test_session_path_agrees_with_oracle_on_null_event_type(
    spark, tmp_path_factory
):
    """A NULL event_type must void the trigrams it touches in BOTH
    engines (the concat_ws null-skip bug emitted malformed 2-part paths
    the '||' oracle never saw — fixed to null-propagating concat)."""
    import duckdb
    import pandas as pd

    from serverless_mapreduce_spark import registry
    from serverless_mapreduce_spark.operators.analytics import (
        session_path_topk,
    )

    d = tmp_path_factory.mktemp("nulltype")
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6, 7],
            "ts": pd.to_datetime(
                ["2024-01-01 00:%02d:00" % m for m in range(7)]
            ),
            "user_id": [1] * 7,
            "event_type": [
                "view",
                None,
                "click",
                "view",
                "click",
                "purchase",
                "view",
            ],
            "value": [1.0] * 7,
        }
    ).to_parquet(d / "events.parquet")
    sf = str(d)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    got = sorted(
        tuple(str(c) for c in r)
        for r in session_path_topk(spark, sf).collect()
    )
    exp = sorted(
        tuple(str(c) for c in r)
        for r in con.execute(
            registry.all_oracles()["session_path_topk"]
        ).fetchall()
    )
    assert got == exp
    # no malformed 2-part path ever appears
    assert all(t[0].count(">") == 2 for t in got)
