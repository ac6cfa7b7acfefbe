"""Round-8 hardening pins (VERDICT r7 items 1 and 6): the DSIR int64
headroom guard as code (pure-function property tests + proof it is wired
into the Spark build path), the weighted-SSSP relaxation loop on the
adversarial shapes the fixture graph lacks (cheap long detour, round-cap
loud failure, unreachable nodes), and the SRC_OVERLAP_CAP load-shedding
branch of source_overlap_matrix actually FIRING on a crafted corpus — at
sf0.01 no shingle reaches more than 7 of the 20 sources, so the driver's
green row never exercises the cap filter (the vocab_typo_pairs
vacuous-green class) — with the documented bias direction pinned both
ways: downward for pairs where BOTH sources carry the dropped boilerplate,
upward where only one does.
"""

from __future__ import annotations

import heapq

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oracle import agree_rows, assert_matches_oracle, crafted_dir, duck_con
from serverless_mapreduce_spark import registry
from serverless_mapreduce_spark.operators import nlp
from serverless_mapreduce_spark.operators.dedup import (
    SRC_OVERLAP_CAP,
    source_overlap_matrix,
)
from serverless_mapreduce_spark.operators.graph import (
    SSSP_MAX_ITERS,
    _sssp_relax,
)
from serverless_mapreduce_spark.operators.nlp import (
    _DSIR_INT64_MAX,
    _dsir_int64_headroom,
)


# --- DSIR int64 headroom guard ------------------------------------------------


def test_dsir_headroom_passes_at_fixture_scale():
    # sf0.1-shaped corpus statistics: ~600k raw ngrams over 1024 buckets.
    _dsir_int64_headroom(
        ctt=120_000, crt=600_000, max_ct=900, max_cr=3_000,
        max_doc_ngrams=2_000,
    )


def test_dsir_headroom_raises_past_envelope():
    # A full-crawl shape: 5e9 raw ngrams with a 5e6-count hot bucket makes
    # the ppm numerator (max_ct+1)(crt+B)*1e6 ~ 2.5e22 >> 2^63.
    with pytest.raises(ValueError, match="DECIMAL\\(38,0\\)"):
        _dsir_int64_headroom(
            ctt=1_000_000_000, crt=5_000_000_000,
            max_ct=5_000_000, max_cr=20_000_000,
            max_doc_ngrams=100_000,
        )


def test_dsir_headroom_raises_on_long_doc_sum():
    # Totals fit comfortably, but one pathological document is long enough
    # that sum(nb * ratio_ppm) alone exceeds int64: the per-document bound
    # must trip even when the model-side products pass.
    _dsir_int64_headroom(
        ctt=1_000_000, crt=1_000, max_ct=500_000, max_cr=100,
        max_doc_ngrams=1_000,
    )
    with pytest.raises(ValueError, match="overflow int64"):
        _dsir_int64_headroom(
            ctt=1_000_000, crt=1_000, max_ct=500_000, max_cr=100,
            max_doc_ngrams=10_000_000_000_000,
        )


@settings(max_examples=200, deadline=None)
@given(
    ctt=st.integers(min_value=0, max_value=10**12),
    crt=st.integers(min_value=0, max_value=10**12),
    ct_frac=st.floats(min_value=0.0, max_value=1.0),
    cr_frac=st.floats(min_value=0.0, max_value=1.0),
    m=st.integers(min_value=0, max_value=10**9),
)
def test_dsir_headroom_monotone_shrink(ctt, crt, ct_frac, cr_frac, m):
    """If the guard accepts a corpus, it accepts every corpus with the
    same target total but smaller raw total / bucket maxima / longest
    document — shrinking the data can never newly overflow. (ctt is held
    fixed: it appears in the worst-ratio DENOMINATOR, so the bound is
    deliberately anti-monotone in it.)"""
    max_ct = int(ctt * ct_frac)
    max_cr = int(crt * cr_frac)
    try:
        _dsir_int64_headroom(ctt, crt, max_ct, max_cr, m)
    except ValueError:
        return  # only the accepted side carries the obligation
    _dsir_int64_headroom(ctt, crt // 2, max_ct // 2, max_cr // 2, m // 2)


def test_dsir_headroom_wired_into_build(spark, tmp_path, monkeypatch):
    """The guard must run inside _build_dsir_scores, not only exist:
    inflating DSIR_SCALE past the envelope makes the real build path
    raise on a 2-document corpus."""
    d = tmp_path / "dsir_guard"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["the quick brown fox", "la rapida zorra marron"],
            "lang": ["en", "es"],
            "source": ["s1", "s2"],
        }
    ).to_parquet(d / "documents.parquet")
    monkeypatch.setattr(nlp, "DSIR_SCALE", 10**19)
    with pytest.raises(ValueError, match="DECIMAL\\(38,0\\)"):
        nlp._build_dsir_scores(spark, str(d))


# --- weighted SSSP on adversarial crafted graphs ------------------------------


def _wsym(spark, edges):
    """Symmetrize an undirected weighted edge list into the (src, dst, w)
    frame _sssp_relax expects."""
    rows = [(a, b, w) for a, b, w in edges] + [
        (b, a, w) for a, b, w in edges
    ]
    return spark.createDataFrame(rows, "src long, dst long, w long")


def _dijkstra(edges, source):
    adj: dict = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_cheap_long_detour_beats_direct_edge(spark):
    """The shape Bellman-Ford exists for (and the fixture graph never
    produces): node 10 is one expensive hop from the source but ten cheap
    hops away, so a round that 'settles' it early at 100 must keep
    improving it down to 10 — reachability-fixpoint semantics would stop
    wrong. Unreachable nodes (the 99–100 island) must stay absent."""
    edges = [(i, i + 1, 1) for i in range(10)] + [(0, 10, 100), (99, 100, 7)]
    got = {
        r["node"]: r["dist"]
        for r in _sssp_relax(_wsym(spark, edges)).collect()
    }
    want = _dijkstra(edges[:-1], 0)  # source = min node = 0
    assert got == want
    assert got[10] == 10 and 99 not in got and 100 not in got


def test_sssp_round_cap_raises_not_silently_wrong(spark):
    """A 10-node weight-1 path needs 9 relaxation rounds; with the cap at
    5 the loop must RAISE — returning the unconverged table would hand a
    hash-stable but wrong distance to every downstream consumer."""
    edges = [(i, i + 1, 1) for i in range(9)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _sssp_relax(_wsym(spark, edges), max_iters=5)


def test_sssp_default_cap_covers_fixture_depths(spark):
    """The same 10-node path converges comfortably under the shipped
    SSSP_MAX_ITERS — pins that the cap stays above real relaxation
    depths while the previous test pins the loud-failure side."""
    assert SSSP_MAX_ITERS >= 15
    edges = [(i, i + 1, 1) for i in range(9)]
    got = {
        r["node"]: r["dist"]
        for r in _sssp_relax(_wsym(spark, edges)).collect()
    }
    assert got == {i: i for i in range(10)}


# --- SRC_OVERLAP_CAP: the load-shedding branch, actually firing ---------------

# Every crafted text is EXACTLY three words, so each document contributes
# exactly one shingle and the per-source shingle set is known by
# construction (no tokenizer replica in the test).
_HOT = "common boiler plate"          # present in 12 > SRC_OVERLAP_CAP sources
_SHARED_01 = "shared zero one"        # s0 ∩ s1
_SHARED_0X = "shared zero twelve"     # s0 ∩ s12 (s12 carries no hot shingle)


def _overlap_dir(tmp_path_factory):
    rows = []

    def add(source, text):
        rows.append(
            {
                "doc_id": len(rows) + 1,
                "text": text,
                "lang": "en",
                "source": source,
            }
        )

    hot_sources = [f"s{i}" for i in range(12)]
    assert len(hot_sources) > SRC_OVERLAP_CAP
    for s in hot_sources:
        add(s, _HOT)
        add(s, f"unique only {s}")
    add("s0", _SHARED_01)
    add("s1", _SHARED_01)
    add("s0", _SHARED_0X)
    add("s12", _SHARED_0X)
    add("s12", "unique only s12")
    d = tmp_path_factory.mktemp("src_overlap_cap")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d), rows


@pytest.fixture(scope="module")
def overlap_corpus(tmp_path_factory):
    return _overlap_dir(tmp_path_factory)


def _expected_matrix(rows, cap):
    """Set-math ground truth over the declared per-source shingle sets,
    with the cap applied exactly as documented: shingles in more than
    ``cap`` sources leave the universe before any share is computed."""
    sets: dict = {}
    for r in rows:
        sets.setdefault(r["source"], set()).add(r["text"])
    nsrc: dict = {}
    for s in sets.values():
        for sh in s:
            nsrc[sh] = nsrc.get(sh, 0) + 1
    capped = {
        k: {sh for sh in v if nsrc[sh] <= cap} for k, v in sets.items()
    }
    out = {}
    for a in sorted(capped):
        for b in sorted(capped):
            if a >= b:
                continue
            inter = len(capped[a] & capped[b])
            if inter == 0:
                continue
            union = len(capped[a]) + len(capped[b]) - inter
            out[(a, b)] = (inter, inter * 1_000_000 // union)
    return out


def test_src_overlap_cap_fires_and_matches_oracle(spark, overlap_corpus):
    sf_dir, rows = overlap_corpus
    got_df = source_overlap_matrix(spark, sf_dir)
    assert_matches_oracle(
        got_df, registry.all_oracles()["source_overlap_matrix"], sf_dir
    )
    got = {
        (r["src_a"], r["src_b"]): (r["shared_shingles"], r["jaccard_ppm"])
        for r in got_df.collect()
    }
    assert got == _expected_matrix(rows, SRC_OVERLAP_CAP)
    # The cap genuinely fired: without it the 12 hot sources would form
    # C(12,2)=66 pairs through the boilerplate shingle alone.
    assert ("s2", "s3") not in got
    # s0 capped = {shared01, shared0x, uniq0}, s1 capped = {shared01, uniq1}
    assert got[("s0", "s1")] == (1, 250_000)


# --- round-8 new operators: crafted corpora for branches sf fixtures miss -----


# canonical helpers live in tests/oracle.py (single comparator source)
_docs_dir = crafted_dir


def _agree(spark, sf_dir, fn, name):
    return agree_rows(spark, sf_dir, fn, name, as_dicts=True)


def test_filter_cascade_all_stages_fire(spark, tmp_path_factory):
    """At sf0.01 the cascade only ever attributes lang/gopher/kept (no
    exact duplicates, no repetition flags survive the earlier gates) — the
    repetition and exact_dup arms are vacuous there. This corpus drives
    every arm, with dual-engine parity through the shared comparator."""
    from serverless_mapreduce_spark.operators.text import filter_cascade_audit

    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "hola mundo bueno amigo casa perro gato sol luna mar",
            "the a is",
            "the cat the cat the cat the cat and dog ran over green hills today",
            "the quick brown fox jumps over a lazy dog and runs far away today",
            "the quick brown fox jumps over a lazy dog and runs far away today",
        ],
        "lang": ["es", "en", "en", "en", "en"],
        "source": ["s1", "s1", "s1", "s2", "s2"],
    }
    sf_dir = _docs_dir(tmp_path_factory, "cascade_stages", rows)
    got = _agree(spark, sf_dir, filter_cascade_audit, "filter_cascade_audit")
    stages = {
        r["stage"]: r["n_docs"]
        for r in filter_cascade_audit(spark, sf_dir).collect()
    }
    assert stages == {
        "lang": 1, "gopher": 1, "repetition": 1, "exact_dup": 1, "kept": 1
    }
    assert len(got) == 5


def test_band_eval_cap_drops_hot_buckets(spark, tmp_path_factory):
    """40 identical documents exceed BAND_EVAL_CAP in EVERY band bucket
    of every config, so none of their C(40,2) pairs may surface; the
    three near-dup docs stay under the cap and must. Parity through the
    shared comparator proves the oracle mirrors the load-shed exactly."""
    from serverless_mapreduce_spark.operators.dedup import (
        BAND_EVAL_CAP,
        minhash_band_eval,
    )

    hot = "common boiler plate text repeated across the mirrored crawl"
    near = "alpha beta gamma delta epsilon zeta eta theta"
    n_hot = BAND_EVAL_CAP + 8
    rows = {
        "doc_id": list(range(1, n_hot + 4)),
        "text": [hot] * n_hot + [near, near + " iota", near + " kappa"],
        "lang": ["en"] * (n_hot + 3),
        "source": ["s1"] * (n_hot + 3),
    }
    sf_dir = _docs_dir(tmp_path_factory, "band_eval_cap", rows)
    _agree(spark, sf_dir, minhash_band_eval, "minhash_band_eval")
    out = {
        r["rows_per_band"]: (r["n_candidates"], r["n_true"])
        for r in minhash_band_eval(spark, sf_dir).collect()
    }
    assert set(out) == {1, 2, 4, 8, 16}
    # candidates can only come from the 3 near-dups: at most C(3,2) pairs
    assert all(c <= 3 for c, _ in out.values())
    assert out[1][0] > 0  # 16 single-hash bands surely catch the near-dups


def test_band_eval_zero_candidates_guarded(spark, tmp_path_factory):
    """All-identical corpus: every bucket is hot, every pair load-shed —
    the sweep must still emit one row per config with guarded zero
    divisions, identically on both engines."""
    from serverless_mapreduce_spark.operators.dedup import minhash_band_eval

    rows = {
        "doc_id": list(range(1, 41)),
        "text": ["same exact boilerplate page body here"] * 40,
        "lang": ["en"] * 40,
        "source": ["s1"] * 40,
    }
    sf_dir = _docs_dir(tmp_path_factory, "band_eval_zero", rows)
    got = _agree(spark, sf_dir, minhash_band_eval, "minhash_band_eval")
    assert len(got) == 5
    assert all(
        r["n_candidates"] == 0 and r["precision_ppm"] == 0
        for r in minhash_band_eval(spark, sf_dir).collect()
    )


def test_perplexity_buckets_empty_heldout(spark, tmp_path_factory):
    """A corpus whose every doc_id hashes into the train split leaves the
    held-out score table EMPTY — the bucketing must return an empty
    frame with the oracle's exact schema, not divide by zero."""
    import hashlib

    from serverless_mapreduce_spark.operators.nlp import (
        LM_TRAIN_PCT,
        perplexity_prune_buckets,
    )

    train_ids = [
        i for i in range(1, 200)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        < LM_TRAIN_PCT
    ][:4]
    rows = {
        "doc_id": train_ids,
        "text": ["the quick brown fox jumps today"] * len(train_ids),
        "lang": ["en"] * len(train_ids),
        "source": ["s1"] * len(train_ids),
    }
    sf_dir = _docs_dir(tmp_path_factory, "ppl_empty", rows)
    got = _agree(spark, sf_dir, perplexity_prune_buckets,
                 "perplexity_prune_buckets")
    assert got == []


def test_perplexity_buckets_tiny_corpus(spark, tmp_path_factory):
    """Fewer held-out docs than buckets: the NTILE arithmetic must spread
    them one-per-bucket from the head, matching the oracle exactly."""
    import hashlib

    from serverless_mapreduce_spark.operators.nlp import (
        LM_TRAIN_PCT,
        perplexity_prune_buckets,
    )

    ids = list(range(1, 400))
    train = [
        i for i in ids
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        < LM_TRAIN_PCT
    ][:3]
    held = [
        i for i in ids
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        >= LM_TRAIN_PCT
    ][:2]
    rows = {
        "doc_id": train + held,
        "text": ["the quick brown fox jumps today"] * (len(train) + len(held)),
        "lang": ["en"] * (len(train) + len(held)),
        "source": ["s1"] * (len(train) + len(held)),
    }
    sf_dir = _docs_dir(tmp_path_factory, "ppl_tiny", rows)
    _agree(spark, sf_dir, perplexity_prune_buckets, "perplexity_prune_buckets")
    got = {
        r["bucket"]: r["n_docs"]
        for r in perplexity_prune_buckets(spark, sf_dir).collect()
    }
    assert got == {1: 1, 2: 1}  # 2 docs over 3 rank-thirds: buckets 1 and 2


def test_token_budget_drops_tokenless_source(spark, tmp_path_factory):
    """A source whose only document has no tokens must vanish from the
    plan on BOTH engines (the HAVING guard) — no zero division in
    epochs_milli, no phantom row."""
    from serverless_mapreduce_spark.operators.text import (
        token_budget_mixture_plan,
    )

    rows = {
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox", "lazy dog sleeps here", ""],
        "lang": ["en", "en", "en"],
        "source": ["s1", "s2", "s3"],
    }
    sf_dir = _docs_dir(tmp_path_factory, "budget_tokenless", rows)
    got = _agree(spark, sf_dir, token_budget_mixture_plan,
                 "token_budget_mixture_plan")
    srcs = {
        r["source"] for r in token_budget_mixture_plan(spark, sf_dir).collect()
    }
    assert srcs == {"s1", "s2"}
    assert len(got) == 2


def _uncapped_oracle(sf_dir):
    sql = registry.all_oracles()["source_overlap_matrix"]
    needle = f"nsrc <= {SRC_OVERLAP_CAP}"
    assert sql.count(needle) == 1
    con = duck_con(sf_dir)
    return {
        (a, b): (sh, j)
        for a, b, sh, j in con.execute(
            sql.replace(needle, "nsrc <= 1000000")
        ).fetchall()
    }


def test_src_overlap_cap_bias_direction(spark, overlap_corpus):
    """The documented bias bound, pinned in both directions against the
    uncapped matrix (same oracle SQL with the filter disarmed):

    - (s0, s1) BOTH carry the dropped boilerplate → removing a shared
      shingle shrinks intersection and union by one each, so Jaccard
      falls (the 'biases downward for boilerplate-heavy sources' note in
      the contract);
    - (s0, s12) only s0 carries it → the union alone shrinks, so the
      capped estimate is HIGHER; consumers reading the matrix as a lower
      bound must restrict that reading to boilerplate-sharing pairs."""
    sf_dir, rows = overlap_corpus
    capped = {
        (r["src_a"], r["src_b"]): r["jaccard_ppm"]
        for r in source_overlap_matrix(spark, sf_dir).collect()
    }
    uncapped = _uncapped_oracle(sf_dir)
    both_hot = ("s0", "s1")
    one_hot = ("s0", "s12")
    assert capped[both_hot] < uncapped[both_hot][1]
    assert capped[one_hot] > uncapped[one_hot][1]
    # and the general both-hot bound across the crafted matrix:
    for pair, j in capped.items():
        if pair[0] in {f"s{i}" for i in range(12)} and pair[1] in {
            f"s{i}" for i in range(12)
        }:
            assert j <= uncapped[pair][1]
