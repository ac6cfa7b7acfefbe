"""Hot-band skew guard (round 11, VERDICT r10 item 7): a band bucket
over BAND_CAP members expands to a star through its hub instead of
C(n,2) pairs — both engines compute the SAME capped semantics (the cap
lives in the shared cand derivation), pair counts stay O(n), and the
downstream cluster decision is unchanged because the star preserves
connectivity."""

from __future__ import annotations

from oracle import agree_rows, crafted_dir

from serverless_mapreduce_spark.operators.dedup import (
    BAND_CAP,
    dedup_cluster,
    dedup_minhash_lsh,
)


def _docs(n_dups: int):
    """n_dups identical documents (every band hot once n_dups > BAND_CAP)
    plus two unrelated docs and one near-identical cold pair."""
    boiler = (
        "cookie policy terms of service all rights reserved contact us "
        "privacy statement subscribe newsletter follow us on social media"
    )
    rows = [
        {"doc_id": i, "text": boiler, "lang": "en", "source": "cc"}
        for i in range(1, n_dups + 1)
    ]
    rows += [
        {
            "doc_id": 9001,
            "text": "completely different text about spark partitioning "
            "strategies and shuffle economics at scale",
            "lang": "en",
            "source": "web",
        },
        {
            "doc_id": 9002,
            "text": "yet another unrelated document mentioning snapshot "
            "tables manifests and retention vacuums",
            "lang": "en",
            "source": "web",
        },
        # a COLD near-dup pair: stays on the pairwise path
        {
            "doc_id": 9101,
            "text": "the quick brown fox jumps over the lazy dog near a "
            "river bank while birds watch quietly from above",
            "lang": "en",
            "source": "web",
        },
        {
            "doc_id": 9102,
            "text": "the quick brown fox jumps over the lazy dog near a "
            "river bank while birds watch quietly from afar",
            "lang": "en",
            "source": "web",
        },
    ]
    return rows


def test_mega_band_pair_count_is_linear_and_engines_agree(
    spark, tmp_path_factory
):
    n = BAND_CAP + 48  # 80 identical docs: every band is hot
    d = crafted_dir(tmp_path_factory, "hotband", _docs(n))
    got = agree_rows(
        spark, d, dedup_minhash_lsh, "dedup_minhash_lsh", as_dicts=True
    )
    dup_pairs = [r for r in got if r["doc_a"] <= n and r["doc_b"] <= n]
    # star through the hub: n-1 pairs, not C(n, 2) = 3160
    assert len(dup_pairs) == n - 1
    assert all(r["doc_a"] == 1 for r in dup_pairs)  # hub = min doc_id
    assert all(r["jaccard"] == 1.0 for r in dup_pairs)
    # the cold near-dup pair still arrives via the pairwise path
    assert any(
        r["doc_a"] == 9101 and r["doc_b"] == 9102 and r["jaccard"] < 1.0
        for r in got
    )


def test_mega_band_cluster_decision_is_unchanged(spark, tmp_path_factory):
    """The star preserves connectivity: all n duplicates still collapse
    into ONE cluster with the hub as canonical keeper — the dedup
    DECISION is identical to uncapped pairwise expansion."""
    n = BAND_CAP + 18
    d = crafted_dir(tmp_path_factory, "hotbandcc", _docs(n))
    got = agree_rows(spark, d, dedup_cluster, "dedup_cluster", as_dicts=True)
    dup_rows = [r for r in got if r["doc_id"] <= n]
    assert len(dup_rows) == n
    assert all(r["canonical_id"] == 1 for r in dup_rows)
    assert all(r["cluster_size"] == n for r in dup_rows)


def test_cap_never_fires_below_threshold(spark, tmp_path_factory):
    """A band at exactly BAND_CAP members keeps full pairwise expansion —
    the guard only reshapes genuinely hot buckets."""
    n = BAND_CAP
    d = crafted_dir(tmp_path_factory, "coldband", _docs(n))
    got = agree_rows(
        spark, d, dedup_minhash_lsh, "dedup_minhash_lsh", as_dicts=True
    )
    dup_pairs = [r for r in got if r["doc_a"] <= n and r["doc_b"] <= n]
    assert len(dup_pairs) == n * (n - 1) // 2
