"""Query-scoped cache bookkeeping: persisted intermediates must not
accumulate across registered-query invocations (caching.py contract)."""

from __future__ import annotations

from serverless_mapreduce_spark.caching import release_cached


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_caches_do_not_accumulate_across_queries(spark, sf_dir):
    import __spark_entry__ as entry

    qs = entry.queries()
    release_cached()
    # dedup_minhash_lsh and dedup_ngram_jaccard each persist one
    # intermediate; invoking queries back-to-back (a bench loop) must hold
    # at most the current query's caches, and an explicit release drops all.
    for _ in range(2):
        for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard"):
            qs[name](spark, sf_dir).count()
            assert _n_cached(spark) <= 1
    assert release_cached() >= 1
    assert _n_cached(spark) == 0
