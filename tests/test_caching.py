"""Query-scoped cache bookkeeping: persisted intermediates must not
accumulate across registered-query invocations (caching.py contract)."""

from __future__ import annotations

from serverless_mapreduce_spark.caching import release_cached


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_caches_do_not_accumulate_across_queries(spark, sf_dir):
    import __spark_entry__ as entry

    qs = entry.queries()
    names = ("dedup_minhash_lsh", "dedup_ngram_jaccard")
    # warm pass: builds any SESSION-LIFETIME artifacts (the memoized
    # verified-pair checkpoint, r12) exactly once — those are deliberately
    # not release_cached-scoped and form the baseline below
    for name in names:
        qs[name](spark, sf_dir).count()
    release_cached()
    base = _n_cached(spark)
    # per-query TRACKED intermediates must not accumulate: invoking
    # queries back-to-back (a bench loop) holds at most the current
    # query's caches above the baseline, and an explicit release returns
    # exactly to it — re-invocations never grow the session artifacts
    for _ in range(2):
        for name in names:
            qs[name](spark, sf_dir).count()
            assert _n_cached(spark) <= base + 1
    assert release_cached() >= 1
    assert _n_cached(spark) == base
