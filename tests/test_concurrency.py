"""Concurrent query execution: Spark supports multi-threaded job submission
and ``engine.Engine`` invites it, so two registered queries running on
different threads must not interfere — specifically, the registry wrapper's
on-entry ``release_cached()`` must only release the *calling* thread's
tracked caches (caching.py is thread-local), never a cache another thread's
in-flight plan still depends on."""

from __future__ import annotations

import threading

from serverless_mapreduce_spark.engine import Engine
from serverless_mapreduce_spark.operators.dedup import dedup_minhash_lsh
from serverless_mapreduce_spark.operators.similarity import ann_lsh_topk

from tests.oracle import assert_matches_oracle
from serverless_mapreduce_spark import registry


def test_concurrent_cached_queries_dont_release_each_other(spark, sf_dir):
    """Both queries persist_tracked intermediates (minhash signatures, LSH
    buckets). Run them simultaneously on two threads several times; with
    process-global tracking, thread B's wrapper would unpersist A's live
    signature cache mid-plan (recompute storm at best, flaky failure at
    worst). Results must still match the oracle on both threads."""
    oracles = registry.all_oracles()
    errors: list[BaseException] = []

    def run(fn, name):
        try:
            for _ in range(2):
                assert_matches_oracle(fn(spark, sf_dir), oracles[name], sf_dir)
        except BaseException as exc:  # noqa: BLE001 — surfaced below
            errors.append(exc)

    threads = [
        threading.Thread(target=run, args=(dedup_minhash_lsh, "dedup_minhash_lsh")),
        threading.Thread(target=run, args=(ann_lsh_topk, "ann_lsh_topk")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_engine_concurrent_runs(spark, sf_dir):
    """Engine.run from two threads: both records SUCCEED with row counts."""
    eng = Engine(spark, sf_dir)
    errors: list[BaseException] = []

    def run(name):
        try:
            eng.run(name)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=run, args=("q1_filter_scan",)),
        threading.Thread(target=run, args=("word_count",)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    status = eng.status()
    assert status["q1_filter_scan"][-1]["status"] == "SUCCEEDED"
    assert status["word_count"][-1]["status"] == "SUCCEEDED"
    assert (status["q1_filter_scan"][-1]["rows"] or 0) > 0
