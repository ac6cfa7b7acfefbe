"""Shape assertions for the round-6 operators: the specific plan properties
their docstrings promise (no joins in hash-lookup inference, broadcast of
the incoming batch, bucketed-pair reuse, Arrow-only projection passes) —
tighter than the registry-wide scale-killer lint."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from serverless_mapreduce_spark.registry import all_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    text = buf.getvalue()
    return text[text.index("== Physical Plan ==") :]


def test_quality_classifier_no_join(spark, sf_dir):
    # the weight "table" is pure hashing fused into codegen: inference is
    # a narrow map + one doc-keyed aggregation — no join operator at all
    plan = _plan(spark, sf_dir, "quality_classifier_score")
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_url_canonical_single_exchange_no_join(spark, sf_dir):
    # canonicalization is codegen'd string/regex work; the only wide op is
    # the final canonical-URL aggregation
    plan = _plan(spark, sf_dir, "dedup_url_canonical")
    assert "Join" not in plan
    exchanges = sum(1 for ln in plan.splitlines() if "- Exchange" in ln)
    assert exchanges == 1


def test_incremental_minhash_broadcasts_the_batch(spark, sf_dir):
    # the incoming batch's bands broadcast into the corpus index probe —
    # the O(batch + collisions) contract
    plan = _plan(spark, sf_dir, "dedup_incremental_minhash")
    assert "BroadcastHashJoin" in plan


def test_random_projection_no_shuffle(spark, sf_dir):
    # one Arrow pass + posexplode: pipelines with the scan, zero exchanges
    plan = _plan(spark, sf_dir, "embedding_random_projection")
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_pq_codes_no_keyed_shuffle(spark, sf_dir):
    # codebook is closure-captured into the Arrow pass — no join; the only
    # exchange is the deliberate ensure_parallelism spread (REPARTITION_BY_NUM
    # over the single-row-group fixture), never a plan-required distribution
    plan = _plan(spark, sf_dir, "embedding_pq_codes")
    assert "Join" not in plan
    assert "ArrowEvalPython" in plan
    for line in plan.splitlines():
        if "- Exchange" in line:
            assert "REPARTITION" in line, line  # no ENSURE_REQUIREMENTS


def test_item_similarity_reads_shared_pair_table(spark, sf_dir):
    # the pair table is the materialized bucketed artifact, not a fresh
    # lineitem self-join: the plan scans graph_paircounts, and the only
    # lineitem work is the item-count aggregation
    plan = _plan(spark, sf_dir, "item_similarity_jaccard_topk")
    assert "graph_paircounts" in plan
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle


def test_phash_dedup_single_exchange(spark, sf_dir):
    # decode+hash pipelines with the blob build; the only wide op is the
    # hash-keyed aggregation
    plan = _plan(spark, sf_dir, "multimodal_phash_dedup")
    assert "Join" not in plan
    exchanges = sum(1 for ln in plan.splitlines() if "- Exchange" in ln)
    assert exchanges == 1
