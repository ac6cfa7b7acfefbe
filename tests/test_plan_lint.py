"""Plan lint: no registered batch query may compile to a scale-killer plan.

The correctness gate proves the right ROWS; this locks the right SHAPE. A
CartesianProduct (both sides shuffled to one partition, O(N·M) compare) or
an unintended BroadcastNestedLoopJoin would pass every sf0.01 value check
and then melt down at 100 TB — exactly the class of regression a value
oracle can't see. Plans are only CONSTRUCTED here (no execution), so the
whole registry lints in seconds.
"""

from __future__ import annotations

import pytest

from serverless_mapreduce_spark import registry

# Queries whose *construction* executes driver-side work (sink writes,
# stream drains, bucketed-table writes, KMeans training) — linted by their
# own dedicated tests instead of re-running that work here.
SIDE_EFFECTING = {
    "stream_windowed_sum",
    "stream_sliding_counts",
    "stream_word_count",
    "session_window_agg",
    "stream_stateful_user_stats",
    "stream_stream_join",
    "stream_file_sink",
    "sink_roundtrip",
    "sink_roundtrip_json",
    "csv_scan",
    "sink_partitioned_pruned",
    "join_bucketed_colocated",
    "ann_ivf_kmeans_topk",
    "kv_jdbc_roundtrip",
    "sink_overwrite_partition_dynamic",
    "stream_kv_jdbc_sink",
    "stream_snapshot_ingest",
    "stream_dedup_ingest",
    "stream_agg_materialized",
    "export_training_shards",
    "snapshot_vacuum_retention",
    # construction executes the triangle join + degree scalars driver-side
    # (one-row profile); its heavy sub-plan is the SAME oriented 3-way
    # join graph_triangles keeps under lint coverage
    "graph_metrics_summary",
}

# BroadcastNestedLoopJoin is legitimate ONLY where the broadcast side is a
# deliberately tiny set crossed against the corpus: the brute-force ANN
# baseline (every query × every vector is the SPEC) and the IVF centroid
# assignment (corpus × ~constant centroid table). Anywhere else it means a
# join lost its equi-condition.
BNLJ_ALLOWED = {
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    # same IVF centroid assignment (corpus × ~constant sampled-centroid
    # table); the prune/vote stages themselves are equi-joins on the
    # cluster id
    "semdedup_prune",
    "label_knn_disagreement",
    # embed the bruteforce baseline as ground truth — the BNLJ is that
    # sub-plan's deliberate query-set × corpus cross
    "ann_recall_at_k_eval",
    "eval_matryoshka_truncation",
    # the 64 KiB bloom bitmap ships as a 1-row broadcast crossed into the
    # probe side (constant × corpus — the runtime-filter shape); the
    # wave-5 plan-shape test additionally asserts the LeftSemi that
    # removes false positives is a real equi-join
    "bloom_prefilter_join",
    # the 1-row corpus-statistics frame (N, avgdl, per-term df) broadcast-
    # crossed into the scored side — constant × corpus, the bloom shape
    "bm25_search_topk",
    # inherits bm25_search_topk's allowed 1-row-statistics cross through
    # the embedded ranker sub-plan; the fusion itself is one full-outer
    # EQUI-join of two ≤top-k result lists (result-list-sized, never
    # corpus-touching)
    "hybrid_search_rrf",
    # the 4-row query token group broadcast against the token-vector
    # corpus — the bruteforce-anchor constant × corpus shape
    "ann_maxsim_topk",
    # embeds the exact-L2 bruteforce baseline as ground truth (same shape
    # as ann_recall_at_k_eval): constant query set × corpus; the ADC side
    # under comparison is pure equi-joins over (m, code)
    "eval_pq_adc_recall",
    # the semdedup_prune IVF-assignment shape twice over (standing corpus
    # and probe batches each × the ~constant frozen-codebook broadcast);
    # the index probe itself is an equi-join on the centroid
    "ann_persistent_ivf",
    # three deliberate ~constant-side crosses: the 3-row nprobe frame ×
    # the query set (range join on crank), queries × codebook for cell
    # ranks, and the embedded bruteforce truth (ann_recall_at_k_eval
    # shape); the candidate retrieval itself is an equi-join on the cell
    "eval_ann_nprobe_sweep",
    # the ann_persistent_ivf coarse-assignment shape (corpus × ~constant
    # centroid broadcast); the ADC probe itself is pure equi-joins on
    # (m, code, centroid) against the code index
    "ann_persistent_ivfpq",
    # same coarse-assignment shape per streamed micro-batch and for the
    # held-out probe set (each × the ~constant frozen-codebook
    # broadcast); the serving probe itself is an equi-join on centroid
    "stream_ivf_index_maintenance",
    # inherits bm25_search_topk's (and hybrid_search_rrf's) allowed
    # 1-row-statistics crosses through the embedded ranker sub-plans;
    # the datacard itself joins ≤top-k result lists against the
    # broadcast relevance set on doc_id (equi)
    "eval_hybrid_retrieval_mrr",
    # eval_ann_nprobe_sweep's allowed crosses, scored over codes: nprobe
    # frame × queries (crank range join), queries × codebook, embedded
    # bruteforce truth; candidates + ADC are equi-joins throughout
    "eval_ann_nprobe_sweep_pq",
    # the _ivf_ranked coarse-assignment cross (corpus × ~constant
    # centroid broadcast); shortlist ADC and the exact re-rank are
    # equi-joins on (q_cent)/(m, code)/(vec_id) throughout
    "ann_ivfpq_rerank_topk",
    # the stream_ivf_index_maintenance coarse-assignment shape per batch
    # and for the held-out probes (each × the ~constant codebook
    # broadcast), plus the 1-row v0 blend cross (constant × slice); the
    # serving probe itself is an equi-join on centroid
    "stream_ivf_codebook_refresh",
}

FORBIDDEN_EVERYWHERE = ("CartesianProduct",)


def _batch_queries():
    return [
        (name, fn)
        for name, fn in registry.all_queries().items()
        if name not in SIDE_EFFECTING
    ]


@pytest.mark.parametrize("name,fn", _batch_queries(), ids=lambda p: p if isinstance(p, str) else "")
def test_no_scale_killer_operators(spark, sf_dir, name, fn):
    fn = getattr(fn, "__wrapped__", fn)
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    for op in FORBIDDEN_EVERYWHERE:
        assert op not in plan, f"{name}: plan contains {op}\n{plan}"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected BroadcastNestedLoopJoin — a join probably "
            f"lost its equi-condition\n{plan}"
        )
