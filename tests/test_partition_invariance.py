"""Partition-count invariance: the registry's exactness contracts (decimal
sums, integer cross-multiplication, md5 hashing) promise BIT-IDENTICAL
results under ANY partitioning — the property that makes driver hash
comparison meaningful on a real cluster. Run value-sensitive queries under
3 vs 32 shuffle partitions and require exact row-set equality."""

from __future__ import annotations

import pytest

from serverless_mapreduce_spark.registry import all_queries

# one representative per exactness mechanism: decimal aggregate (q1),
# decimal moments (zscore), mergeable sketch cells (hll), LM join counts
# (trigram score), common-denominator statistic (ks), float-ratio rounding
# (quality_score), window quintiles with tiebreaks (rfm)
CASES = (
    "tpch_q1",
    "zscore_outliers",
    "hll_sketch_rollup",
    "trigram_lm_score",
    "ks_drift_clicks_purchases",
    "quality_score",
    "rfm_segments",
    # round-6 mechanisms: exact integer milli-unit sum (classifier),
    # md5-rank window selection with membership hash (rebalance)
    "quality_classifier_score",
    "label_rebalance_undersample",
    # wave-5 mechanisms: double arithmetic over exact decimal sufficient
    # statistics (corr), integer cross-multiplied residual gate
    # (seasonal), partition-level recurrence over a keyed sort (ewma),
    # hold-duration weighting with floor quotient (twap)
    "corr_matrix_lineitem",
    "seasonal_residual_outliers",
    "ewma_user_spend",
    "time_weighted_avg_user",
    # round-7 mechanisms: integer ppm likelihood-ratio sums from
    # truncating integer division (dsir), FLOOR-quantized
    # correctly-rounded sqrt feeding integer-only shares (temperature)
    "dsir_importance_weights",
    "source_temperature_sample",
    # round-8 mechanisms: rounded-cosine threshold + one-sided cap over
    # the memoized checkpointed IVF assignment (semdedup — the _IVF_MEMO
    # shuffle-partitions key keeps this test meaningful, the ADVICE-r7
    # walk-memo lesson), exploded threshold-grid equi-aggregate (sweep),
    # inverted-index document frequencies (novelty), fixed-round
    # oscillation-exact label propagation feeding truncating negative
    # division (modularity)
    "semdedup_prune",
    "quality_filter_sweep",
    "ngram_novelty_score",
    "graph_modularity_report",
)


def _rows(spark, name, sf_dir, parts):
    ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", str(parts))
    df = all_queries()[name](ss, sf_dir)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_partition_count_invariance(spark, sf_dir, name):
    a = _rows(spark, name, sf_dir, 3)
    b = _rows(spark, name, sf_dir, 32)
    assert a == b, f"{name}: result depends on shuffle partition count"
