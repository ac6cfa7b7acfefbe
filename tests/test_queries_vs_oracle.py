"""The correctness gate, locally: every registered query with an oracle is
compared against DuckDB at sf0.001 (fast) — the driver repeats this at
sf0.01. Queries without an oracle get a rows-materialize smoke check."""

from __future__ import annotations

import pytest

from serverless_mapreduce_spark.registry import all_oracles, all_queries
from tests.oracle import assert_matches_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        n = assert_matches_oracle(df, ORACLES[name], sf_dir)
    else:
        n = df.count()
    assert n >= 0


def test_every_query_has_oracle():
    # every registered query carries a DuckDB oracle. The two historical
    # holdouts now register deterministic contracts instead of raw output:
    # ann_ivf_kmeans_topk hashes its (q_id, rnk) shape (neighbor quality
    # gated in test_ivf_recall.py), approx_distinct_users hashes the
    # within-error-bound boolean (estimates gated in test_edge_cases.py).
    no_oracle = set(QUERIES) - set(ORACLES)
    assert not no_oracle, f"queries missing oracles: {no_oracle}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 1
    assert set(e.oracle_sql()) <= set(e.queries())
