"""Regression tests for the dtype-faithful oracle comparison (round-7).

CORRECTNESS_r06 failed two queries whose oracles emitted uncast DuckDB
``SUM(BIGINT)`` columns: HUGEINT arrives as a Python int via ``fetchall()``
(so the old preflight passed) but becomes float64 in the driver's pandas
``.df()`` hash path while Spark emits int64 — a hash mismatch with equal
values. ``tests.oracle._check_oracle_dtypes`` now rejects that class at
preflight time; these tests pin the rejection and the fix pattern.
"""

from __future__ import annotations

import pytest

from oracle import assert_matches_oracle

SF = "/root/testdata/sf0.001"


def _one_row(spark, value_expr, alias, spark_type):
    from pyspark.sql import functions as F

    return spark.range(1).select(
        F.expr(value_expr).cast(spark_type).alias(alias)
    )


def test_uncast_sum_bigint_oracle_fails_preflight(spark):
    """An oracle emitting HUGEINT (uncast SUM of BIGINT) must be rejected
    even though its fetchall() values equal Spark's int64 values."""
    df = _one_row(spark, "42", "s", "bigint")
    oracle = "SELECT SUM(x) AS s FROM (SELECT CAST(42 AS BIGINT) AS x)"
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_matches_oracle(df, oracle, SF)


def test_cast_sum_bigint_oracle_passes(spark):
    """The mandated fix — CAST(... AS BIGINT) — makes the same query green."""
    df = _one_row(spark, "42", "s", "bigint")
    oracle = (
        "SELECT CAST(SUM(x) AS BIGINT) AS s "
        "FROM (SELECT CAST(42 AS BIGINT) AS x)"
    )
    assert assert_matches_oracle(df, oracle, SF) == 1


def test_uncast_decimal_oracle_fails_preflight(spark):
    """DECIMAL output shares the HUGEINT hazard (float64 in the driver's
    pandas path vs Spark's int64 / object-Decimal) — rejected outright."""
    df = _one_row(spark, "42", "s", "bigint")
    oracle = "SELECT CAST(SUM(x) AS DECIMAL(18,2)) * 1 AS s FROM (SELECT 42 AS x)"
    with pytest.raises(AssertionError, match="DECIMAL"):
        assert_matches_oracle(df, oracle, SF)


def test_float_oracle_vs_integer_spark_fails():
    """DuckDB DOUBLE against a Spark integer column diverges in the pandas
    path (float64 vs int64) — must be rejected regardless of values."""
    import duckdb

    from oracle import _check_oracle_dtypes

    class _FakeField:
        def __init__(self, name, dt):
            self.name, self.dataType = name, dt

    class _FakeSchema:
        def __init__(self, fields):
            self.fields = fields

    class _FakeDF:
        def __init__(self, fields):
            self.schema = _FakeSchema(fields)

    from pyspark.sql.types import DoubleType, LongType

    con = duckdb.connect()
    rel = con.sql("SELECT CAST(42 AS DOUBLE) AS v")
    with pytest.raises(AssertionError, match="dtype-divergent"):
        _check_oracle_dtypes(_FakeDF([_FakeField("v", LongType())]), rel)

    rel_int = con.sql("SELECT CAST(42 AS BIGINT) AS v")
    with pytest.raises(AssertionError, match="dtype-divergent"):
        _check_oracle_dtypes(_FakeDF([_FakeField("v", DoubleType())]), rel_int)

    # matched classes stay green
    _check_oracle_dtypes(_FakeDF([_FakeField("v", DoubleType())]), rel)
    _check_oracle_dtypes(_FakeDF([_FakeField("v", LongType())]), rel_int)


def test_fixed_round6_oracles_are_hugeint_free():
    """The two CORRECTNESS_r06 offenders now emit BIGINT columns."""
    import duckdb

    import __spark_entry__ as entry

    orc = entry.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    for name in ("time_weighted_avg_user", "eval_sample_accelerated_agg"):
        rel = con.sql(orc[name])
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() in ("HUGEINT", "UHUGEINT")
        ]
        assert not bad, f"{name} still emits HUGEINT: {bad}"
