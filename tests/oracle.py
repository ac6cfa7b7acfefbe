"""Shared DuckDB-oracle comparison used by the pytest suite — the same check
the driver performs (row count + schema-insensitive, order-insensitive value
comparison at sf0.01)."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, oracle: str, sf_dir: str) -> int:
    """Order-insensitive exact comparison of a Spark result vs DuckDB SQL.
    Returns the row count."""
    con = duck_con(sf_dir)
    expected = con.execute(oracle)
    exp_cols = [d[0] for d in expected.description]
    exp_rows = expected.fetchall()

    got_cols = spark_df.columns
    got_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(c.lower() for c in got_cols) == sorted(c.lower() for c in exp_cols), (
        f"column mismatch: spark={got_cols} duckdb={exp_cols}"
    )
    assert len(got_rows) == len(exp_rows), (
        f"row count mismatch: spark={len(got_rows)} duckdb={len(exp_rows)}"
    )
    ng = _norm_rows([c.lower() for c in got_cols], got_rows)
    ne = _norm_rows([c.lower() for c in exp_cols], exp_rows)
    mismatches = [i for i, (a, b) in enumerate(zip(ng, ne)) if a != b]
    assert not mismatches, (
        f"value mismatch at sorted rows {mismatches[:5]}: "
        f"spark={[ng[i] for i in mismatches[:3]]} duckdb={[ne[i] for i in mismatches[:3]]}"
    )
    return len(got_rows)
