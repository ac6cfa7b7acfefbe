"""Shared DuckDB-oracle comparison used by the pytest suite — the same check
the driver performs (row count + schema-insensitive, order-insensitive value
comparison at sf0.01)."""

from __future__ import annotations

import datetime as _dt
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
    # PySpark's collect() renders TimestampType (an INSTANT) as a naive
    # datetime in the PROCESS-local timezone (it ignores
    # spark.sql.session.timeZone, which only governs SQL casts and the
    # Arrow/toPandas path), while TimestampNTZType comes back as the wall
    # value unshifted. DuckDB returns naive UTC wall values for both.
    # Re-express only the instant columns local→UTC so the comparison is
    # environment-independent (no-op when TZ=UTC).
    from pyspark.sql.types import TimestampType

    instant_cols = {
        i for i, f in enumerate(spark_df.schema.fields)
        if isinstance(f.dataType, TimestampType)
    }

    def _utcify(i, v):
        if i in instant_cols and isinstance(v, _dt.datetime) and v.tzinfo is None:
            return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v

    got_rows = [
        tuple(_utcify(i, v) for i, v in enumerate(r)) for r in spark_df.collect()
    ]

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
