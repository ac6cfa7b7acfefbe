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
    """Register every fixture table present in ``sf_dir`` as a view.
    DuckDB binds views eagerly, so skip files that do not exist — crafted
    edge-case corpora (a lone documents.parquet) can then reuse the same
    dtype-checking comparison as the full fixture dirs."""
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
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


def _check_oracle_dtypes(spark_df, rel) -> None:
    """Fail any oracle whose column dtype would diverge from Spark's in the
    driver's PANDAS comparison path even though ``fetchall()`` values agree.

    The driver hashes ``relation.df()`` where DuckDB HUGEINT (the silent
    result type of ``SUM(BIGINT)``) becomes float64 while Spark emits int64 —
    rows/schema match but the value hash does not (CORRECTNESS_r06:
    time_weighted_avg_user, eval_sample_accelerated_agg). ``fetchall()``
    returns Python ints for HUGEINT, which is why the old preflight was
    blind to the class. Also reject plain integer-vs-float disagreements in
    either direction for the same reason.
    """
    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    INT_DUCK = {
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    }
    FLOAT_DUCK = {"FLOAT", "DOUBLE"}
    spark_types = {
        f.name.lower(): f.dataType for f in spark_df.schema.fields
    }
    problems = []
    for col, dtype in zip(rel.columns, rel.types):
        duck_t = str(dtype).upper()
        sp_t = spark_types.get(col.lower())
        if sp_t is None:
            continue  # column-name mismatch is reported separately
        sp_int = isinstance(sp_t, (ByteType, ShortType, IntegerType, LongType))
        sp_float = isinstance(sp_t, (FloatType, DoubleType))
        if duck_t in ("HUGEINT", "UHUGEINT") or duck_t.startswith("DECIMAL"):
            # DECIMAL shares the hazard: relation.df() renders it float64,
            # while a Spark integer arrives as int64 and a Spark decimal as
            # dtype=object (decimal.Decimal) — either way the driver's hash
            # diverges with equal values. Repo convention is to CAST final
            # decimal aggregates to DOUBLE or BIGINT; none of the
            # registered oracles emit DECIMAL/HUGEINT output.
            problems.append(
                f"{col}: DuckDB {duck_t} becomes float64 in the driver's "
                f"pandas path (Spark side is {sp_t.simpleString()}) — "
                f"CAST the oracle column AS BIGINT or DOUBLE"
            )
        elif duck_t in FLOAT_DUCK and sp_int:
            problems.append(
                f"{col}: DuckDB {duck_t} vs Spark {sp_t.simpleString()} — "
                f"dtype-divergent under the driver's hash"
            )
        elif duck_t in INT_DUCK and sp_float:
            problems.append(
                f"{col}: DuckDB {duck_t} vs Spark {sp_t.simpleString()} — "
                f"dtype-divergent under the driver's hash"
            )
    assert not problems, "oracle dtype hazard: " + "; ".join(problems)


def assert_matches_oracle(spark_df, oracle: str, sf_dir: str) -> int:
    """Order-insensitive exact comparison of a Spark result vs DuckDB SQL.
    Returns the row count."""
    con = duck_con(sf_dir)
    rel = con.sql(oracle)
    _check_oracle_dtypes(spark_df, rel)
    exp_cols = list(rel.columns)
    exp_rows = rel.fetchall()

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


# --- shared crafted-corpus test helpers ------------------------------------------
# ONE definition of "build a tiny parquet fixture" and "compare a query to
# its registered oracle on it" (r8 review: these were triplicated across
# test_round7_edges / test_round8_edges / test_round8_hardening with
# drifting return shapes — a comparator change must land exactly once).


def crafted_dir(tmp_path_factory, name, rows=None, table_name="documents",
                tables=None):
    """Write crafted fixture table(s) as parquet under a tmp dir, return
    the dir. ``rows`` (row dicts OR a column-oriented dict — anything
    pd.DataFrame accepts) populates ``table_name``; pass ``tables=``
    ({name: rows, ...}) instead for multi-table fixtures (the pack/ANN
    ops join documents to embeddings — r10 review folded the private
    two-table helper back in here; the r10 full-suite run then caught
    that sniffing dict-shaped ``rows`` misfires on the r7/r8
    column-oriented fixtures, hence the EXPLICIT parameter)."""
    import pandas as pd

    d = tmp_path_factory.mktemp(name)
    for tname, trows in (tables if tables is not None else {table_name: rows}).items():
        pd.DataFrame(trows).to_parquet(d / f"{tname}.parquet")
    return str(d)


def agree_rows(spark, sf_dir, fn, name, as_dicts=False):
    """Driver-faithful parity on a crafted corpus through the SHARED
    comparator (including the HUGEINT/DECIMAL/int-float dtype gate).
    Returns sorted str-tuples over sorted(df.columns) — or row dicts
    with ``as_dicts=True`` — for content assertions."""
    from serverless_mapreduce_spark import registry

    got = fn(spark, sf_dir)
    assert_matches_oracle(got, registry.all_oracles()[name], sf_dir)
    if as_dicts:
        return [r.asDict() for r in got.collect()]
    cols = sorted(got.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in got.collect())
