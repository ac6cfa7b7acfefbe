"""Registry-wide oracle dtype audit — the pytest twin of the preflight's
``_check_oracle_dtypes`` gate, run WITHOUT executing anything.

The driver hashes oracle output through pandas, where DuckDB HUGEINT and
DECIMAL become float64 while Spark emits int64 (CORRECTNESS_r06's only
failures). The preflight now rejects the class at comparison time, but the
full preflight is a round-end sweep; this test makes the same audit a
per-``pytest`` gate by combining the ANALYSIS-ONLY Spark schema (no job
runs) with DuckDB's lazily-evaluated relation types (the SQL is bound,
never fetched). Whole registry in seconds, same exclusion list as the
plan lint for queries whose *construction* executes driver-side work —
those still get the dtype check in every full preflight run.
"""

from __future__ import annotations

import pytest

from oracle import _check_oracle_dtypes, duck_con
from serverless_mapreduce_spark import registry
from test_plan_lint import SIDE_EFFECTING

SF = "/root/testdata/sf0.001"


def _auditable():
    oracles = registry.all_oracles()
    return [
        (name, fn)
        for name, fn in registry.all_queries().items()
        if name not in SIDE_EFFECTING and oracles.get(name)
    ]


@pytest.mark.parametrize(
    "name,fn", _auditable(), ids=lambda p: p if isinstance(p, str) else ""
)
def test_oracle_dtypes_driver_safe(spark, name, fn):
    fn = getattr(fn, "__wrapped__", fn)
    df = fn(spark, SF)  # lazy: analysis only, no execution
    con = duck_con(SF)
    rel = con.sql(registry.all_oracles()[name])  # lazy: bound, not fetched
    _check_oracle_dtypes(df, rel)
