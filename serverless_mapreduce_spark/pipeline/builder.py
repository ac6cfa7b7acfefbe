"""Pipeline-builder facade: the reference's fluent MapReduce user contract
(``ServerlessMR.map(f).combine(c).shuffle(p).reduce(g, n).run()``,
``src/python/serverless_mr/main.py:104-215``) re-hosted on Spark.

Contract parity (SURVEY.md §1.1, §2.1, FIXTURES.md §5):
- data in flight is (key, value) pairs; values are JSON-typed (str, int,
  float, bool, list, dict) — encoded as a 2-column DataFrame
  ``key string, value string`` where value is JSON, mirroring the
  reference's JSON-array S3 intermediates (``map_shuffle_handler.py:181-187``);
- ``map_function(outputs, (key, value))`` appends any number of output
  pairs (flatMap semantics, ``map_handler.py:74-89``);
- ``reduce_function(outputs, (key, [values]))`` sees each key's whole value
  list, keys sorted ascending within the reducer, and shares one ``outputs``
  list per reducer — so cross-key reducer state (the running-top-1 trick of
  ``query_3_phase_2.py:35-38``) behaves identically
  (``reduce_handler.py:122-155``);
- ``shuffle(p)`` takes ``p(key, num_bins) -> bin`` and controls *placement*
  (``default/partition.py:4-11``); it is honored exactly via
  ``rdd.partitionBy`` — the one place this engine deliberately drops to the
  RDD layer, because bin assignment is per-partition imperative logic the
  DataFrame planner owns otherwise;
- ``combine(c)`` runs the combiner per map task over its whole output
  before the shuffle (``map_shuffle_handler.py:145-162``); defaults to the
  reduce function when ``.reduce()`` follows without an explicit combiner
  (``main.py:155-160``);
- ``finish()`` seals a pipeline, ``merge([ids])`` consumes the union of
  finished pipelines' outputs (``main.py:168-180``) — Spark's lazy DAG
  subsumes the reference's coordinator (``coordinator.py:113-184``).

This facade is the *compatibility* surface: arbitrary Python callbacks are
the slow path by construction (row-at-a-time, like the reference). Workloads
expressible relationally should use the DataFrame operators in
``operators/`` — Catalyst fuses/optimizes those; it cannot see into pickled
callbacks here (Spark ships them via cloudpickle, replacing the reference's
zip-and-upload E15 machinery).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

KV_SCHEMA = "key string, value string"

MapFn = Callable[[list, tuple], None]
ReduceFn = Callable[[list, tuple], None]
PartitionFn = Callable[[Any, int], int]


def kv_dataframe(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Adapt a relational DataFrame to the facade's KV view (2-column
    string/JSON DataFrame — SURVEY.md §1.1's compatibility mapping)."""
    from pyspark.sql import functions as F

    # JSON-encode the value JVM-side: to_json(struct(v)) = '{"v":<json>}',
    # so the value's JSON form is chars [6, len-6] (nulls are omitted by
    # to_json → coalesce to the JSON literal).
    j = F.to_json(F.struct(F.col(value_col).alias("v")))
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.coalesce(
            F.nullif(F.substring(j, 6, F.length(j) - 6), F.lit("")),
            F.lit("null"),
        ).alias("value"),
    )


def _encode(v: Any) -> str:
    return json.dumps(v, separators=(",", ":"), sort_keys=True)


def _decode(s: str) -> Any:
    return json.loads(s)


@dataclass
class _Stage:
    kind: str  # 'map' | 'reduce'
    fn: MapFn | ReduceFn
    num_reducers: int = 0
    partitioner: PartitionFn | None = None
    combiner: ReduceFn | None = None
    combiner_associative: bool = False
    reduce_associative: bool = False


@dataclass
class _Pipeline:
    pid: int
    stages: list[_Stage] = field(default_factory=list)
    source: DataFrame | None = None
    dependents: list[int] = field(default_factory=list)


class ServerlessMR:
    """Fluent builder with the reference's public surface. Differences from
    the reference: input is any KV DataFrame (``.source()``) instead of
    S3/DynamoDB config, and ``run()`` returns the final KV DataFrame
    lazily instead of writing S3 JSON."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._pipelines: dict[int, _Pipeline] = {}
        self._current = _Pipeline(pid=0)
        self._next_pid = 1
        self._pending_shuffle: PartitionFn | None = None
        self._pending_combine: ReduceFn | None = None
        self._pending_combine_assoc: bool = False

    # -- builder surface (main.py:104-180 parity) --

    def source(self, df: DataFrame, key_col: str = "key", value_col: str = "value") -> "ServerlessMR":
        if set(df.columns) == {"key", "value"} and key_col == "key" and value_col == "value":
            self._current.source = df
        else:
            self._current.source = kv_dataframe(df, key_col, value_col)
        return self

    def map(self, fn: MapFn) -> "ServerlessMR":
        self._current.stages.append(_Stage("map", fn))
        return self

    def shuffle(self, partitioner: PartitionFn) -> "ServerlessMR":
        self._pending_shuffle = partitioner
        return self

    def combine(self, combiner: ReduceFn, associative: bool = False) -> "ServerlessMR":
        """``associative=True`` declares that the combiner emits exactly one
        pair per key and combine(combine(a,b),c) == combine(a,combine(b,c)).
        The facade then folds values into a per-key accumulator as the
        partition streams through, bounding combiner memory to O(distinct
        keys) instead of materializing the whole partition (the reference
        always materializes, ``map_shuffle_handler.py:145-162`` — faithful
        but OOM-prone on hot keys at scale)."""
        self._pending_combine = combiner
        self._pending_combine_assoc = associative
        return self

    def reduce(
        self,
        fn: ReduceFn,
        num_reducers: int,
        combine: bool = False,
        associative: bool = False,
    ) -> "ServerlessMR":
        # Like main.py:136-166: reduce() binds any pending shuffle/combine
        # to the shuffle boundary it creates. combine=True with no explicit
        # combiner reuses the reduce function (main.py:155-160).
        # associative=True opts the *reduce side* into the streaming per-key
        # fold (same contract as combine(associative=True)): memory bounded
        # by O(distinct keys in the reducer) instead of the whole partition —
        # the fix for the reference's hot-key OOM (reduce_handler.py:122
        # materializes everything). Trade-off: no sorted-key iteration and
        # no cross-key reducer state, so the default stays contract-parity.
        combiner = self._pending_combine if self._pending_combine else (fn if combine else None)
        assoc = getattr(self, "_pending_combine_assoc", False) if self._pending_combine else False
        self._current.stages.append(
            _Stage(
                "reduce",
                fn,
                num_reducers,
                self._pending_shuffle,
                combiner,
                assoc,
                associative,
            )
        )
        self._pending_shuffle = None
        self._pending_combine = None
        self._pending_combine_assoc = False
        return self

    def finish(self) -> int:
        """Seal the current pipeline; returns its id for merge()."""
        pid = self._current.pid
        self._pipelines[pid] = self._current
        self._current = _Pipeline(pid=self._next_pid)
        self._next_pid += 1
        return pid

    def merge(self, pids: list[int]) -> "ServerlessMR":
        """New current pipeline reads the union of the given pipelines'
        outputs (coordinator.py:146-148 semantics: concatenated inputs)."""
        self._current.dependents = list(pids)
        return self

    def describe(self) -> dict:
        """The pipeline DAG as plain JSON-able data — the reference's
        /dag endpoint payload (web_ui/app.py:554-568 serves the registered
        job's pipeline graph): one node per pipeline with its ordered
        stage kinds / reducer counts / combiner flags, edges from merge()
        dependencies. Pure introspection — nothing executes."""
        pipes = dict(self._pipelines)
        cur = self._current
        if cur.stages or cur.source is not None or cur.dependents:
            pipes[cur.pid] = cur
        return {
            "pipelines": [
                {
                    "pid": pid,
                    "stages": [
                        {
                            "kind": s.kind,
                            "num_reducers": s.num_reducers,
                            "has_combiner": s.combiner is not None,
                            "has_partitioner": s.partitioner is not None,
                        }
                        for s in p.stages
                    ],
                    "has_source": p.source is not None,
                    "depends_on": list(p.dependents),
                }
                for pid, p in sorted(pipes.items())
            ]
        }

    # -- execution --

    def run(self) -> DataFrame:
        """Materialize the DAG lazily; returns the last pipeline's KV
        DataFrame. Stage chaining is free (Catalyst/RDD lineage) — no
        per-stage S3 materialization (driver.py:299-351 is subsumed)."""
        if self._current.stages or self._current.source is not None or self._current.dependents:
            self.finish()
        outputs: dict[int, DataFrame] = {}
        last: DataFrame | None = None
        for pid in sorted(self._pipelines):
            pipe = self._pipelines[pid]
            if pipe.dependents:
                dfs = [outputs[d] for d in pipe.dependents]
                df = dfs[0]
                for other in dfs[1:]:
                    df = df.unionAll(other)
            elif pipe.source is not None:
                df = pipe.source
            else:
                raise ValueError(f"pipeline {pid} has no source and no dependents")
            for stage in pipe.stages:
                df = _run_stage(self._spark, df, stage)
            outputs[pid] = df
            last = df
        if last is None:
            raise ValueError("no pipelines to run")
        return last


def _run_stage(spark: SparkSession, df: DataFrame, stage: _Stage) -> DataFrame:
    if stage.kind == "map":
        return _run_map(df, stage.fn)
    return _run_reduce(spark, df, stage)


def _run_map(df: DataFrame, fn: MapFn) -> DataFrame:
    """flatMap semantics via mapInPandas (Arrow-batched transport; the
    callback itself is row-at-a-time per the reference contract,
    map_handler.py:79-128)."""
    import pandas as pd

    def gen(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            out: list[tuple] = []
            for k, v in zip(pdf["key"], pdf["value"]):
                fn(out, (k, _decode(v)))
            if out:
                yield pd.DataFrame(
                    {
                        "key": [str(k) for k, _ in out],
                        "value": [_encode(v) for _, v in out],
                    }
                )

    return df.mapInPandas(gen, KV_SCHEMA)


def _group_sorted(pairs: list[tuple]) -> Iterable[tuple]:
    """Sort by key then group adjacent equals — reduce_handler.py:122-155."""
    pairs.sort(key=lambda kv: kv[0])
    key, vals = None, []
    for k, v in pairs:
        if k != key and vals:
            yield key, vals
            vals = []
        key = k
        vals.append(v)
    if vals:
        yield key, vals


def _run_reduce(spark: SparkSession, df: DataFrame, stage: _Stage) -> DataFrame:
    """Shuffle (hash by default, exact user partitioner when given) then
    sort-group-reduce per reducer partition.

    Two transports (r18, guide §4): with NO custom partitioner the whole
    combine → shuffle → reduce chain stays in DataFrame/Arrow —
    ``df.rdd`` pickles every (key, value) row out of the JVM and
    ``createDataFrame`` pickles it back, twice per chain, and hash
    placement is not user-visible (``repartition(n, "key")`` keys each
    reducer identically: every key still meets exactly one reducer, and
    explicit repartition counts are exempt from AQE coalescing, so
    ``num_reducers`` is honored). The RDD layer remains for the custom-
    partitioner path, where exact bin *placement* is the contract
    (rdd.partitionBy is the only exact-placement primitive) — results
    themselves are identical either way, pinned by the facade oracle
    rows."""
    fn = stage.fn
    combiner = stage.combiner
    n = stage.num_reducers
    partitioner = stage.partitioner

    if partitioner is None:
        import pandas as pd

        def _emit(out: list[tuple]):
            if out:
                yield pd.DataFrame(
                    {
                        "key": [str(k) for k, _ in out],
                        "value": [_encode(v) for _, v in out],
                    }
                )

        def _fold_gen(g: ReduceFn):
            # streaming per-key fold (associative contract): O(distinct
            # keys) memory, identical to the RDD assoc path
            def gen(batches: Iterable["pd.DataFrame"]):
                acc: dict = {}
                for pdf in batches:
                    for k, v in zip(pdf["key"], pdf["value"]):
                        val = _decode(v)
                        if k in acc:
                            merged: list[tuple] = []
                            g(merged, (k, [acc[k], val]))
                            acc[k] = merged[0][1]
                        else:
                            acc[k] = val
                yield from _emit(list(acc.items()))

            return gen

        def _fold_gen_seeded(g: ReduceFn):
            # reduce contract: even a lone value passes through g once
            def gen(batches: Iterable["pd.DataFrame"]):
                acc: dict = {}
                for pdf in batches:
                    for k, v in zip(pdf["key"], pdf["value"]):
                        val = _decode(v)
                        if k in acc:
                            merged: list[tuple] = []
                            g(merged, (k, [acc[k], val]))
                            acc[k] = merged[0][1]
                        else:
                            single: list[tuple] = []
                            g(single, (k, [val]))
                            acc[k] = single[0][1]
                yield from _emit(list(acc.items()))

            return gen

        def _grouped_gen(g: ReduceFn):
            # contract-parity: g sees each key's FULL sorted value list,
            # one shared outputs list per task (materializes the
            # partition — the reference's own memory behavior)
            def gen(batches: Iterable["pd.DataFrame"]):
                pairs: list[tuple] = []
                for pdf in batches:
                    pairs.extend(
                        (k, _decode(v))
                        for k, v in zip(pdf["key"], pdf["value"])
                    )
                out: list[tuple] = []
                for key, vals in _group_sorted(pairs):
                    g(out, (key, vals))
                yield from _emit(out)

            return gen

        if combiner is not None:
            cg = (
                _fold_gen(combiner)
                if stage.combiner_associative
                else _grouped_gen(combiner)
            )
            df = df.mapInPandas(cg, KV_SCHEMA)
        rg = (
            _fold_gen_seeded(fn)
            if stage.reduce_associative
            else _grouped_gen(fn)
        )
        return df.repartition(n, "key").mapInPandas(rg, KV_SCHEMA)

    rdd = df.rdd.map(lambda row: (row[0], row[1]))

    if combiner is not None and stage.combiner_associative:
        # Bounded-memory path: stream the partition, folding each value into
        # a per-key accumulator via pairwise combiner calls — memory is
        # O(distinct keys), not O(partition rows).
        def combine_part_assoc(it):
            acc: dict = {}
            for k, v in it:
                val = _decode(v)
                if k in acc:
                    merged: list[tuple] = []
                    combiner(merged, (k, [acc[k], val]))
                    acc[k] = merged[0][1]
                else:
                    acc[k] = val
            return [(k, _encode(v)) for k, v in acc.items()]

        rdd = rdd.mapPartitions(combine_part_assoc, preservesPartitioning=False)
    elif combiner is not None:
        # Contract-parity path: the combiner sees each key's full value list
        # (sorted, like the reference's map-side combine) — which requires
        # materializing the map task's output, the reference's own memory
        # behavior (map_shuffle_handler.py:145-162).
        def combine_part(it):
            pairs = list(it)
            out: list[tuple] = []
            for key, vals in _group_sorted(pairs):
                combiner(out, (key, [_decode(v) for v in vals]))
            return [(k, _encode(v)) for k, v in out]

        rdd = rdd.mapPartitions(combine_part, preservesPartitioning=False)

    if partitioner is not None:
        rdd = rdd.partitionBy(n, lambda k: partitioner(k, n) % n)
    else:
        rdd = rdd.partitionBy(n)

    if stage.reduce_associative:
        def reduce_part(it):
            acc: dict = {}
            for k, v in it:
                val = _decode(v)
                if k in acc:
                    merged: list[tuple] = []
                    fn(merged, (k, [acc[k], val]))
                    acc[k] = merged[0][1]
                else:
                    single: list[tuple] = []
                    fn(single, (k, [val]))
                    acc[k] = single[0][1]
            return [(k, _encode(v)) for k, v in acc.items()]
    else:
        def reduce_part(it):
            pairs = list(it)
            out: list[tuple] = []  # one shared outputs list per reducer
            for key, vals in _group_sorted(pairs):
                fn(out, (key, [_decode(v) for v in vals]))
            return [(k, _encode(v)) for k, v in out]

    reduced = rdd.mapPartitions(reduce_part, preservesPartitioning=True)
    return spark.createDataFrame(reduced.map(lambda kv: (str(kv[0]), kv[1])), KV_SCHEMA)
