"""Programmatic job registry/run/status surface.

Parity target: the reference exposes register / invoke / job-status /
metrics over its web UI's HTTP endpoints
(``src/python/serverless_mr/web_ui/app.py:196,370,417,501-554``, backed by
DynamoDB progress tables). On Spark the history server already stores the
raw events, but a *library* consumer wants the same three verbs in-process:
list the registered queries, run one, and read per-run metrics afterward.

``Engine.run`` wraps each query in a Spark job group, so job/stage/task
counts come from ``sc.statusTracker()`` scoped to exactly that run, and
rides a zero-cost ``observe`` counter (monitoring.py) for the row count —
no extra pass, no driver-side collect of the result.
"""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

from serverless_mapreduce_spark import registry
from serverless_mapreduce_spark.monitoring import observe_counts


@dataclass
class QueryRun:
    """Status record for one query execution (the reference's job-status
    row: web_ui/app.py:501-554)."""

    name: str
    status: str = "RUNNING"          # RUNNING | SUCCEEDED | FAILED
    started_at: float = 0.0
    wall_s: float = 0.0
    rows: int | None = None
    num_jobs: int = 0
    num_tasks: int = 0
    error: str | None = None


@dataclass
class Engine:
    """In-process register/run/status facade over the query registry."""

    spark: SparkSession
    sf_dir: str
    _runs: dict[str, list[QueryRun]] = field(default_factory=dict)

    def queries(self) -> list[str]:
        """The registered query names (reference: list-jobs endpoint)."""
        return list(registry.all_queries())

    def run(self, name: str) -> DataFrame:
        """Execute one registered query to completion (distributed noop
        write — no driver collect), recording wall time, row count, and
        job/stage/task counts scoped to this run's job group. Returns the
        (lazy) result DataFrame for further use."""
        fn = registry.all_queries()[name]
        rec = QueryRun(name=name, started_at=time.time())
        self._runs.setdefault(name, []).append(rec)
        sc = self.spark.sparkContext
        group = f"smr-run-{name}-{len(self._runs[name])}"
        sc.setJobGroup(group, f"engine.run({name})", interruptOnCancel=False)
        t0 = time.perf_counter()
        try:
            df = fn(self.spark, self.sf_dir)
            observed, obs = observe_counts(df, name=f"{group}-metrics")
            observed.write.format("noop").mode("overwrite").save()
            rec.rows = int(obs.get["lineCount"])
            rec.status = "SUCCEEDED"
        except Exception as exc:
            rec.status = "FAILED"
            rec.error = f"{type(exc).__name__}: {exc}"
            raise
        finally:
            rec.wall_s = round(time.perf_counter() - t0, 3)
            tracker = sc.statusTracker()
            job_ids = tracker.getJobIdsForGroup(group)
            rec.num_jobs = len(job_ids)
            for jid in job_ids:
                info = tracker.getJobInfo(jid)
                if info is None:
                    continue
                for sid in info.stageIds:
                    sinfo = tracker.getStageInfo(sid)
                    if sinfo is not None:
                        rec.num_tasks += sinfo.numTasks
            sc.setJobGroup("", "")
        return df

    def status(self, name: str | None = None) -> dict[str, list[dict]]:
        """Run history (most recent last), as plain dicts (the JSON the
        reference's status endpoint would serve)."""
        items = self._runs.items() if name is None else [(name, self._runs.get(name, []))]
        return {n: [asdict(r) for r in rs] for n, rs in items}

    def explain(self, name: str, mode: str = "formatted") -> str:
        """The optimized physical plan of a registered query, without
        executing the returned DataFrame (the reference's job-detail view,
        but for plans). Calls the query fn UNWRAPPED — plan inspection must
        not trigger the registry wrapper's ``release_cached()``, which
        would unpersist a concurrently-running query's live caches. Note:
        queries that prepare their input driver-side (sink round-trips,
        bucketed-table writes, stream drains) necessarily run that
        preparation to have a plan at all — only the final DataFrame stays
        lazy."""
        fn = registry.all_queries()[name]
        fn = getattr(fn, "__wrapped__", fn)
        df = fn(self.spark, self.sf_dir)
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), mode
        )
