"""Query-scoped cache tracking.

Several operators persist an intermediate that the plan consumes more than
once (minhash signatures, the shingle inverted index, IVF cell assignments):
Catalyst's CollapseProject would otherwise re-inline the expensive expression
into every consumer. Those caches must live until the *caller* materializes
the returned DataFrame — so the operator itself cannot unpersist — but they
must not accumulate across invocations either (bench loops and multi-SF test
sessions would pile cached blocks into executor storage memory).

Contract: operators call :func:`persist_tracked` instead of ``.persist()``;
the registry wrapper (registry.py) calls :func:`release_cached` on entry to
every registered query, so per thread at most one query's caches are live.
Tracking is thread-local: Spark supports multi-threaded job submission (and
``engine.Engine`` invites it), so one thread entering a query must not
unpersist another thread's in-flight caches mid-plan. Harnesses may also
call ``release_cached()`` explicitly after materializing a result. At
100 TB the same intermediates would be written tables (see the per-site
comments), not executor caches, and this bookkeeping disappears.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_TL = threading.local()


def _live() -> list[DataFrame]:
    if not hasattr(_TL, "live"):
        _TL.live = []
    return _TL.live


def _live_views() -> list[tuple]:
    if not hasattr(_TL, "views"):
        _TL.views = []
    return _TL.views


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for deferred cleanup."""
    _live().append(df.persist())
    return df


def track_view(spark, name: str) -> None:
    """Register a temp view for DEFERRED dropping at the next
    :func:`release_cached` on this thread. Dropping a view immediately
    after building a DataFrame that references it only works because
    classic PySpark analyzes plans eagerly — under Spark Connect analysis
    defers to execution and the early drop would break the query — so
    internal views ride the same query-scoped lifetime as tracked caches
    instead (see catalog.unique_view)."""
    _live_views().append((spark, name))


def release_cached() -> int:
    """Unpersist this thread's tracked caches and drop its tracked temp
    views (non-blocking); returns the released-cache count."""
    live = _live()
    n = len(live)
    for df in live:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    live.clear()
    views = _live_views()
    for spark, name in views:
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass  # session already stopped — nothing to drop
    views.clear()
    return n
