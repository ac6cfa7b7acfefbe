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


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for deferred cleanup."""
    _live().append(df.persist())
    return df


def release_cached() -> int:
    """Unpersist this thread's tracked caches (non-blocking); returns count."""
    live = _live()
    n = len(live)
    for df in live:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    live.clear()
    return n
