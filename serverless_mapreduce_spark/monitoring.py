"""Job monitoring parity (engine operator E16).

The reference captures per-executor metrics — lineCount, numKeys,
processingTime, memoryUsage, ioTime, computeTime — into S3 object metadata
(``job/map_handler.py:165-180``) and DynamoDB progress counters
(``utils/stage_progress.py:101-133``). On Spark most of that ships in the
UI/history server for free; what's worth library surface is *query-level*
counters riding the job itself: ``df.observe`` aggregates are computed by
the running tasks at ~zero cost (no extra pass, no collect) and delivered
to the driver when the action completes — the exact analog of the
reference's lineCount-style counters, minus the separate metrics store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame, key_col: str | None = None, name: str = "smr_metrics"
) -> tuple[DataFrame, Observation]:
    """Attach the reference's counter set to a DataFrame.

    Returns (df_with_observation, observation); read
    ``observation.get`` after an action. Metrics:
    - ``lineCount``: rows flowing through this point (map_handler.py:166);
    - ``numKeys``: approx distinct keys (map_handler.py:171's numKeys —
      approximate because exact distinct inside observe would force a
      per-metric shuffle; HLL++ rides the existing tasks);
    - ``nullKeys``: malformed-input signal (the reference just drops and
      prints on parse errors — here it's countable).
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("lineCount")]
    if key_col is not None:
        metrics.append(F.approx_count_distinct(key_col).alias("numKeys"))
        metrics.append(
            F.sum(F.when(F.col(key_col).isNull(), 1).otherwise(0)).alias("nullKeys")
        )
    return df.observe(obs, *metrics), obs
