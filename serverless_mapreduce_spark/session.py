"""SparkSession factory tuned for this engine.

Replaces the reference's executor provisioning knobs (Lambda memory /
concurrency, ``static_variables.py:75-79``) with Spark session config. AQE is
on so partition counts self-tune at runtime — the Spark analog of the
reference's data-driven "#mappers = #batches" sizing
(``driver/driver.py:231-238``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "serverless_mapreduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    Defaults target local[N] testing but every knob is the one you'd set on
    a real cluster: AQE (runtime coalesce + skew-join splitting), Arrow for
    the Python boundary, UTC session time.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    # One BLAS thread per Python worker (guide §4.5 — right-size per-task
    # thread pools): importing numpy spins up an OpenBLAS pool sized to
    # the MACHINE (~3 s of sys time per process on 32 cores, measured —
    # plans/r18/prof_worker_spawn.txt). Every Python process Spark spawns
    # (executor workers, streaming source/sink runners, schema-inference
    # workers) pays that at import; a cold 32-worker batch turns it into
    # a multi-second kernel storm. Parallelism comes from Spark tasks,
    # not intra-worker BLAS — one thread per worker is the correct
    # production sizing (os.environ: local-mode workers inherit it;
    # executorEnv carries the same setting to real clusters).
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert in the catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Pre-size the heap to its max (-Xms = spark.driver.memory): the
        # JVM otherwise starts near the default min heap and the first
        # allocation-heavy stage pays repeated full GCs while the heap
        # grows — measured 50.6 s -> 11.6 s on the FIRST execution of the
        # sf1 shingle-verify join at local[32] (r18, guide §5). Same
        # production practice as sizing executor -Xms on a real cluster;
        # applied uniformly at every core count so c8/c32 benches stay
        # comparable.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '8g')}",
        )
        # see the os.environ block above — carries the same one-BLAS-
        # thread-per-worker sizing to non-local executors
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def utc_session(spark: SparkSession) -> SparkSession:
    """The caller's session with the session timezone pinned to UTC — as a
    CLONE (own conf, shared SparkContext) when it isn't already, so pinning
    never mutates shared state: operators that need deterministic
    wall-clock rendering (date_format/date_trunc output, NTZ→TIMESTAMP
    casts for watermarks) used to ``spark.conf.set`` mid-query, a write a
    concurrent ``engine.Engine`` caller on the same session could race.
    Cloning is cheap (no new context) and scoped to the returned handle."""
    if spark.conf.get("spark.sql.session.timeZone", None) == "UTC":
        return spark
    ss = spark.newSession()
    ss.conf.set("spark.sql.session.timeZone", "UTC")
    return ss
