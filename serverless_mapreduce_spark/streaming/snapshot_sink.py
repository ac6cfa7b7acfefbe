"""Streaming ingest INTO the snapshot table format: foreachBatch commits
one SnapshotTable version per micro-batch, exactly once.

This composes the two families that were built separately (VERDICT r9
item 6): Structured Streaming's checkpointed delivery and the manifest
table's atomic versioned commits. The built-in parquet file sink already
gives exactly-once batches, but its ``_spark_metadata`` log is private to
the sink — downstream consumers get a directory, not a TABLE: no time
travel, no manifest-stats pruning, no ``read_incremental`` change feed, no
compaction/retention/evolution. Committing each micro-batch through
``SnapshotTable`` gives the stream all of that for free, and the manifest
history doubles as the idempotence ledger:

- Structured Streaming guarantees each micro-batch a stable ``batch_id``
  and replays a batch whose side effects may have landed but whose
  checkpoint offset commit did not (at-least-once delivery into
  foreachBatch — the documented contract);
- ``commit_stream_batch`` records (stream_id, batch_id) IN the manifest it
  publishes, and skips any batch id the manifest history already carries —
  at-least-once delivery + idempotent commit = exactly-once versions (the
  Delta ``txnAppId``/``txnVersion`` pattern; reference analog: none, its
  reducers re-write whole output objects per run,
  ``output_handler_s3.py:41-53``).

Kill-and-resume is pytested (tests/test_snapshot_sink.py): a resumed run
over the same checkpoint appends only unseen input, a redelivered batch is
skipped with no new version, and the version history stays dense.

At 100 TB: each micro-batch append is delta-sized; the per-batch small
files are exactly what ``compact_small_files`` exists for, and
``expire_versions`` bounds the history — the full table-maintenance loop
(ingest → compact → expire) now runs end-to-end on streaming input.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_mapreduce_spark.paths import scratch, sf_tag
from serverless_mapreduce_spark.registry import query
from serverless_mapreduce_spark.sources.snapshots import SnapshotTable, _cents
from serverless_mapreduce_spark.streaming.stream_queries import events_stream


def run_stream_to_snapshot(
    sdf: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    *,
    stream_id: str = "stream",
    stats_cols: tuple[str, ...] = (),
) -> None:
    """Drain the bounded stream into ``table``, one exactly-once version
    per micro-batch (module docstring). Append-shaped streams only — each
    batch is new rows; aggregations belong downstream of the table, where
    ``read_incremental`` refreshes them at delta cost."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.commit_stream_batch(
            batch_df, stream_id, batch_id, stats_cols=stats_cols
        )

    (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


@query(
    "stream_snapshot_ingest",
    priority=150,
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents,
           1 AS n_versions
    FROM events GROUP BY event_type
    """,
)
def stream_snapshot_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING INGEST → SNAPSHOT TABLE, exactly once: the events stream
    drains through ``run_stream_to_snapshot`` (one version per
    micro-batch), is deliberately re-run over the SAME checkpoint (a
    restart with no new input must add nothing), and batch 0 is then
    REDELIVERED by hand straight into the sink function (the at-least-once
    crash-replay case). Only then is the table read back and aggregated.
    Every failure mode shows up in the values: a lost dedup would double
    n_events/sum_cents against the oracle; a spurious commit would bump
    the n_versions column off the oracle's literal 1. The idempotence
    ledger is the manifest history itself — nothing here relies on the
    checkpoint alone."""
    base = scratch(sf_tag(sf_dir), "stream_snapshot")
    ckpt = scratch(sf_tag(sf_dir), "stream_snapshot_ckpt")
    for d in (base, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    t = SnapshotTable(base)
    sid = "events_ingest"

    ev = events_stream(spark, sf_dir).select("event_id", "event_type", "value")
    run_stream_to_snapshot(ev, t, ckpt, stream_id=sid)
    # restart over the same checkpoint: no new input, no new version
    ev2 = events_stream(spark, sf_dir).select("event_id", "event_type", "value")
    run_stream_to_snapshot(ev2, t, ckpt, stream_id=sid)
    # crash-replay: batch 0 redelivered out-of-band must be skipped (the
    # rows don't matter — a broken dedup would publish a version and bump
    # n_versions off the oracle's 1 even for an empty batch)
    t.commit_stream_batch(spark.createDataFrame([], ev.schema), sid, 0)

    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(_cents("value")).cast("bigint").alias("sum_cents"),
        )
        .withColumn("n_versions", F.lit(t.latest_version()).cast("int"))
    )


# --- streaming ingest with inline LSH dedup ----------------------------------


def _dedup_ingest_oracle() -> str:
    from serverless_mapreduce_spark.operators.dedup import (
        _SQL_BAND_CTES,
        INCR_MOD,
        PERSIST_B1,
        PERSIST_B2,
    )

    return f"""
    WITH {_SQL_BAND_CTES},
    idx1 AS (SELECT * FROM bands
             WHERE doc_id % {INCR_MOD} NOT IN ({PERSIST_B1}, {PERSIST_B2})),
    b1 AS (SELECT * FROM bands WHERE doc_id % {INCR_MOD} = {PERSIST_B1}),
    b2 AS (SELECT * FROM bands WHERE doc_id % {INCR_MOD} = {PERSIST_B2}),
    drop1 AS (
      SELECT DISTINCT n.doc_id FROM b1 n JOIN idx1 o
        ON n.band_idx = o.band_idx AND n.band_hash = o.band_hash
    ),
    surv1 AS (
      SELECT d.doc_id FROM documents d
      LEFT JOIN drop1 x ON x.doc_id = d.doc_id
      WHERE d.doc_id % {INCR_MOD} = {PERSIST_B1} AND x.doc_id IS NULL
    ),
    idx2 AS (
      SELECT * FROM idx1
      UNION ALL SELECT b.* FROM b1 b JOIN surv1 s ON s.doc_id = b.doc_id
    ),
    drop2 AS (
      SELECT DISTINCT n.doc_id FROM b2 n JOIN idx2 o
        ON n.band_idx = o.band_idx AND n.band_hash = o.band_hash
    ),
    surv2 AS (
      SELECT d.doc_id FROM documents d
      LEFT JOIN drop2 x ON x.doc_id = d.doc_id
      WHERE d.doc_id % {INCR_MOD} = {PERSIST_B2} AND x.doc_id IS NULL
    ),
    final AS (
      SELECT doc_id, source FROM documents
      WHERE doc_id % {INCR_MOD} NOT IN ({PERSIST_B1}, {PERSIST_B2})
      UNION ALL SELECT d.doc_id, d.source FROM documents d
                JOIN surv1 s ON s.doc_id = d.doc_id
      UNION ALL SELECT d.doc_id, d.source FROM documents d
                JOIN surv2 s ON s.doc_id = d.doc_id
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(bit_xor(doc_id) AS BIGINT) AS xor_doc_id
    FROM final GROUP BY source
    """


DOCS_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


@query("stream_dedup_ingest", priority=150, oracle=_dedup_ingest_oracle())
def stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING INGEST WITH INLINE LSH DEDUP — the production front door
    this round's pieces compose into: each micro-batch (1) bands its
    documents (the dedup family's shared MinHash builders, batch-scoped),
    (2) probes the CURRENT persistent band index through the manifest
    reader, (3) drops every doc with a band collision against the index
    (aggressive LSH mode — ``dedup_persistent_index`` demonstrates the
    jaccard-verified variant of the same probe; the verify join composes
    here unchanged), (4) commits the SURVIVORS to the corpus table and
    their bands to the index table, both exactly-once via the manifest
    batch ledger. Batch 2's duplicates-of-batch-1 are therefore dropped
    ONLY because batch 1's bands were persisted in between — the oracle's
    idx2 CTE pins the cross-batch visibility, and the whole flow is
    driven by a real checkpointed stream (two drains over one checkpoint,
    so delivery/replay semantics are the tested foreachBatch path, not a
    batch simulation).

    Two tables land per batch (corpus, index) as ONE TRANSACTION: each
    stages a normal SnapshotTable commit (invisible to catalog readers),
    then a single ``MultiTableCatalog.publish`` CAS makes both visible
    and advances the batch ledger atomically — batch N is in both tables
    or in neither, with no crash window between them (VERDICT r10 item 4;
    crash-injection pytest: tests/test_multitable_txn.py). The probe
    reads the index THROUGH the catalog, so a half-landed batch could
    never contribute bands either. Blank docs band to nothing and always
    survive (both engines, the shared blank-shingle convention).

    Scale: per batch cost is O(batch bands + collisions) against a
    clustered append-only index — the dedup_persistent_index shape now
    attached to a live stream; corpus and index grow monotonically,
    compaction/retention run between batches (test_snapshot_sink.py)."""
    import glob
    import os

    from serverless_mapreduce_spark.catalog import table
    from serverless_mapreduce_spark.operators.dedup import (
        INCR_MOD,
        PERSIST_B1,
        PERSIST_B2,
        _bands,
        minhash_signatures,
    )

    from serverless_mapreduce_spark.sources.snapshots import MultiTableCatalog

    base = scratch(sf_tag(sf_dir), "stream_dedup")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    corpus_dir, index_dir = os.path.join(base, "corpus"), os.path.join(base, "index")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(src)
    corpus_t, index_t = SnapshotTable(corpus_dir), SnapshotTable(index_dir)
    cat = MultiTableCatalog(base)
    sid = "dedup_ingest"

    docs = table(spark, sf_dir, "documents")
    rem = F.col("doc_id") % INCR_MOD
    standing = docs.filter(~rem.isin(PERSIST_B1, PERSIST_B2))
    v_corp = corpus_t.commit(standing)
    v_idx = index_t.commit(
        _bands(minhash_signatures(standing)).repartition("band_idx", "band_hash")
    )
    cat.publish({"corpus": v_corp, "index": v_idx})

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        if cat.batch_committed(sid, batch_id):
            return  # redelivery after a published transaction
        # bands_b feeds three consumers (dup probe, survivor filter, index
        # commit): persist once per batch or the mapInPandas signature
        # pass re-runs per action — the dedup family's dominant cost on
        # this hot path (r10 review).
        bands_b = (
            _bands(minhash_signatures(batch_df))
            .select("doc_id", "band_idx", "band_hash")
            .persist()
        )
        try:
            # the probe reads the index THROUGH the catalog: staged
            # versions from a crashed transaction must not dedup against
            # bands whose corpus rows were never published
            idx = index_t.read(
                batch_df.sparkSession, cat.visible("index")
            ).select("band_idx", "band_hash")
            # INNER join with the batch bands as the broadcast BUILD side:
            # a left_semi with a broadcast hint on its LEFT cannot be
            # honored (semi only builds right), so Spark would broadcast
            # the monotonically GROWING index instead — inverted exactly
            # backwards at scale (r10 review, verified via explain).
            # inner + distinct doc_id ≡ the intended semi.
            dup_ids = (
                F.broadcast(bands_b)
                .join(idx, ["band_idx", "band_hash"])
                .select("doc_id")
                .distinct()
            )
            survivors = batch_df.join(dup_ids, "doc_id", "left_anti")
            # stage both tables from the last PUBLISHED base, then flip
            # visibility + ledger in ONE catalog CAS (atomic multi-table
            # commit; a crash between the stages leaves only orphan
            # versions, never a half-visible batch)
            vc = corpus_t.commit_onto(cat.visible("corpus"), survivors)
            # survivors' bands ≡ bands_b minus the dropped ids — reuse the
            # persisted frame instead of re-running MinHash over survivors
            vi = index_t.commit_onto(
                cat.visible("index"),
                bands_b.join(dup_ids, "doc_id", "left_anti").repartition(
                    "band_idx", "band_hash"
                ),
            )
            cat.publish({"corpus": vc, "index": vi}, sid, batch_id)
        finally:
            bands_b.unpersist()

    def drain() -> None:
        (
            spark.readStream.schema(DOCS_DDL)
            .parquet(src)
            .writeStream.foreachBatch(ingest_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    def add_file(df: DataFrame, name: str) -> None:
        tmp = os.path.join(src, f"_tmp_{name}")
        df.select(
            "doc_id", "text", "lang", "source", "n_chars"
        ).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, os.path.join(src, f"{name}.parquet"))
        shutil.rmtree(tmp)

    add_file(docs.filter(rem == PERSIST_B1), "batch1")
    drain()                                    # micro-batch 0: batch 1 docs
    add_file(docs.filter(rem == PERSIST_B2), "batch2")
    drain()                                    # micro-batch 1: batch 2 docs

    return (
        corpus_t.read(spark, cat.visible("corpus"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.expr("CAST(bit_xor(doc_id) AS BIGINT)").alias("xor_doc_id"),
        )
    )


# --- streaming materialized view: per-batch merge into a keyed agg table ---------


@query(
    "stream_agg_materialized",
    priority=150,
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM events GROUP BY event_type
    """,
)
def stream_agg_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MATERIALIZED VIEW ON THE TABLE FORMAT: a per-event-type
    running aggregate maintained as a KEYED SNAPSHOT TABLE, refreshed by
    merge-upsert from each micro-batch — the exactly-once, queryable-at-
    every-version alternative to holding the aggregate in operator state
    (``stream_upsert_latest``'s state lives in the checkpoint; this
    one's lives in versioned, time-travelable, vacuumable parquet that
    ANY reader can serve between batches). Per batch: aggregate the
    batch's rows (delta-sized), read the stored totals, monoid-merge
    (count/cents are commutative), and ``merge_upsert`` the merged rows
    back — only the files holding touched keys rewrite. The batch ledger
    rides the merge manifest (same extra-field mechanism as
    commit_stream_batch), so a redelivered batch is skipped and the
    double-apply failure mode — the classic streaming-upsert bug —
    would double sum_cents against the oracle.

    The events source drains over one checkpoint in two separate runs
    (file 2 arrives between them), so the refresh provably works from a
    PARTIAL stored state, not a single full-input batch."""
    import glob
    import os

    from serverless_mapreduce_spark.catalog import table

    base = scratch(sf_tag(sf_dir), "stream_agg_mv")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(src)
    t = SnapshotTable(os.path.join(base, "mv"))
    sid = "agg_mv"

    def agg_of(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(_cents("value")).cast("bigint").alias("sum_cents"),
        )

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        if t.stream_batch_committed(sid, batch_id):
            return  # redelivery: the stored totals already include it
        delta = agg_of(batch_df)
        if t.latest_version() is None:
            merged = delta
        else:
            stored = t.read(batch_df.sparkSession)
            merged = (
                stored.unionByName(delta)
                .groupBy("event_type")
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("sum_cents").cast("bigint").alias("sum_cents"),
                )
            )
        # upsert only the keys this batch touched; the ledger entry rides
        # the merge manifest itself (the `extra` field published WITH the
        # commit — never an after-the-fact edit of an immutable manifest)
        touched = merged.join(
            delta.select("event_type"), "event_type", "left_semi"
        )
        ledger = {"stream_id": sid, "stream_batch_id": batch_id}
        if t.latest_version() is None:
            t.commit(touched, extra=ledger)
        else:
            t.merge_upsert(
                batch_df.sparkSession, touched, ("event_type",), extra=ledger
            )

    def add_file(df: DataFrame, name: str) -> None:
        tmp = os.path.join(src, f"_tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, os.path.join(src, f"{name}.parquet"))
        shutil.rmtree(tmp)

    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    half = F.col("event_id") % 2

    def drain() -> None:
        (
            spark.readStream.schema("event_id BIGINT, event_type STRING, value DOUBLE")
            .parquet(src)
            .writeStream.foreachBatch(refresh)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    add_file(ev.filter(half == 0), "half0")
    drain()
    add_file(ev.filter(half == 1), "half1")
    drain()
    # crash-replay of batch 0: must be skipped, or sum_cents doubles
    refresh(ev.filter(half == 0), 0)

    return t.read(spark).select("event_type", "n_events", "sum_cents")
