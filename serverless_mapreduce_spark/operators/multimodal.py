"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata (extension scope — the reference is text/KV only).

Design stance for 100 TB of media:
- the payload is an opaque ``binary`` column + a typed metadata struct;
  everything that does NOT need decoding (sizing, hashing, frame slicing,
  filtering by metadata) stays JVM-side on built-in expressions;
- decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so
  bytes move Python-ward once per batch, not per row, and the operator
  pipelines with the scan (no shuffle — media ops are embarrassingly
  parallel; partitioning stays whatever the scan chose);
- real codecs (PIL/librosa/av) are NOT in this container, so the actual
  decode is stubbed: ``decode_image`` raises NotImplementedError unless the
  library import succeeds, and ``fake_decode`` is the deterministic stand-in
  that keeps the full plumbing (schema, batch shape, UDF signature)
  testable. Swap ``decoder=`` to go live.

The fixture corpus has no binary column, so ``media_table`` derives a
deterministic payload from ``documents.text`` (UTF-8 bytes — the corpus is
pure ASCII, which is what lets the DuckDB oracle reproduce byte math via
codepoints).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.registry import query

FRAME_BYTES = 16  # pretend "frame" size for the sampling operator
FRAME_STEP = 4    # keep every 4th frame

MEDIA_TYPES = ("image", "audio", "video")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media_type, payload binary, meta struct).
    media_type cycles deterministically; meta carries the typed fields a
    real ingest would parse from container headers."""
    docs = table(spark, sf_dir, "documents")
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("synthetic/v1").alias("fmt"),
        ).alias("meta"),
    )


# --- metadata + hashing: no decode needed, stays JVM-side --------------------

@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           length(text) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction over the opaque payload: size + content
    digest, zero decoding. (md5 of the binary payload == DuckDB's md5 of the
    text because the payload is the text's UTF-8 bytes.)"""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


# --- frame sampling: binary slicing with built-ins ---------------------------

@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id, frame_idx,
           md5(substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5,
           least({FRAME_BYTES}, length(text) - frame_idx * {FRAME_BYTES}) AS frame_len
    FROM (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT), {FRAME_STEP}))
               AS frame_idx
      FROM documents
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling without decode: treat the payload as fixed-size frames
    and keep every FRAME_STEP-th — pure binary ``substring`` + ``explode``
    inside codegen. The real-video analog (keyframe extraction) swaps the
    slicer for a mapInPandas decoder; the distribution story is identical
    (narrow, no shuffle)."""
    m = media_table(spark, sf_dir)
    n_frames = F.ceil(F.col("meta.n_bytes") / F.lit(float(FRAME_BYTES))).cast("long")
    frames = m.select(
        "doc_id",
        "payload",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(FRAME_STEP))).alias("frame_idx"),
    )
    frame = F.substring(
        F.col("payload"), F.col("frame_idx") * FRAME_BYTES + 1, FRAME_BYTES
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(frame).alias("frame_md5"),
        F.least(
            F.lit(FRAME_BYTES), F.col("n_bytes") - F.col("frame_idx") * FRAME_BYTES
        ).alias("frame_len"),
    )


# --- decode / feature extraction: the Python boundary ------------------------

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "sum_bytes bigint, n_bytes bigint"
)


def fake_decode(media_type: str, payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a codec: 'dimensions' from the header
    bytes, 'signal energy' as the byte sum. Exactly reproducible in SQL —
    which is what makes the plumbing oracle-checkable."""
    w = (payload[0] % 64) + 1 if len(payload) >= 1 else 1
    h = (payload[1] % 64) + 1 if len(payload) >= 2 else 1
    return {
        "width": w,
        "height": h,
        "sum_bytes": sum(payload),
        "n_bytes": len(payload),
    }


def decode_image(media_type: str, payload: bytes) -> dict[str, Any]:
    """The real decoder slot. Image/audio libraries are not available in
    this environment; when they are, this returns the same dict shape from
    actual pixels/samples."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - the only path here
        raise NotImplementedError(
            "real media decoding requires PIL/librosa/av, not present in "
            "this environment; use fake_decode or install codecs"
        ) from exc
    raise NotImplementedError("real decode path not wired yet")


def extract_features(
    media: DataFrame,
    decoder: Callable[[str, bytes], dict[str, Any]] = fake_decode,
) -> DataFrame:
    """The decode/feature-extract operator: Arrow-batched mapInPandas over
    (doc_id, media_type, payload). One Python crossing per batch; output
    schema is fixed so downstream stays relational."""
    import pandas as pd

    def gen(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            feats = [decoder(t, bytes(p)) for t, p in zip(pdf["media_type"], pdf["payload"])]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        gen, FEATURE_SCHEMA
    )


_SQL_CODES = "list_transform(string_split(text, ''), ch -> CAST(unicode(ch) AS BIGINT))"


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           CAST((unicode(substring(text, 1, 1)) % 64) + 1 AS INT) AS width,
           CAST((unicode(substring(text, 2, 1)) % 64) + 1 AS INT) AS height,
           list_reduce(list_prepend(CAST(0 AS BIGINT), {_SQL_CODES}), (a, c) -> a + c)
             AS sum_bytes,
           length(text) AS n_bytes
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the mapInPandas plumbing with the
    deterministic fake decoder (ASCII corpus ⇒ byte values == codepoints,
    so the oracle rebuilds the same features in SQL)."""
    return extract_features(media_table(spark, sf_dir), decoder=fake_decode)
