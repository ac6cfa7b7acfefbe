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
- the decode path is REAL: documents are packed into genuine BMP/WAV
  containers (encode_bmp/encode_wav — correct magic, little-endian headers,
  stride padding) and parsed back by pure-Python decoders
  (decode_bmp/decode_wav) through the same mapInPandas plumbing; heavier
  codec libraries (PIL/librosa/av) slot into the identical batch shape.
  ``fake_decode`` remains as the trivial header-peek stand-in used by
  multimodal_features.

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
    # Guard the sequence: a zero-length payload has n_frames = 0 and
    # sequence(0, -1, step) throws at runtime; an empty array explodes to
    # zero rows — the oracle's range(0, 0, step) behavior.
    frame_seq = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(FRAME_STEP))
    ).otherwise(F.array().cast("array<long>"))
    frames = m.select(
        "doc_id",
        "payload",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.explode(frame_seq).alias("frame_idx"),
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


# --- real containers: BMP / WAV encode + pure-Python decode -------------------
#
# The genuine decode path. encode_bmp/encode_wav build REAL containers
# (correct magic, little-endian header fields, 4-byte BMP row stride, RIFF
# chunk layout — a stock image viewer / audio player would open them), and
# decode_bmp/decode_wav parse them back by reading the container headers,
# not by trusting any side channel. The multimodal_decode query below pipes
# documents → encode (mapInPandas) → decode (mapInPandas); its DuckDB oracle
# recomputes the expected features from the generative parameters, so a
# parser that misreads a header field hash-mismatches immediately.

BMP_HEADER = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
WAV_HEADER = 44  # RIFF(12) + fmt(24) + data chunk header(8)
BMP_WIDTH_MOD = 31   # image width = doc_id % 31 + 1
WAV_RATE_MOD = 9     # sample_rate = 8000 + (doc_id % 9) * 1000


def encode_bmp(payload: bytes, width: int) -> bytes:
    """Pack ``payload`` as a real 24-bit BMP of the given width: height =
    ceil(len/ (3·width)), pixel rows zero-padded to the payload and to the
    BMP's mandatory 4-byte row stride."""
    import struct

    row_raw = width * 3
    stride = (row_raw + 3) // 4 * 4
    height = (len(payload) + row_raw - 1) // row_raw if payload else 0
    body = bytearray()
    for r in range(height):
        row = payload[r * row_raw : (r + 1) * row_raw]
        body += row + b"\x00" * (stride - len(row))
    size = BMP_HEADER + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, BMP_HEADER) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header + body)


def decode_bmp(payload: bytes) -> dict[str, Any]:
    """Parse a 24-bit BMP: validate the magic, read width/height/bpp/data
    offset from the header, then walk rows (stride-aware) summing the pixel
    bytes — padding bytes are excluded by the stride arithmetic.

    Error contract (sniff_decode): malformed input raises ValueError, never
    a silent wrong answer — truncated headers/pixel data and non-24-bit
    variants are rejected; a negative biHeight (top-down BMP) is decoded as
    |height| rows in stored order (for a whole-image checksum, row order is
    immaterial)."""
    import struct

    if len(payload) < BMP_HEADER:
        raise ValueError(f"truncated BMP header ({len(payload)} bytes)")
    magic, size, _, _, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, width, height, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    n_rows = abs(height)
    row_raw = width * 3
    stride = (row_raw + 3) // 4 * 4
    if n_rows and len(payload) < data_off + (n_rows - 1) * stride + row_raw:
        raise ValueError("truncated BMP pixel data")
    pix_sum = 0
    for r in range(n_rows):
        off = data_off + r * stride
        pix_sum += sum(payload[off : off + row_raw])
    return {"width": width, "height": n_rows, "checksum": pix_sum}


def encode_wav(payload: bytes, sample_rate: int) -> bytes:
    """Pack ``payload`` as a real 8-bit PCM mono WAV (one byte = one
    sample) at the given sample rate."""
    import struct

    n = len(payload)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + n, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate, 1, 8)
        + struct.pack("<4sI", b"data", n)
        + payload
    )


def decode_wav(payload: bytes) -> dict[str, Any]:
    """Parse a PCM WAV: validate RIFF/WAVE magic, read the fmt chunk
    (format, channels, rate, bits), then the data chunk size and sample sum."""
    import struct

    if len(payload) < WAV_HEADER:
        raise ValueError(f"truncated WAV header ({len(payload)} bytes)")
    riff, _, wave = struct.unpack_from("<4sI4s", payload, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt, _, audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
        "<4sIHHIIHH", payload, 12
    )
    if fmt != b"fmt " or audio_fmt != 1 or channels != 1 or bits != 8:
        raise ValueError("unsupported WAV layout")
    data, n = struct.unpack_from("<4sI", payload, 36)
    if data != b"data":
        raise ValueError("missing data chunk")
    if len(payload) < WAV_HEADER + n:
        raise ValueError("truncated WAV sample data")
    samples = payload[WAV_HEADER : WAV_HEADER + n]
    return {"sample_rate": rate, "n_samples": n, "checksum": sum(samples)}


RESIZE_TO = 16  # output side length of the resize operator


def resize_bmp(payload: bytes, out_w: int = RESIZE_TO, out_h: int = RESIZE_TO):
    """Nearest-neighbor resize of a 24-bit BMP to (out_w, out_h): parse the
    container, reassemble the pixel grid (stride-aware), sample source
    pixel (r·h//out_h, c·w//out_w) per output pixel. Returns the original
    dims and the resized RGB checksum — real pixel indexing, the CPU shape
    of any thumbnailing stage."""
    import struct

    import numpy as np

    meta = decode_bmp(payload)  # validates magic/bpp
    w, h = meta["width"], meta["height"]
    (data_off,) = struct.unpack_from("<I", payload, 10)
    row_raw = w * 3
    stride = (row_raw + 3) // 4 * 4
    if h == 0:
        return {"width": w, "height": h, "resized_checksum": 0}
    buf = np.frombuffer(payload, dtype=np.uint8)
    rows = np.stack(
        [buf[data_off + r * stride : data_off + r * stride + row_raw] for r in range(h)]
    ).reshape(h, w, 3)
    rr = np.arange(out_h) * h // out_h
    cc = np.arange(out_w) * w // out_w
    resized = rows[rr][:, cc]                      # (out_h, out_w, 3)
    return {"width": w, "height": h, "resized_checksum": int(resized.sum())}


@query(
    "multimodal_resize",
    priority=0,
    oracle=f"""
    WITH img AS (
      SELECT doc_id, text, length(text) AS len,
             CAST(doc_id % {BMP_WIDTH_MOD} + 1 AS INT) AS w,
             CAST(ceil(length(text) / ((doc_id % {BMP_WIDTH_MOD} + 1) * 3.0)) AS INT) AS h
      FROM documents WHERE doc_id % 2 = 0
    ), px AS (
      SELECT doc_id, w, h,
             -- source byte of output pixel (r, c, k): nearest-neighbor row/col,
             -- zero beyond the payload (the encoder's zero padding)
             ((r.r * h) // {RESIZE_TO}) * (w * 3) + ((c.c * w) // {RESIZE_TO}) * 3 + k.k AS idx,
             len, text
      FROM img,
           (SELECT unnest(range(0, {RESIZE_TO})) AS r) r,
           (SELECT unnest(range(0, {RESIZE_TO})) AS c) c,
           (SELECT unnest(range(0, 3)) AS k) k
      WHERE h > 0
    ), summed AS (
      SELECT doc_id, w AS width, h AS height,
             SUM(CASE WHEN idx < len THEN unicode(substring(text, CAST(idx AS INT) + 1, 1))
                      ELSE 0 END) AS resized_checksum
      FROM px GROUP BY 1, 2, 3
    )
    SELECT doc_id, width, height, CAST(resized_checksum AS BIGINT) AS resized_checksum
    FROM summed
    UNION ALL
    SELECT doc_id, w AS width, 0 AS height, CAST(0 AS BIGINT) AS resized_checksum
    FROM img WHERE h = 0
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize through the real container path: encode each image doc
    as a genuine BMP, then nearest-neighbor downsample to
    {RESIZE_TO}×{RESIZE_TO} in an Arrow mapInPandas stage (numpy fancy
    indexing over the stride-decoded pixel grid). The oracle recomputes
    every sampled byte position arithmetically, so both the header parsing
    and the resampling index math are value-checked. Narrow, no shuffle."""
    import pandas as pd

    # Filter BELOW the encode stage (see media_blob_table): encoding the odd
    # (WAV) half only to discard it would double the Python work.
    even_docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    blobs = media_blob_table(spark, sf_dir, docs=even_docs)

    def gen(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            rows = [
                {"doc_id": d, **resize_bmp(bytes(b))}
                for d, b in zip(pdf["doc_id"], pdf["blob"])
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "resized_checksum"]
            )

    return blobs.mapInPandas(
        gen, "doc_id bigint, width int, height int, resized_checksum bigint"
    )


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


DECODE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "sample_rate int, n_samples bigint, checksum bigint, n_bytes bigint"
)


def media_blob_table(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """documents → (doc_id, blob): REAL media containers — even doc_ids
    become 24-bit BMPs (width doc_id%31+1, pixels = the UTF-8 text bytes),
    odd doc_ids become 8-bit PCM WAVs (rate 8000+doc_id%9·1000, samples =
    the text bytes). Ingest-side Python (mapInPandas): container packing is
    inherently per-item byte work, batched through Arrow once.

    Callers that only want a subset must pass a pre-filtered ``docs`` frame:
    Catalyst cannot push a filter through MapInPandasExec, so filtering the
    *output* would pay the Python encode for rows that are then dropped."""
    import pandas as pd

    if docs is None:
        docs = table(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "text")

    def gen(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            blobs = [
                encode_bmp(t.encode("utf-8"), int(d) % BMP_WIDTH_MOD + 1)
                if d % 2 == 0
                else encode_wav(t.encode("utf-8"), 8000 + int(d) % WAV_RATE_MOD * 1000)
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "blob": blobs})

    return docs.mapInPandas(gen, "doc_id bigint, blob binary")


def sniff_decode(payload: bytes) -> dict[str, Any]:
    """Dispatch on the container magic — the decoder sees only bytes."""
    if payload[:2] == b"BM":
        return {"media_type": "image", **decode_bmp(payload)}
    if payload[:4] == b"RIFF":
        return {"media_type": "audio", **decode_wav(payload)}
    raise ValueError("unknown container")


@query(
    "multimodal_decode",
    priority=0,
    oracle=f"""
    WITH t AS (
      SELECT doc_id, length(text) AS len,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''), ch -> CAST(unicode(ch) AS BIGINT))),
               (a, c) -> a + c) AS byte_sum,
             CAST(doc_id % {BMP_WIDTH_MOD} + 1 AS INT) AS w,
             CAST(8000 + (doc_id % {WAV_RATE_MOD}) * 1000 AS INT) AS rate
      FROM documents
    ), img AS (
      SELECT doc_id, 'image' AS media_type, w AS width,
             CAST(ceil(len / (w * 3.0)) AS INT) AS height,
             CAST(NULL AS INT) AS sample_rate, CAST(NULL AS BIGINT) AS n_samples,
             byte_sum AS checksum,
             {BMP_HEADER} + ((w * 3 + 3) - (w * 3 + 3) % 4)
               * CAST(ceil(len / (w * 3.0)) AS BIGINT) AS n_bytes
      FROM t WHERE doc_id % 2 = 0
    ), aud AS (
      SELECT doc_id, 'audio' AS media_type, CAST(NULL AS INT) AS width,
             CAST(NULL AS INT) AS height, rate AS sample_rate,
             CAST(len AS BIGINT) AS n_samples, byte_sum AS checksum,
             {WAV_HEADER} + CAST(len AS BIGINT) AS n_bytes
      FROM t WHERE doc_id % 2 = 1
    )
    SELECT * FROM img UNION ALL SELECT * FROM aud
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genuine decode path: documents are packed into real BMP/WAV
    containers, then a second Arrow-batched mapInPandas stage parses those
    containers back — magic validation, little-endian header reads,
    stride-aware pixel walks — emitting typed features. The oracle rebuilds
    the expected features from the generative parameters, so every header
    field the parser reads is value-checked. Narrow end-to-end (encode and
    decode pipeline with the scan, no shuffle); at 100 TB the decoders are
    swapped for real codec libraries with the identical batch shape."""
    import pandas as pd

    blobs = media_blob_table(spark, sf_dir)

    def gen(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                payload = bytes(b)
                feats = sniff_decode(payload)
                rows.append(
                    {
                        "doc_id": d,
                        "media_type": feats["media_type"],
                        "width": feats.get("width"),
                        "height": feats.get("height"),
                        "sample_rate": feats.get("sample_rate"),
                        "n_samples": feats.get("n_samples"),
                        "checksum": feats["checksum"],
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(gen, DECODE_SCHEMA)


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


# --- audio feature extraction over the decoded sample stream -------------------

@query(
    "multimodal_audio_features",
    oracle=f"""
    WITH a AS (
      SELECT doc_id,
             8000 + (doc_id % {WAV_RATE_MOD}) * 1000 AS sample_rate,
             list_transform(string_split(text, ''),
                            ch -> CAST(unicode(ch) AS BIGINT)) AS s
      FROM documents
      WHERE doc_id % 2 = 1
    )
    SELECT doc_id,
           CAST(sample_rate AS BIGINT) AS sample_rate,
           CAST(len(s) AS BIGINT) AS n_samples,
           CAST(list_max(s) AS BIGINT) AS peak,
           CAST(list_min(s) AS BIGINT) AS trough,
           CAST(list_sum(list_transform(s, x -> (x - 128) * (x - 128)))
                AS BIGINT) AS energy,
           CAST(COALESCE(list_sum(list_transform(
                  list_zip(s, s[2:]),
                  p -> CASE WHEN p[2] IS NOT NULL
                             AND (p[1] - 128) * (p[2] - 128) < 0
                        THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings
    FROM a
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO FEATURE EXTRACTION through the real decode path: the WAV
    containers (odd doc_ids in media_blob_table) are parsed by decode_wav
    — magic/fmt validation, data-chunk walk — and the 8-bit PCM sample
    stream then yields the librosa-style scalar features a training
    pipeline filters on: peak/trough amplitude, midpoint-centered ENERGY
    (Σ(s−128)², the RMS numerator kept as an exact integer — no sqrt, no
    float, so the driver hash-matches), and ZERO CROSSINGS of the
    midpoint (strict sign changes of s−128 — the classic voiced/unvoiced
    discriminator). Feature math is VECTORIZED numpy over each Arrow
    batch (one frombuffer + three array ops per blob, no per-sample
    Python loop); a real mel/MFCC extractor slots into the identical
    mapInPandas batch shape. The audio filter is applied on doc_id
    BEFORE the blob encode (media_blob_table's contract: Catalyst cannot
    push filters through MapInPandasExec). No shuffle anywhere — the
    whole operator pipelines with the scan. The oracle rebuilds every
    feature from codepoints (ASCII corpus ⇒ sample bytes == codepoints),
    so a decoder or feature bug fails the value hash, not just counts."""
    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    blobs = media_blob_table(spark, sf_dir, docs=docs)

    def feats(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                meta = decode_wav(bytes(b))
                s = np.frombuffer(
                    bytes(b), dtype=np.uint8, count=meta["n_samples"],
                    offset=WAV_HEADER,
                ).astype(np.int64) - 128
                # zero-length data chunk (empty source text): extrema and
                # energy are NULL (matching the oracle's list_max([])),
                # crossings 0 (the oracle COALESCEs them)
                empty = len(s) == 0
                rows.append(
                    {
                        "doc_id": d,
                        "sample_rate": meta["sample_rate"],
                        "n_samples": meta["n_samples"],
                        "peak": None if empty else int(s.max()) + 128,
                        "trough": None if empty else int(s.min()) + 128,
                        "energy": None if empty else int((s * s).sum()),
                        "zero_crossings": 0
                        if empty
                        else int(((s[:-1] * s[1:]) < 0).sum()),
                    }
                )
            # zero-row batch: pd.DataFrame([]) has NO columns, so astype
            # would KeyError — emit nothing and let the next batch speak
            if not rows:
                continue
            # nullable Int64: plain int columns silently become float64
            # when any row holds None, and Arrow then refuses the cast
            yield pd.DataFrame(rows).astype(
                {"peak": "Int64", "trough": "Int64", "energy": "Int64"}
            )

    return blobs.mapInPandas(
        feats,
        "doc_id bigint, sample_rate bigint, n_samples bigint, peak bigint, "
        "trough bigint, energy bigint, zero_crossings bigint",
    )


# --- perceptual-hash image dedup ------------------------------------------------

PHASH_SIDE = 8  # aHash grid: 8x8 = 64 bits


def ahash_bmp(payload: bytes) -> str:
    """AVERAGE HASH (aHash) of a 24-bit BMP as a 64-char bit string:
    nearest-neighbor downsample to {PHASH_SIDE}x{PHASH_SIDE} (the
    resize_bmp sampling grid, file-row order), per-cell gray = channel
    SUM (monotone-equivalent to the mean, keeps everything integer), bit
    = 1 iff 64*gray > total — exact integer threshold, no float mean.
    Empty image (height 0) hashes to all zeros."""
    import struct

    import numpy as np

    meta = decode_bmp(payload)
    w, h = meta["width"], meta["height"]
    if h == 0:
        return "0" * (PHASH_SIDE * PHASH_SIDE)
    (data_off,) = struct.unpack_from("<I", payload, 10)
    row_raw = w * 3
    stride = (row_raw + 3) // 4 * 4
    buf = np.frombuffer(payload, dtype=np.uint8)
    rows = np.stack(
        [buf[data_off + r * stride : data_off + r * stride + row_raw] for r in range(h)]
    ).reshape(h, w, 3)
    rr = np.arange(PHASH_SIDE) * h // PHASH_SIDE
    cc = np.arange(PHASH_SIDE) * w // PHASH_SIDE
    gray = rows[rr][:, cc].sum(axis=2, dtype=np.int64)   # (8, 8)
    total = int(gray.sum())
    bits = (PHASH_SIDE * PHASH_SIDE * gray > total).astype(np.uint8)
    return "".join("1" if b else "0" for b in bits.reshape(-1))


# doc_id → 64-char aHash bit string as a reusable oracle CTE chain
# (`all_ph` is the final CTE): shared by the dedup grouping and the
# hamming-banded pair query.
_SQL_PHASH_CTES = f"""
    img AS (
      SELECT doc_id, text, length(text) AS len,
             CAST(doc_id % {BMP_WIDTH_MOD} + 1 AS INT) AS w,
             CAST(ceil(length(text) / ((doc_id % {BMP_WIDTH_MOD} + 1) * 3.0)) AS INT) AS h
      FROM documents WHERE doc_id % 2 = 0
    ), px AS (
      SELECT doc_id, r.r, c.c,
             ((r.r * h) // {PHASH_SIDE}) * (w * 3)
               + ((c.c * w) // {PHASH_SIDE}) * 3 + k.k AS idx,
             len, text
      FROM img,
           (SELECT unnest(range(0, {PHASH_SIDE})) AS r) r,
           (SELECT unnest(range(0, {PHASH_SIDE})) AS c) c,
           (SELECT unnest(range(0, 3)) AS k) k
      WHERE h > 0
    ), grays AS (
      SELECT doc_id, r, c,
             SUM(CASE WHEN idx < len
                      THEN unicode(substring(text, CAST(idx AS INT) + 1, 1))
                      ELSE 0 END) AS gray
      FROM px GROUP BY 1, 2, 3
    ), tot AS (
      SELECT doc_id, SUM(gray) AS total FROM grays GROUP BY 1
    ), ph AS (
      SELECT g.doc_id,
             string_agg(
               CASE WHEN {PHASH_SIDE * PHASH_SIDE} * g.gray > t.total
                    THEN '1' ELSE '0' END,
               '' ORDER BY g.r, g.c) AS phash
      FROM grays g JOIN tot t USING (doc_id)
      GROUP BY g.doc_id
    ), all_ph AS (
      SELECT doc_id, phash FROM ph
      UNION ALL
      SELECT doc_id, repeat('0', {PHASH_SIDE * PHASH_SIDE}) AS phash
      FROM img WHERE h = 0
    )
"""


@query(
    "multimodal_phash_dedup",
    priority=150,
    oracle=f"""
    WITH {_SQL_PHASH_CTES}
    SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_imgs, MIN(doc_id) AS canonical_doc
    FROM all_ph GROUP BY phash
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL-HASH IMAGE DEDUP — the multimodal twin of minhash text
    dedup: every image doc (even doc_ids, genuine BMP containers) gets an
    aHash (downsample to {PHASH_SIDE}x{PHASH_SIDE}, threshold each cell
    against the image mean), and images are grouped by hash — identical
    perceptual signature ⇒ duplicate cluster, min doc_id canonical. At
    100 TB this is the standard image-dedup first pass (aHash/pHash
    bucketing, then pairwise verify inside buckets; a hamming-tolerant
    variant bands the 64 bits exactly like simhash_pairs bands text
    fingerprints). Plan: the decode+hash is one Arrow mapInPandas pass
    fused with the blob build (no shuffle), then one hash-keyed
    aggregation. The oracle recomputes every sampled byte position
    arithmetically from the text codepoints (ASCII corpus ⇒ byte ==
    codepoint, the multimodal_resize convention), so the container
    parsing, the sampling grid, and the integer threshold are all
    value-checked; the threshold uses 64*gray > total so no division or
    float mean exists on either side."""
    return _phash_table(spark, sf_dir).groupBy("phash").agg(
        F.count("*").cast("bigint").alias("n_imgs"),
        F.min("doc_id").alias("canonical_doc"),
    )


def _phash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash) for every image doc — the decode+hash Arrow pass
    shared by the dedup grouping and the hamming-banded pair query. At
    100 TB this is a maintained signature table, like the minhash sigs."""
    import pandas as pd

    even_docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    blobs = media_blob_table(spark, sf_dir, docs=even_docs)

    def gen(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            rows = [
                {"doc_id": d, "phash": ahash_bmp(bytes(b))}
                for d, b in zip(pdf["doc_id"], pdf["blob"])
            ]
            if not rows:
                continue
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return blobs.mapInPandas(gen, "doc_id bigint, phash string")


PHASH_BANDS = 4        #: pigeonhole: B bands catch every pair with hamming <= B-1
PHASH_HAM_MAX = 3      #: must stay < PHASH_BANDS for exact recall
#: Load-shedding cap: segment buckets holding more docs than this are
#: skipped during candidate generation. aHash saturates on all-dark /
#: all-light images (segments of all-1s/all-0s), and one such bucket is
#: O(n_bucket^2) candidate pairs — the quadratic hot key that killed the
#: uncapped run at sf0.1 (291-doc bucket -> 42k pairs alone; 117k pairs
#: total for 2500 docs). Pairs that ONLY collide in a hot bucket are
#: overwhelmingly identical-hash pairs, which the exact-grouping
#: multimodal_phash_dedup already owns; the documented bias is that
#: near-dup pairs of saturated hashes may be missed. Same pattern as the
#: winnowing hot-fingerprint cap and the co-purchase BASKET_CAP.
PHASH_BUCKET_CAP = 32


@query(
    "multimodal_phash_pairs",
    priority=150,
    oracle=f"""
    WITH {_SQL_PHASH_CTES},
    bands AS (
      SELECT doc_id, phash, b.b,
             substr(phash, b.b * {64 // PHASH_BANDS} + 1,
                    {64 // PHASH_BANDS}) AS seg
      FROM all_ph,
           (SELECT CAST(unnest(range(0, {PHASH_BANDS})) AS INT) AS b) b
    ),
    sized AS (
      SELECT *, COUNT(*) OVER (PARTITION BY b, seg) AS bucket_n FROM bands
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             x.phash AS ph_a, y.phash AS ph_b
      FROM sized x JOIN sized y
        ON x.b = y.b AND x.seg = y.seg AND x.doc_id < y.doc_id
      WHERE x.bucket_n <= {PHASH_BUCKET_CAP}
    )
    SELECT doc_a, doc_b, CAST(ham AS BIGINT) AS hamming
    FROM (
      SELECT doc_a, doc_b,
             list_reduce(list_transform(range(1, 65),
               i -> CASE WHEN substr(ph_a, i, 1) <> substr(ph_b, i, 1)
                         THEN 1 ELSE 0 END), (x, y) -> x + y) AS ham
      FROM cand
    ) WHERE ham <= {PHASH_HAM_MAX}
    """,
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUPLICATE IMAGE PAIRS within hamming {PHASH_HAM_MAX} of each
    other's aHash — the tolerant second stage the exact-grouping dedup
    docstring promises, and the image twin of simhash_pairs: split the
    64-bit hash into {PHASH_BANDS} segments; by pigeonhole, any pair
    within hamming {PHASH_HAM_MAX} < {PHASH_BANDS} agrees on at least one
    whole segment, so the self-join on (segment index, segment bits)
    touches only colliding buckets — and buckets larger than
    PHASH_BUCKET_CAP are load-shed (see the constant for the quadratic
    hot-key story and the documented recall bias). Candidates are
    verified with the exact hamming distance computed as
    Σ bit_count(seg_a XOR seg_b) over the four 16-bit segment INTEGERS —
    pure codegen bit ops (the 64-substring fold this replaces was the
    verify bottleneck at sf0.1); the oracle keeps the character fold,
    which must agree bit-for-bit. The signature table is persisted once
    and feeds both join sides."""
    from serverless_mapreduce_spark.caching import persist_tracked

    seg_len = 64 // PHASH_BANDS
    ph = persist_tracked(
        _phash_table(spark, sf_dir).select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1)),
                lambda b: F.conv(
                    F.substring(F.col("phash"), b * seg_len + 1, seg_len), 2, 10
                ).cast("bigint"),
            ).alias("segs"),
        )
    )
    from pyspark.sql import Window

    bands = ph.select(
        "doc_id", "segs", F.posexplode("segs").alias("b", "seg")
    )
    sized = bands.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("b", "seg"))
    )
    x, y = sized.alias("x"), sized.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.seg") == F.col("y.seg"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .filter(F.col("x.bucket_n") <= PHASH_BUCKET_CAP)
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.segs").alias("segs_a"),
            F.col("y.segs").alias("segs_b"),
        )
        .distinct()
    )
    ham = F.aggregate(
        F.sequence(F.lit(1), F.lit(PHASH_BANDS)),
        F.lit(0).cast("long"),
        lambda acc, m: acc
        + F.bit_count(
            F.element_at(F.col("segs_a"), m.cast("int")).bitwiseXOR(
                F.element_at(F.col("segs_b"), m.cast("int"))
            )
        ),
    )
    return (
        cand.withColumn("ham", ham)
        .filter(F.col("ham") <= PHASH_HAM_MAX)
        .select("doc_a", "doc_b", F.col("ham").cast("bigint").alias("hamming"))
    )


# --- augmentation: horizontal flip -------------------------------------------

def flip_bmp_weighted_checksum(payload: bytes) -> dict[str, Any]:
    """Parse a 24-bit BMP (same error contract as decode_bmp), flip it
    HORIZONTALLY (reverse pixel order within each row, bytes within a
    pixel kept in order), and return the POSITION-WEIGHTED checksum
    sum((i+1) * byte_i) over the flipped raw pixel bytes (stride
    padding excluded). Weighted, because a plain byte sum is invariant
    under any permutation — it would 'verify' a flip that did nothing."""
    import struct

    if len(payload) < BMP_HEADER:
        raise ValueError(f"truncated BMP header ({len(payload)} bytes)")
    magic, _, _, _, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, width, height, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    n_rows = abs(height)
    row_raw = width * 3
    stride = (row_raw + 3) // 4 * 4
    if n_rows and len(payload) < data_off + (n_rows - 1) * stride + row_raw:
        raise ValueError("truncated BMP pixel data")
    wsum, i = 0, 0
    for r in range(n_rows):
        off = data_off + r * stride
        row = payload[off : off + row_raw]
        for c in range(width - 1, -1, -1):
            px = row[c * 3 : c * 3 + 3]
            for b in px:
                i += 1
                wsum += i * b
    return {"width": width, "height": n_rows, "flip_wsum": wsum}


@query(
    "multimodal_augment_flip",
    priority=150,
    oracle=f"""
    WITH img AS (
      SELECT doc_id, text, length(text) AS len,
             CAST(doc_id % {BMP_WIDTH_MOD} + 1 AS INT) AS w,
             CAST(ceil(length(text) / ((doc_id % {BMP_WIDTH_MOD} + 1) * 3.0)) AS INT) AS h
      FROM documents WHERE doc_id % 2 = 0
    ), bytes_ AS (
      SELECT doc_id, w, h, len, text,
             unnest(range(0, CAST(h AS BIGINT) * w * 3)) AS i
      FROM img
    ), px AS (
      SELECT doc_id, w, h, len, text,
             -- output byte i (1-based weight); source byte = same row,
             -- mirrored column, same byte-within-pixel
             i + 1 AS wpos,
             (i // (w * 3)) * (w * 3)
               + (w - 1 - ((i % (w * 3)) // 3)) * 3
               + (i % 3) AS src
      FROM bytes_
    ), summed AS (
      SELECT doc_id, w AS width, h AS height,
             SUM(wpos * CASE WHEN src < len
                   THEN unicode(substring(text, CAST(src AS INT) + 1, 1))
                   ELSE 0 END) AS flip_wsum
      FROM px GROUP BY 1, 2, 3
    )
    SELECT doc_id, width, height, CAST(flip_wsum AS BIGINT) AS flip_wsum
    FROM summed
    UNION ALL
    SELECT doc_id, w AS width, 0 AS height, CAST(0 AS BIGINT) AS flip_wsum
    FROM img WHERE h = 0
    """,
)
def multimodal_augment_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE AUGMENTATION through the REAL container path: horizontal
    flip of every BMP (the canonical cheap augmentation a vision
    training pipeline applies at ingest), verified by a POSITION-
    WEIGHTED checksum — a plain pixel sum is permutation-invariant and
    would pass even if the flip were a no-op; the weighted sum pins the
    exact output byte ORDER. Same plumbing contract as decode/resize:
    pre-filter to even doc_ids BEFORE the Arrow pass (Catalyst cannot
    push filters through MapInPandasExec), one mapInPandas over the
    encoded blobs, genuine struct parse + per-row pixel reversal. The
    oracle replays the flip arithmetically from the synthesis formula
    (output position -> mirrored source byte of the text payload) —
    integer positions and code points only. At 100 TB augmentation
    rides the same batched decode pass as feature extraction — one scan,
    k augmented outputs."""
    import pandas as pd

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    blobs = media_blob_table(spark, sf_dir, docs)

    def gen(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            rows = [
                {"doc_id": int(d), **flip_bmp_weighted_checksum(bytes(b))}
                for d, b in zip(pdf["doc_id"], pdf["blob"])
            ]
            if rows:
                yield pd.DataFrame(rows)
            else:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "width": pd.Series(dtype="int32"),
                        "height": pd.Series(dtype="int32"),
                        "flip_wsum": pd.Series(dtype="int64"),
                    }
                )

    return blobs.mapInPandas(
        gen, "doc_id bigint, width int, height int, flip_wsum bigint"
    )


# --- augmentation: audio downsample ------------------------------------------

DOWNSAMPLE_FACTOR = 2


def downsample_wav_weighted_checksum(payload: bytes) -> dict[str, Any]:
    """Parse a PCM WAV (decode_wav's error contract), DECIMATE by
    DOWNSAMPLE_FACTOR (keep every 2nd sample — the naive-but-honest
    resample for synthetic byte audio; a production pipeline low-pass
    filters first), and return the position-weighted checksum
    sum((j+1) * sample_j) over the decimated sequence plus the halved
    rate — weighted for the same no-op-detection reason as the flip."""
    import struct

    if len(payload) < WAV_HEADER:
        raise ValueError(f"truncated WAV header ({len(payload)} bytes)")
    riff, _, wave = struct.unpack_from("<4sI4s", payload, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt, _, audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
        "<4sIHHIIHH", payload, 12
    )
    if fmt != b"fmt " or audio_fmt != 1 or channels != 1 or bits != 8:
        raise ValueError("unsupported WAV layout")
    data, n = struct.unpack_from("<4sI", payload, 36)
    if data != b"data":
        raise ValueError("missing data chunk")
    if len(payload) < WAV_HEADER + n:
        raise ValueError("truncated WAV sample data")
    samples = payload[WAV_HEADER : WAV_HEADER + n]
    dec = samples[::DOWNSAMPLE_FACTOR]
    wsum = sum((j + 1) * b for j, b in enumerate(dec))
    return {
        "out_rate": rate // DOWNSAMPLE_FACTOR,
        "n_out_samples": len(dec),
        "ds_wsum": wsum,
    }


@query(
    "multimodal_audio_downsample",
    priority=150,
    oracle=f"""
    WITH wav AS (
      SELECT doc_id, text, length(text) AS len,
             CAST((8000 + doc_id % {WAV_RATE_MOD} * 1000)
                  // {DOWNSAMPLE_FACTOR} AS BIGINT) AS out_rate,
             CAST((length(text) + {DOWNSAMPLE_FACTOR} - 1)
                  // {DOWNSAMPLE_FACTOR} AS BIGINT) AS n_out_samples
      FROM documents WHERE doc_id % 2 = 1
    ), smp AS (
      SELECT doc_id, out_rate, n_out_samples, len, text,
             unnest(range(0, n_out_samples)) AS j
      FROM wav
    )
    SELECT doc_id, out_rate, n_out_samples,
           CAST(SUM((j + 1) * unicode(substring(
                  text, CAST(j * {DOWNSAMPLE_FACTOR} AS INT) + 1, 1)))
                AS BIGINT) AS ds_wsum
    FROM smp
    GROUP BY doc_id, out_rate, n_out_samples
    UNION ALL
    SELECT doc_id, out_rate, n_out_samples, CAST(0 AS BIGINT) AS ds_wsum
    FROM wav WHERE n_out_samples = 0
    """,
)
def multimodal_audio_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO AUGMENTATION twin of the image flip: decimate every WAV by
    2x through the REAL container path (struct parse, sample slice) and
    emit the halved rate + position-weighted checksum of the decimated
    sequence — pinning both WHICH samples survive (the even ones) and
    their ORDER. Same plumbing contract as the whole multimodal family:
    pre-filter to odd doc_ids before the Arrow pass, one mapInPandas
    over encoded blobs. The oracle replays the decimation from the
    synthesis formula (sample j of the output = text byte 2j) in pure
    integer arithmetic. At 100 TB resample/normalize/trim all ride the
    same batched decode pass."""
    import pandas as pd

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    blobs = media_blob_table(spark, sf_dir, docs)

    def gen(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            rows = [
                {"doc_id": int(d), **downsample_wav_weighted_checksum(bytes(b))}
                for d, b in zip(pdf["doc_id"], pdf["blob"])
            ]
            if rows:
                yield pd.DataFrame(rows)
            else:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "out_rate": pd.Series(dtype="int64"),
                        "n_out_samples": pd.Series(dtype="int64"),
                        "ds_wsum": pd.Series(dtype="int64"),
                    }
                )

    return blobs.mapInPandas(
        gen,
        "doc_id bigint, out_rate bigint, n_out_samples bigint, ds_wsum bigint",
    )
