"""Multimodal plumbing tests: real BMP/WAV codec roundtrips, container
validation, batch shapes, and the binary slicing ops (the oracle-checked
queries are covered by the parametrized oracle test)."""

from __future__ import annotations

import pytest

from serverless_mapreduce_spark.operators.multimodal import (
    BMP_HEADER,
    WAV_HEADER,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    fake_decode,
    media_blob_table,
    media_table,
    sniff_decode,
)


def test_media_table_schema(spark, sf_dir):
    m = media_table(spark, sf_dir)
    assert dict(m.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "payload": "binary",
        "meta": "struct<n_bytes:int,fmt:string>",
    }
    row = m.head()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)
    assert row.media_type in ("image", "audio", "video")


@pytest.mark.parametrize(
    ("data", "width"), [(b"hello world pixel data", 5), (b"abc", 1), (b"", 7), (b"x" * 100, 4)]
)
def test_bmp_roundtrip(data, width):
    blob = encode_bmp(data, width)
    row_raw = width * 3
    stride = (row_raw + 3) // 4 * 4
    height = (len(data) + row_raw - 1) // row_raw if data else 0
    assert blob[:2] == b"BM"
    assert len(blob) == BMP_HEADER + stride * height
    assert decode_bmp(blob) == {"width": width, "height": height, "checksum": sum(data)}


@pytest.mark.parametrize(("data", "rate"), [(b"audio bytes", 8000), (b"", 12000), (b"z" * 999, 16000)])
def test_wav_roundtrip(data, rate):
    blob = encode_wav(data, rate)
    assert blob[:4] == b"RIFF"
    assert len(blob) == WAV_HEADER + len(data)
    assert decode_wav(blob) == {"sample_rate": rate, "n_samples": len(data), "checksum": sum(data)}


def test_decoders_reject_foreign_containers():
    with pytest.raises(ValueError):
        decode_bmp(encode_wav(b"not an image", 8000))
    with pytest.raises(ValueError):
        decode_wav(encode_bmp(b"not audio", 4))
    with pytest.raises(ValueError):
        sniff_decode(b"\x89PNG\r\n")


def test_media_blob_table_builds_real_containers(spark, sf_dir):
    rows = media_blob_table(spark, sf_dir).orderBy("doc_id").limit(4).collect()
    for r in rows:
        blob = bytes(r.blob)
        magic = blob[:2] if r.doc_id % 2 == 0 else blob[:4]
        assert magic == (b"BM" if r.doc_id % 2 == 0 else b"RIFF")
        feats = sniff_decode(blob)
        assert feats["media_type"] == ("image" if r.doc_id % 2 == 0 else "audio")


def test_fake_decode_matches_plumbed_output(spark, sf_dir):
    m = media_table(spark, sf_dir)
    src = m.head()
    out = extract_features(m).filter(f"doc_id = {src.doc_id}").head()
    expected = fake_decode(src.media_type, bytes(src.payload))
    assert (out.width, out.height, out.sum_bytes, out.n_bytes) == (
        expected["width"],
        expected["height"],
        expected["sum_bytes"],
        expected["n_bytes"],
    )


def test_resize_bmp_nearest_neighbor():
    from serverless_mapreduce_spark.operators.multimodal import RESIZE_TO, encode_bmp, resize_bmp

    data = bytes(range(256)) * 3  # 768 bytes -> 16 rows at width 16
    blob = encode_bmp(data, 16)
    out = resize_bmp(blob)
    assert (out["width"], out["height"]) == (16, 16)
    # identity-size resize samples every pixel exactly once
    assert out["resized_checksum"] == sum(data)

    # upscale from a 1x1 image: every output pixel is the single source pixel
    one = encode_bmp(b"\x05\x06\x07", 1)
    up = resize_bmp(one)
    assert up == {
        "width": 1,
        "height": 1,
        "resized_checksum": (5 + 6 + 7) * RESIZE_TO * RESIZE_TO,
    }

    # empty payload -> zero-height image, zero checksum
    assert resize_bmp(encode_bmp(b"", 4))["resized_checksum"] == 0


def test_audio_features_zero_sample_wav(spark):
    """An empty-text odd doc encodes to a valid WAV with a 0-length data
    chunk: extrema/energy must be NULL (the oracle's list_max([])) and
    crossings 0 — not a numpy reduction crash."""
    from serverless_mapreduce_spark.operators.multimodal import (
        multimodal_audio_features,
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, "", "en", "web", 0), (3, "ab cd", "en", "web", 5)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        rows = {r["doc_id"]: r for r in multimodal_audio_features(spark, td).collect()}
    assert rows[1]["n_samples"] == 0
    assert rows[1]["peak"] is None and rows[1]["energy"] is None
    assert rows[1]["zero_crossings"] == 0
    assert rows[3]["n_samples"] == 5 and rows[3]["peak"] is not None


def test_ahash_bmp_bits_and_empty():
    """aHash: empty image hashes all-zero; a half-dark/half-light image has
    exactly the bright half's bits set (integer threshold 64*gray > total,
    no float mean)."""
    from serverless_mapreduce_spark.operators.multimodal import (
        PHASH_SIDE,
        ahash_bmp,
        encode_bmp,
    )

    assert ahash_bmp(encode_bmp(b"", 4)) == "0" * 64
    # 8x8 image, top 4 file-rows dark (0x00), bottom 4 bright (0xff):
    # nearest-neighbor is identity at equal size, so bits mirror the rows
    payload = bytes([0] * (8 * 8 * 3 // 2) + [255] * (8 * 8 * 3 // 2))
    bits = ahash_bmp(encode_bmp(payload, 8))
    assert bits == "0" * 32 + "1" * 32
    assert len(bits) == PHASH_SIDE * PHASH_SIDE


def test_phash_groups_identical_images(spark):
    """Two docs with identical text (→ identical BMPs) must share a phash
    group with the min doc_id canonical."""
    import os
    import tempfile

    from serverless_mapreduce_spark.operators.multimodal import (
        multimodal_phash_dedup,
    )

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [
                (2, "same image text", "en", "web", 15),
                (4, "different words here", "en", "web", 20),
                (64, "same image text", "en", "web", 15),
            ],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        rows = multimodal_phash_dedup(spark, td).collect()
    by_canon = {r["canonical_doc"]: r["n_imgs"] for r in rows}
    # doc 2 and 64: same text AND same width (2 % 31 + 1 == 64 % 31 + 1 == 3)
    assert by_canon.get(2) == 2
    assert by_canon.get(4) == 1


def test_flip_checksum_rejects_truncated_pixels():
    import pytest

    from serverless_mapreduce_spark.operators.multimodal import (
        encode_bmp,
        flip_bmp_weighted_checksum,
    )

    blob = encode_bmp(b"x" * 30, 3)
    ok = flip_bmp_weighted_checksum(blob)
    assert ok["flip_wsum"] > 0
    with pytest.raises(ValueError):
        flip_bmp_weighted_checksum(blob[:-4])


def test_downsample_checksum_rejects_truncated_samples():
    import pytest

    from serverless_mapreduce_spark.operators.multimodal import (
        downsample_wav_weighted_checksum,
        encode_wav,
    )

    blob = encode_wav(b"abcdef", 8000)
    out = downsample_wav_weighted_checksum(blob)
    # decimated samples: a, c, e -> weights 1,2,3
    assert out["n_out_samples"] == 3
    assert out["ds_wsum"] == 1 * ord("a") + 2 * ord("c") + 3 * ord("e")
    assert out["out_rate"] == 4000
    with pytest.raises(ValueError):
        downsample_wav_weighted_checksum(blob[:-2])


def test_flip_weighted_checksum_detects_flip():
    """The weighted checksum must DIFFER between original and flipped
    byte order for an asymmetric image (the whole point of weighting)."""
    from serverless_mapreduce_spark.operators.multimodal import (
        encode_bmp,
        flip_bmp_weighted_checksum,
    )

    payload = bytes(range(1, 19))  # 18 bytes -> 3px wide, 2 rows
    blob = encode_bmp(payload, 3)
    out = flip_bmp_weighted_checksum(blob)
    ident_wsum = sum((i + 1) * b for i, b in enumerate(payload))
    assert out["flip_wsum"] != ident_wsum
