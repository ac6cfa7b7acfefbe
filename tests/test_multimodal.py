"""Multimodal plumbing tests: stubbed decoder gating, batch shapes, and the
binary slicing ops (the oracle-checked queries are covered by the
parametrized oracle test)."""

from __future__ import annotations

import pytest

from serverless_mapreduce_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_decode,
    media_table,
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


def test_real_decoder_is_gated(spark):
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image("image", b"\x89PNG....")


def test_extract_features_with_real_decoder_fails_loudly(spark, sf_dir):
    df = extract_features(media_table(spark, sf_dir), decoder=decode_image)
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        df.head()


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
