"""Property-based checks (hypothesis) for the pure-Python codec layer:
arbitrary payloads must roundtrip through the real BMP/WAV containers, and
the resize index math must hold for any (payload, width) combination."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_mapreduce_spark.operators.multimodal import (
    BMP_HEADER,
    RESIZE_TO,
    WAV_HEADER,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_bmp,
    sniff_decode,
)

payloads = st.binary(min_size=0, max_size=2048)


@settings(max_examples=200, deadline=None)
@given(data=payloads, width=st.integers(min_value=1, max_value=64))
def test_bmp_roundtrip_any_payload(data: bytes, width: int):
    blob = encode_bmp(data, width)
    row_raw = width * 3
    stride = (row_raw + 3) // 4 * 4
    height = (len(data) + row_raw - 1) // row_raw if data else 0
    assert len(blob) == BMP_HEADER + stride * height
    out = decode_bmp(blob)
    assert out == {"width": width, "height": height, "checksum": sum(data)}
    assert sniff_decode(blob)["media_type"] == "image"


@settings(max_examples=200, deadline=None)
@given(data=payloads, rate=st.integers(min_value=1, max_value=192_000))
def test_wav_roundtrip_any_payload(data: bytes, rate: int):
    blob = encode_wav(data, rate)
    assert len(blob) == WAV_HEADER + len(data)
    out = decode_wav(blob)
    assert out == {"sample_rate": rate, "n_samples": len(data), "checksum": sum(data)}
    assert sniff_decode(blob)["media_type"] == "audio"


@settings(max_examples=200, deadline=None)
@given(data=payloads, width=st.integers(min_value=1, max_value=64))
def test_resize_checksum_matches_index_model(data: bytes, width: int):
    """resize_bmp must equal the oracle's arithmetic model: output pixel
    (r, c, k) samples payload byte (r·h//T)·3w + (c·w//T)·3 + k (zero
    beyond the payload — the encoder's padding)."""
    out = resize_bmp(encode_bmp(data, width))
    row_raw = width * 3
    h = (len(data) + row_raw - 1) // row_raw if data else 0
    expect = (
        sum(
            data[idx] if (idx := (r * h // RESIZE_TO) * row_raw + (c * width // RESIZE_TO) * 3 + k) < len(data) else 0
            for r in range(RESIZE_TO)
            for c in range(RESIZE_TO)
            for k in range(3)
        )
        if h
        else 0
    )
    assert out == {"width": width, "height": h, "resized_checksum": expect}


def test_pack_sequences_prefix_sum_invariants(spark, sf_dir):
    """docs_pack_sequences' two-phase distributed prefix sum must equal the
    sequential definition: sorted by doc_id, each start_offset is the sum
    of all earlier docs' n_tokens, and seq assignment follows from it."""
    from serverless_mapreduce_spark.operators.text import (
        PACK_WINDOW,
        docs_pack_sequences,
    )

    rows = sorted(
        docs_pack_sequences(spark, sf_dir).collect(), key=lambda r: r["doc_id"]
    )
    assert rows
    run = 0
    for r in rows:
        assert r["start_offset"] == run, (r, run)
        assert r["seq_id"] == run // PACK_WINDOW
        end = run + max(r["n_tokens"], 1) - 1
        assert r["straddles"] == (end // PACK_WINDOW != r["seq_id"])
        run += r["n_tokens"]


# --- z-order interleave: bijectivity + locality --------------------------------

def _py_interleave(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _py_deinterleave(z: int, bits: int = 16) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@settings(max_examples=300, deadline=None)
@given(
    x=st.integers(min_value=0, max_value=(1 << 16) - 1),
    y=st.integers(min_value=0, max_value=(1 << 16) - 1),
)
def test_zorder_interleave_bijective(x: int, y: int):
    """The SQL expression rendered by layout._interleave must agree with the
    reference Python interleave and invert cleanly (a bijection is what
    makes the z-sort a true space-filling order, not a lossy hash)."""
    import duckdb

    from serverless_mapreduce_spark.sources.layout import _interleave

    z = _py_interleave(x, y)
    assert _py_deinterleave(z) == (x, y)
    # the DuckDB rendering (same string fed to the oracle) must match
    sql = _interleave(str(x), str(y), "({c} >> {i})")
    got = duckdb.connect().execute(f"SELECT {sql}").fetchone()[0]
    assert got == z


def test_zorder_monotone_per_dimension():
    """Fixing one dimension, z must be strictly increasing in the other —
    the ordering property file-range pruning relies on."""
    for fixed in (0, 7, 901, 65_535):
        zs = [_py_interleave(x, fixed) for x in range(0, 2048, 17)]
        assert zs == sorted(zs) and len(set(zs)) == len(zs)
        zs = [_py_interleave(fixed, y) for y in range(0, 2048, 17)]
        assert zs == sorted(zs) and len(set(zs)) == len(zs)
