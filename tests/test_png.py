"""Pure-Python PNG codec tests: every scanline filter must invert exactly,
corruption must be detected (CRC, signature, truncation), and the
unsupported-subset gates must raise NotImplementedError, not mis-decode."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from anomaly_detection_in_time_series_data_spark.functions.png import (
    decode_png,
    encode_png,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(16, 16), (5, 9), (1, 1), (7, 3, 3), (4, 6, 4), (3, 5, 2)]
)
def test_every_filter_round_trips_exactly(filter_type, shape):
    rng = np.random.RandomState(7 + filter_type)
    px = rng.randint(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(px, filter_type=filter_type))
    assert back.shape == px.shape
    assert np.array_equal(back, px)


def test_gradient_image_compresses_and_round_trips():
    # Smooth gradients are where Sub/Paeth actually shrink the stream —
    # assert the codec is a real compressor, not a store-only container.
    px = np.add.outer(np.arange(64), np.arange(64)).astype(np.uint8) * 2
    raw = px.tobytes()
    data = encode_png(px, filter_type=1)
    assert len(data) < len(raw) // 2
    assert np.array_equal(decode_png(data), px)


def test_signature_and_crc_and_truncation_detected():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    data = encode_png(px)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + data)
    corrupt = bytearray(data)
    corrupt[45] ^= 0xFF  # inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        decode_png(data[: len(data) - 8])  # IEND cut off


def test_unsupported_subset_raises_not_implemented():
    px = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(encode_png(px))
    # Patch IHDR to bit depth 16 and fix the CRC: must raise, not decode.
    ihdr_body = bytearray(data[16:29])
    ihdr_body[8] = 16
    crc = zlib.crc32(b"IHDR" + bytes(ihdr_body)) & 0xFFFFFFFF
    patched = data[:16] + ihdr_body + struct.pack(">I", crc) + data[33:]
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bytes(patched))
    # Interlace byte set: must raise on Adam7.
    ihdr_body = bytearray(data[16:29])
    ihdr_body[12] = 1
    crc = zlib.crc32(b"IHDR" + bytes(ihdr_body)) & 0xFFFFFFFF
    patched = data[:16] + ihdr_body + struct.pack(">I", crc) + data[33:]
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(bytes(patched))


def test_hypothesis_random_images_round_trip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        ch=st.sampled_from([1, 2, 3, 4]),
        f=st.integers(0, 4),
        seed=st.integers(0, 2**16),
    )
    def prop(w, h, ch, f, seed):
        rng = np.random.RandomState(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px, filter_type=f)), px)

    prop()
