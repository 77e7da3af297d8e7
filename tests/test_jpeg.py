"""Baseline JPEG codec proof chain (`functions/jpeg.py`).

No independent decoder exists in this environment (no Pillow/cv2), so
correctness is established the same way round 9 proved the PNG codec:

1. the IDCT is checked against a LITERAL four-loop transcription of the
   ISO 10918 reference formula;
2. hand-built DC-only streams decode to ANALYTICALLY exact pixels
   (flat block value = round(DC * q / 8) + 128);
3. encoder round-trips at high PSNR across every decode path — gray,
   4:4:4, 4:2:0, 4:2:2, restart intervals, non-multiple-of-8 and
   non-multiple-of-16 dimensions, byte-stuffing-heavy streams;
4. the reference's actual committed artifact
   (`/root/reference/samoyed_puppy_dog_pictures.jpg`, the image the
   ResNet50 cell reads at `Week#6_assignment.ipynb:445-520`) decodes to
   committed golden pixel-stat constants, end-to-end through the Spark
   multimodal pipeline.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from anomaly_detection_in_time_series_data_spark.functions.jpeg import (
    STD_LUMA_Q,
    ZIGZAG,
    decode_jpeg,
    dct2_blocks,
    encode_jpeg,
    idct2_blocks,
)

SAMOYED = "/root/reference/samoyed_puppy_dog_pictures.jpg"


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * math.log10(255.0**2 / mse)


def test_idct_matches_literal_iso_formula():
    """The batched einsum IDCT must equal a literal scalar transcription
    of s(x,y) = sum_u sum_v C(u)C(v)/4 S(u,v) cos((2x+1)u pi/16)
    cos((2y+1)v pi/16) to float64 tolerance."""
    rng = np.random.RandomState(3)
    S = rng.randint(-512, 512, size=(2, 8, 8)).astype(np.float64)
    got = idct2_blocks(S)
    want = np.zeros_like(got)
    for n in range(2):
        for x in range(8):
            for y in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        acc += (
                            cu * cv / 4.0 * S[n, u, v]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                want[n, x, y] = acc
    assert np.allclose(got, want, atol=1e-9)


def test_dct_idct_are_inverse():
    rng = np.random.RandomState(4)
    x = rng.rand(5, 8, 8) * 255 - 128
    assert np.allclose(idct2_blocks(dct2_blocks(x)), x, atol=1e-9)


def _handmade_dc_only_jpeg(dc: int, q0: int = 16) -> bytes:
    """Build an 8x8 single-component baseline stream byte-by-byte whose
    only nonzero coefficient is the quantized DC — decoding it is
    analytically exact: every pixel = clip(round(dc*q0/8) + 128).
    Independent of the encoder (no float DCT anywhere)."""
    import struct

    from anomaly_detection_in_time_series_data_spark.functions.jpeg import (
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _BitWriter,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
        _huff_codes,
    )

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    q = bytes([q0] * 64)
    seg(0xDB, bytes([0x00]) + q)
    seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS) + _DC_LUMA_VALS)
    seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS) + _AC_LUMA_VALS)
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc_codes = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    s = 0
    a = abs(dc)
    while a:
        s += 1
        a >>= 1
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(dc if dc >= 0 else dc + (1 << s) - 1, s)
    code, ln = ac_codes[0x00]  # EOB
    bw.write(code, ln)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_dc_only_stream_decodes_analytically():
    """Hand-built DC-only streams (no encoder, no float DCT) decode to
    exactly clip(round(dc*q0/8) + 128, 0, 255) in every pixel — the IDCT
    of a DC-only block is the constant dc*q0/8."""
    for dc in (0, 1, -1, 7, -20, 63, -64, 100, -128):
        q0 = 16
        dec = decode_jpeg(_handmade_dc_only_jpeg(dc, q0))
        expect = int(np.clip(round(dc * q0 / 8.0) + 128, 0, 255))
        assert dec.shape == (8, 8)
        assert (dec == expect).all(), (dc, expect, np.unique(dec))


def test_round_trip_psnr_all_paths():
    """Every decode path at high fidelity: gray, 4:4:4, 4:2:0, 4:2:2,
    restart intervals, odd dimensions (force partial-MCU padding)."""
    x = np.linspace(0, 4 * np.pi, 70)
    base = ((np.sin(x)[:, None] * np.cos(x)[None, :]) * 90 + 128).astype(np.uint8)
    base = base[:50, :70]  # 50x70: neither multiple of 8 nor 16
    rgb = np.stack([base, base[::-1], base[::-1, ::-1]], axis=-1)
    assert _psnr(decode_jpeg(encode_jpeg(base, quality_scale=8)), base) > 40
    assert _psnr(decode_jpeg(encode_jpeg(rgb, quality_scale=8)), rgb) > 35
    assert (
        _psnr(decode_jpeg(encode_jpeg(rgb, sampling=(2, 2), quality_scale=8)), rgb)
        > 28
    )
    assert (
        _psnr(decode_jpeg(encode_jpeg(rgb, sampling=(2, 1), quality_scale=8)), rgb)
        > 28
    )
    assert (
        _psnr(
            decode_jpeg(
                encode_jpeg(rgb, restart_interval=3, quality_scale=8)
            ),
            rgb,
        )
        > 35
    )


def test_byte_stuffing_round_trip():
    """Entropy bytes that land on 0xFF must be stuffed by the encoder and
    unstuffed by the decoder.  Scan seeds of high-entropy noise until a
    stream actually contains the FF00 sequence (asserted, so the path is
    provably exercised), then round-trip it."""
    enc = img = None
    for seed in range(64):
        rng = np.random.RandomState(seed)
        cand = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
        e = encode_jpeg(cand, quality_scale=16)
        if b"\xff\x00" in e[20:]:  # skip headers; look in entropy data
            enc, img = e, cand
            break
    assert enc is not None, "no seed produced a stuffed byte in 64 tries"
    dec = decode_jpeg(enc)
    assert _psnr(dec, img) > 25


def test_progressive_rejected_loudly():
    """SOF2 must hit the explicit gate, not a silent misparse."""
    img = np.full((8, 8), 100, dtype=np.uint8)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(enc))


# --- the reference's committed artifact, as golden constants --------------

GOLDEN_SHAPE = (400, 600, 3)
GOLDEN_RGB_SUM = 80480943
GOLDEN_RGB_SQ_SUM = 12918067275
GOLDEN_CORNERS = ([152, 138, 0], [81, 101, 32], [78, 107, 26], [88, 87, 18])
GOLDEN_LUMA_SUM = 29889941
GOLDEN_LUMA_HIST8 = [1079, 24846, 78189, 49971, 18076, 14886, 30986, 21967]


@pytest.mark.skipif(not os.path.exists(SAMOYED), reason="reference image absent")
def test_samoyed_golden_decode():
    """The reference's actual committed JPEG decodes to the committed
    pixel-stat constants (shape, integer RGB sums, corner pixels, luma
    histogram) — a regression pin for the whole decode chain."""
    px = decode_jpeg(open(SAMOYED, "rb").read())
    assert px.shape == GOLDEN_SHAPE and px.dtype == np.uint8
    p64 = px.astype(np.int64)
    assert int(p64.sum()) == GOLDEN_RGB_SUM
    assert int((p64 * p64).sum()) == GOLDEN_RGB_SQ_SUM
    corners = (
        px[0, 0].tolist(),
        px[0, -1].tolist(),
        px[-1, 0].tolist(),
        px[-1, -1].tolist(),
    )
    assert corners == GOLDEN_CORNERS
    luma = (299 * p64[:, :, 0] + 587 * p64[:, :, 1] + 114 * p64[:, :, 2]) // 1000
    assert int(luma.sum()) == GOLDEN_LUMA_SUM
    assert np.histogram(luma, bins=8, range=(0, 256))[0].tolist() == GOLDEN_LUMA_HIST8


@pytest.mark.skipif(not os.path.exists(SAMOYED), reason="reference image absent")
def test_samoyed_through_spark_multimodal_pipeline(spark):
    """decode -> resize -> features end-to-end THROUGH the Spark
    mapInPandas stage (`operators/multimodal.py:image_features`), the
    surface the reference's ResNet50 cell consumes: the jpeg payload
    rides the same binary-column plumbing as raw8/png and the exact
    integer luma statistics match the golden constants."""
    from anomaly_detection_in_time_series_data_spark.operators import (
        multimodal as mm,
    )

    payload = open(SAMOYED, "rb").read()
    df = spark.createDataFrame(
        [(0, "image", "jpeg", bytearray(payload), (600, 400, 3, None, None))],
        mm.MEDIA,
    )
    feats = mm.image_features(df, resize_to=(8, 8)).collect()
    assert len(feats) == 1
    f = feats[0]
    assert f.n_px == 400 * 600
    assert f.px_sum == GOLDEN_LUMA_SUM
    assert f.hist_counts == GOLDEN_LUMA_HIST8
    assert len(f.thumbnail) == 64 and all(0.0 <= t <= 1.0 for t in f.thumbnail)


def test_16bit_quant_table_decode():
    """DQT with Pq=1 (16-bit entries) must dequantize correctly — built
    by hand (the encoder only emits 8-bit tables), DC-only analytic
    expectation with q0 = 300 > 255."""
    import struct

    from anomaly_detection_in_time_series_data_spark.functions.jpeg import (
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _BitWriter,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
        _huff_codes,
    )

    q0 = 300
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    qtbl = struct.pack(">64H", *([q0] + [1] * 63))
    seg(0xDB, bytes([0x10]) + qtbl)  # Pq=1, Tq=0
    seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS) + _DC_LUMA_VALS)
    seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS) + _AC_LUMA_VALS)
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc_codes = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    dc = 2  # DC diff +2 -> pixel = round(2*300/8) + 128 = 203
    code, ln = dc_codes[2]
    bw.write(code, ln)
    bw.write(dc, 2)
    code, ln = ac_codes[0x00]
    bw.write(code, ln)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    dec = decode_jpeg(bytes(out))
    assert (dec == 203).all(), np.unique(dec)


def test_vertical_subsampling_and_restart_combo():
    """(1,2) vertical-only chroma subsampling, and restart intervals
    combined with (2,2) subsampling — the decoder paths the simple tests
    don't cross."""
    x = np.linspace(0, 3 * np.pi, 48)
    base = ((np.sin(x)[:, None] * np.cos(x)[None, :]) * 80 + 128).astype(np.uint8)
    rgb = np.stack([base, base[::-1], base[::-1, ::-1]], axis=-1)
    dec = decode_jpeg(encode_jpeg(rgb, sampling=(1, 2), quality_scale=8))
    assert _psnr(dec, rgb) > 28
    dec2 = decode_jpeg(
        encode_jpeg(rgb, sampling=(2, 2), restart_interval=2, quality_scale=8)
    )
    assert _psnr(dec2, rgb) > 28


def test_mjpeg_mp4_roundtrip_and_variable_stsz():
    """MJPEG mux/demux (round 11): encode_mp4_mjpeg writes one baseline
    JPEG per sample (variable sizes -> the per-sample stsz branch);
    decode_mp4_frames must return exactly the per-sample decode_jpeg
    output, and a non-MJPEG compressed fourcc must still raise at the
    codec seam with the container walk intact."""
    import numpy as np
    import pytest

    from anomaly_detection_in_time_series_data_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from anomaly_detection_in_time_series_data_spark.functions.mp4 import (
        _encode_mp4,
        decode_mp4_frames,
        encode_mp4_mjpeg,
        read_samples,
    )

    rng = np.random.RandomState(3)
    frames = [
        rng.randint(0, 256, size=(16, 24), dtype=np.uint8) for _ in range(5)
    ]
    blob = encode_mp4_mjpeg(frames, 24, 16, samples_per_chunk=2)
    samples, fourcc, w, h = read_samples(blob)
    assert fourcc == "jpeg" and (w, h) == (24, 16)
    assert len({len(s) for s in samples}) > 1  # variable-size stsz path
    dec, w2, h2 = decode_mp4_frames(blob)
    assert (w2, h2) == (24, 16) and len(dec) == 5
    for d, f in zip(dec, frames):
        assert bytes(d) == decode_jpeg(encode_jpeg(f)).tobytes()

    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_frames(
            _encode_mp4([b"\x00" * 8], b"avc1", 4, 2, samples_per_chunk=1)
        )
