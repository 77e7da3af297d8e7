"""Pure-Python PNG codec (stdlib ``zlib`` + numpy) — un-gates one REAL
compressed image format for the multimodal pipeline.

The reference's image surface reads a compressed image from disk before
feature extraction (Week#6_assignment.ipynb:445-520, ResNet50 cell); this
environment has no Pillow/libpng, but PNG's container is pure spec work:
CRC-checked chunks, zlib-compressed scanlines, five per-scanline filter
predictors (None/Sub/Up/Average/Paeth, RFC 2083 §6).  Implementing the
spec here means ``operators.multimodal.decode_image_pixels`` decodes a
real-world format end-to-end instead of raising at the codec seam.

Scope (raised as ``NotImplementedError`` beyond it): 8-bit depth,
non-interlaced, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
6 (RGBA).  Palette (type 3), 16-bit and Adam7 interlace raise — the
formats the synthetic fixtures and the feature pipeline need are fully
real.

The encoder exists so tests can PROVE the decoder inverts every filter
type: ``decode_png(encode_png(px, filter_type=f)) == px`` for f in 0..4
is a much stronger check than round-tripping the None filter only.

Performance note: decode runs inside Arrow-batched ``mapInPandas``
workers (one image per row); the unfilter loop is per-scanline numpy for
None/Sub/Up and per-byte only where the spec forces sequential
dependence (Average/Paeth left-neighbor recurrences).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to a uint8 array: ``(h, w)`` for
    grayscale, ``(h, w, channels)`` otherwise.  Verifies the signature
    and every chunk CRC; raises ``ValueError`` on corruption and
    ``NotImplementedError`` outside the supported subset."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    seen_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise NotImplementedError(f"bit depth {bit_depth} (only 8)")
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("unknown compression/filter method")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlace")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"IDAT size {len(raw)} != expected {height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = ch  # bytes per pixel at depth 8
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(height, width, ch)
    return px[:, :, 0] if ch == 1 else px


def encode_png(px: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Encode a uint8 array — ``(h, w)`` gray, ``(h, w, 2|3|4)`` for
    gray+alpha / RGB / RGBA — as a PNG byte string, applying
    ``filter_type`` (0-4) to every scanline.  Exists chiefly so tests
    can prove ``decode_png`` inverts each filter predictor exactly."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    if filter_type not in range(5):
        raise ValueError(f"filter type must be 0-4, got {filter_type}")
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    bpp = ch
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            enc = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                enc[x] = (int(cur[x]) - _paeth(left, int(prev[x]), ul)) & 0xFF
        lines.append(filter_type)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )
