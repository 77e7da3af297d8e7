"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Round 10's codec-gate move, one format harder than round 9's PNG: the
reference's actual committed image artifact is a JPEG
(`samoyed_puppy_dog_pictures.jpg`, read by the ResNet50 cell at
`Week#6_assignment.ipynb:445-520`), and this environment has no
Pillow/cv2 — so baseline sequential DCT JPEG is implemented from the
public spec, no third-party codec:

- marker parse: SOI/APPn/COM/DQT/SOF0/SOF1/DHT/DRI/SOS/EOI
- canonical Huffman tables (BITS/HUFFVAL -> code book), bit reader with
  0xFF00 byte-stuffing and RSTn restart handling
- per-MCU entropy decode (DC predictor + AC run/size with ZRL/EOB),
  dequantize, de-zigzag
- IDCT: exact ISO 10918 floating reference formula, evaluated as a
  batched float64 matrix product (C^T X C) over all blocks at once —
  deterministic in numpy, unit-checked against a literal four-loop
  scalar transcription of the formula
- chroma upsampling (sample replication) for 4:2:0 / 4:2:2, JFIF
  YCbCr -> RGB with integer rounding and clamping

The paired ENCODER exists to prove the decoder (the PNG discipline):
it produces spec-clean baseline streams over any sampling factors and
restart interval, so round-trip tests exercise every decode path; DC-only
streams round-trip to analytically exact pixels.

Scale note: decode runs inside the existing Arrow `mapInPandas` stage of
`operators/multimodal.py` — per-row Python cost, batched Arrow transfer,
never a shuffle of pixel data.
"""

from __future__ import annotations

import struct

import numpy as np

# --- zigzag order (spec Figure A.6) -------------------------------------
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# --- IDCT basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16) -----------------
_U = np.arange(8).reshape(8, 1).astype(np.float64)
_X = np.arange(8).reshape(1, 8).astype(np.float64)
_C = 0.5 * np.cos((2.0 * _X + 1.0) * _U * np.pi / 16.0)
_C[0, :] *= 1.0 / np.sqrt(2.0)


def idct2_blocks(coeffs: np.ndarray) -> np.ndarray:
    """Batched 2-D inverse DCT: (n, 8, 8) coefficient blocks -> (n, 8, 8)
    spatial float64 samples, per the ISO reference formula
    s(x,y) = sum_u sum_v c(u)c(v)/4 S(u,v) cos((2x+1)u pi/16) cos((2y+1)v pi/16).
    """
    return np.einsum("ux,nuv,vy->nxy", _C, coeffs.astype(np.float64), _C)


def dct2_blocks(samples: np.ndarray) -> np.ndarray:
    """Batched forward 2-D DCT (the transpose pair of idct2_blocks)."""
    return np.einsum("ux,nxy,vy->nuv", _C, samples.astype(np.float64), _C)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 stuffing;
    stops at any non-RST marker and records restart boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None:
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: consumed by restart(), never by bits
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Consume an expected RSTn marker and byte-align."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # find the marker in the raw stream (bits were byte-aligned)
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        else:
            self.pos += 2
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"jpeg: expected RST marker, got FF{self.marker:02X}")
        self.marker = None


class _Huff:
    """Canonical Huffman table from BITS (17 bytes incl. class byte
    stripped) + HUFFVAL, decoded by walking code lengths."""

    def __init__(self, bits: list[int], vals: bytes):
        self.maxcode: list[int] = []
        self.mincode: list[int] = []
        self.valptr: list[int] = []
        self.vals = vals
        code = 0
        k = 0
        for length in range(1, 17):
            self.valptr.append(k)
            self.mincode.append(code)
            n = bits[length - 1]
            code += n
            k += n
            self.maxcode.append(code - 1 if n else -1)
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        for length in range(1, 17):
            mx = self.maxcode[length - 1]
            if mx >= 0 and code <= mx:
                return self.vals[self.valptr[length - 1] + (code - self.mincode[length - 1])]
            code = (code << 1) | br.read_bit()
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude per spec F.2.2.1 (EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) JPEG to uint8 pixels: (h, w) for
    grayscale, (h, w, 3) RGB for YCbCr."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    i = 2
    while True:
        if data[i] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {i}")
        m = data[i + 1]
        if m == 0xD9:  # EOI
            raise ValueError("jpeg: EOI before SOS")
        ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + ln]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qt[tq] = tbl
        elif m in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + c * 3], seg[7 + c * 3], seg[8 + c * 3]
                comps.append(
                    {"id": cid, "hi": samp >> 4, "vi": samp & 15, "tq": tq}
                )
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: only baseline sequential (SOF0/SOF1) is supported, got SOF marker FF{m:02X}"
            )
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = bytes(seg[p + 17 : p + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _Huff(bits, vals)
                p += 17 + n
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for s in range(ns):
                cs, tabs = seg[1 + s * 2], seg[2 + s * 2]
                comp = next(c for c in comps if c["id"] == cs)
                comp["dc"] = dc_tabs[tabs >> 4]
                comp["ac"] = ac_tabs[tabs & 15]
                scan.append(comp)
            sos_end = i + 2 + ln
            return _decode_scan(
                data, sos_end, scan, comps, qt, w, h, restart_interval
            )
        # APPn / COM / others: skip
        i += 2 + ln


def _decode_scan(
    data: bytes,
    pos: int,
    scan: list[dict],
    comps: list[dict],
    qt: dict[int, np.ndarray],
    w: int,
    h: int,
    restart_interval: int,
) -> np.ndarray:
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["hi"]  # blocks per row
        c["bh"] = mcuy * c["vi"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.int64)
        c["pred"] = 0
    br = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            br.restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mi, mcux)
        for c in scan:
            q = qt[c["tq"]]
            for v in range(c["vi"]):
                for hh in range(c["hi"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = c["dc"].decode(br)
                    diff = _extend(br.read_bits(t), t)
                    c["pred"] += diff
                    zz[0] = c["pred"] * q[0]
                    k = 1
                    while k < 64:
                        rs = c["ac"].decode(br)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        zz[k] = _extend(br.read_bits(s), s) * q[k]
                        k += 1
                    bi = (my * c["vi"] + v) * c["bw"] + (mx * c["hi"] + hh)
                    c["blocks"][bi] = zz[UNZIGZAG].reshape(8, 8)
    # IDCT all blocks per component (batched), assemble planes, upsample
    planes = []
    for c in comps:
        spat = idct2_blocks(c["blocks"]) + 128.0
        plane = (
            spat.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # sample replication up to the full-resolution grid
        ry, rx = vmax // c["vi"], hmax // c["hi"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(f"jpeg: {len(planes)}-component color not supported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder (exists to prove the decoder; spec-clean baseline) -----------

# Annex K example tables: public spec constants.
STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)
# Annex K.3 typical Huffman tables (BITS, HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = bytes(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _huff_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _csize(v: int) -> int:
    a = abs(v)
    s = 0
    while a:
        s += 1
        a >>= 1
    return s


def encode_jpeg(
    px: np.ndarray,
    *,
    sampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    quality_scale: int = 1,
) -> bytes:
    """Baseline-sequential encode of (h, w) gray or (h, w, 3) RGB uint8.

    Spec-clean output covering the decoder's paths: arbitrary luma
    ``sampling`` (chroma stays 1x1, so (2,2) yields 4:2:0), optional DRI
    restart intervals, Annex K quant tables divided by ``quality_scale``
    (higher = better fidelity). Chroma for subsampled encodes is the
    exact box mean of each sampling cell."""
    gray = px.ndim == 2
    hN, wN = px.shape[:2]
    if gray:
        yp = px.astype(np.float64) - 128.0
        planes = [yp]
    else:
        p = px.astype(np.float64)
        y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
        cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2] + 128.0
        cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2] + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    hi, vi = sampling
    if gray:
        hi = vi = 1
    fac = [(hi, vi)] + ([(1, 1), (1, 1)] if not gray else [])
    qluma = np.maximum(STD_LUMA_Q // quality_scale, 1)
    qchroma = np.maximum(STD_CHROMA_Q // quality_scale, 1)
    qts = [qluma] + ([qchroma, qchroma] if not gray else [])
    mcux = -(-wN // (8 * hi))
    mcuy = -(-hN // (8 * vi))

    # per-component block grids (luma full-res; chroma box-downsampled)
    comp_blocks = []
    for ci, plane in enumerate(planes):
        fh, fv = fac[ci]
        if ci == 0:
            tgt_h, tgt_w = mcuy * fv * 8, mcux * fh * 8
            pl = np.pad(
                plane,
                ((0, tgt_h - hN), (0, tgt_w - wN)),
                mode="edge",
            )
        else:
            # box mean over (vi, hi) cells, padded to the chroma grid
            ch = -(-hN // vi) if vi > 1 else hN
            cw = -(-wN // hi) if hi > 1 else wN
            pad_h = (-hN) % vi
            pad_w = (-wN) % hi
            pp = np.pad(plane, ((0, pad_h), (0, pad_w)), mode="edge")
            pl = pp.reshape(pp.shape[0] // vi, vi, pp.shape[1] // hi, hi).mean(
                axis=(1, 3)
            )
            tgt_h, tgt_w = mcuy * 8, mcux * 8
            pl = np.pad(
                pl, ((0, tgt_h - ch), (0, tgt_w - cw)), mode="edge"
            )
        bh, bw = pl.shape[0] // 8, pl.shape[1] // 8
        blocks = (
            pl.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
        )
        coeffs = dct2_blocks(blocks)
        qz = np.round(coeffs / qts[ci].reshape(8, 8)).astype(np.int64)
        comp_blocks.append((qz, bw, bh))

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    # DQT (tables in zigzag order per spec)
    zz_luma = qluma.reshape(8, 8).ravel()[ZIGZAG]
    seg(0xDB, bytes([0x00]) + bytes(int(v) for v in zz_luma))
    if not gray:
        zz_ch = qchroma.reshape(8, 8).ravel()[ZIGZAG]
        seg(0xDB, bytes([0x01]) + bytes(int(v) for v in zz_ch))
    # SOF0
    nc = 1 if gray else 3
    sof = bytearray([8]) + struct.pack(">HH", hN, wN) + bytes([nc])
    for ci in range(nc):
        fh, fv = fac[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    seg(0xC0, bytes(sof))
    # DHT (Annex K luma tables used for ALL components — legal: the
    # decoder must follow the declared table ids, which is part of what
    # round-trip proves)
    seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS) + _DC_LUMA_VALS)
    seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS) + _AC_LUMA_VALS)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    dc_codes = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bwr = _BitWriter()
    preds = [0] * nc
    n_mcu = mcux * mcuy
    rst = 0
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            bwr.flush()
            bwr.out.extend(b"\xff" + bytes([0xD0 + (rst & 7)]))
            rst += 1
            preds = [0] * nc
        my, mx = divmod(mi, mcux)
        for ci in range(nc):
            qz, bw, _bh = comp_blocks[ci]
            fh, fv = fac[ci]
            for v in range(fv):
                for hh in range(fh):
                    bi = (my * fv + v) * bw + (mx * fh + hh)
                    blk = qz[bi].ravel()[ZIGZAG]
                    diff = int(blk[0]) - preds[ci]
                    preds[ci] = int(blk[0])
                    s = _csize(diff)
                    code, ln = dc_codes[s]
                    bwr.write(code, ln)
                    if s:
                        bwr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                    run = 0
                    last_nz = 63
                    while last_nz > 0 and blk[last_nz] == 0:
                        last_nz -= 1
                    for k in range(1, 64):
                        val = int(blk[k])
                        if k > last_nz:
                            code, ln = ac_codes[0x00]  # EOB
                            bwr.write(code, ln)
                            break
                        if val == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_codes[0xF0]  # ZRL
                            bwr.write(code, ln)
                            run -= 16
                        s = _csize(val)
                        code, ln = ac_codes[(run << 4) | s]
                        bwr.write(code, ln)
                        bwr.write(val if val >= 0 else val + (1 << s) - 1, s)
                        run = 0
    bwr.flush()
    out.extend(bwr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
