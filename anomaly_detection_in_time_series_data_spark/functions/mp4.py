"""Minimal ISO BMFF (MP4) container codec — pure Python, spec-structured.

Round 10 completes the container story across modalities: images decode
from real PNG (r9 spec codec) and real JPEG (r10 spec codec), audio from
real RIFF/WAVE (r10 stdlib parse) — and video now reads a real ISO
14496-12 container: box headers (size/type, 64-bit largesize), container
walking (moov/trak/mdia/minf/stbl), the sample tables that locate media
bytes (stsd sample-entry dims, stsz sizes, stsc sample-to-chunk runs,
stco/co64 chunk offsets), and the mdat payload.

Round 11 makes COMPRESSED video decode real with zero new entropy code:
Motion-JPEG tracks ('jpeg'/'mjpa' sample entries — each sample a complete
baseline JPEG) decode through the round-10 spec codec in functions.jpeg.
What remains gated is inter-frame codec entropy decode (h264/h265 — a
different class of work from container parsing): an 'avc1'/'hvc1' sample
entry raises NotImplementedError from the same seam an ffmpeg-backed
decoder would plug into.  Uncompressed 'raw8' sample entries (one gray
frame per sample) decode end-to-end as before.

The paired encoder exists to prove the parser (the PNG/JPEG discipline):
it writes spec-clean ftyp/mdat/moov files with a full stbl, multi-chunk
layouts included, so round-trip tests exercise stsc run expansion and
chunk-offset arithmetic rather than a single trivial layout.
"""

from __future__ import annotations

import struct


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def parse_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end) for each top-level box in
    ``data[start:end]`` — 32-bit sizes, 64-bit ``largesize``, and
    size==0 (extends to EOF) all per ISO 14496-12 §4.2."""
    end = len(data) if end is None else end
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", data[i : i + 4])[0]
        btype = data[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            size = struct.unpack(">Q", data[i + 8 : i + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError(f"mp4: malformed box {btype!r} at {i}")
        yield btype, i + hdr, i + size
        i += size


def _find(data: bytes, path: list[bytes], start: int = 0, end: int | None = None):
    """Walk a container path like [b'moov', b'trak', ...]; returns the
    (payload_start, payload_end) of the FIRST match at each level."""
    span = (start, len(data) if end is None else end)
    for want in path:
        found = None
        for btype, s, e in parse_boxes(data, span[0], span[1]):
            if btype == want:
                found = (s, e)
                break
        if found is None:
            raise ValueError(f"mp4: box {want!r} not found")
        span = found
    return span


CONTAINER_BOXES = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def read_samples(data: bytes) -> tuple[list[bytes], str, int, int]:
    """Container-only walk of an ISO BMFF file: return (samples, fourcc,
    width, height) for a single-track video — the raw sample BYTES in
    media order plus the stsd sample-entry identity, no codec work.
    ``decode_mp4_frames`` layers codec dispatch on top of this."""
    stbl_s, stbl_e = _find(
        data, [b"moov", b"trak", b"mdia", b"minf", b"stbl"]
    )
    boxes = {t: (s, e) for t, s, e in parse_boxes(data, stbl_s, stbl_e)}
    # stsd: sample description — entry fourcc + visual dims
    s, e = boxes[b"stsd"]
    n_entries = struct.unpack(">I", data[s + 4 : s + 8])[0]
    if n_entries != 1:
        raise ValueError("mp4: exactly one sample entry supported")
    entry_s = s + 8
    fourcc = data[entry_s + 4 : entry_s + 8]
    # VisualSampleEntry: 6 reserved + 2 data_ref + 16 predefined/reserved
    # then width/height (16-bit each) at offset 24 from entry body start
    w, h = struct.unpack(">HH", data[entry_s + 8 + 24 : entry_s + 8 + 28])
    # stsz: sample sizes
    s, e = boxes[b"stsz"]
    fixed, count = struct.unpack(">II", data[s + 4 : s + 12])
    sizes = (
        [fixed] * count
        if fixed
        else list(
            struct.unpack(f">{count}I", data[s + 12 : s + 12 + 4 * count])
        )
    )
    # stsc: sample-to-chunk runs
    s, e = boxes[b"stsc"]
    n_runs = struct.unpack(">I", data[s + 4 : s + 8])[0]
    runs = [
        struct.unpack(">III", data[s + 8 + 12 * i : s + 20 + 12 * i])
        for i in range(n_runs)
    ]
    # stco / co64: chunk offsets
    if b"stco" in boxes:
        s, e = boxes[b"stco"]
        n_ch = struct.unpack(">I", data[s + 4 : s + 8])[0]
        offsets = list(struct.unpack(f">{n_ch}I", data[s + 8 : s + 8 + 4 * n_ch]))
    else:
        s, e = boxes[b"co64"]
        n_ch = struct.unpack(">I", data[s + 4 : s + 8])[0]
        offsets = list(struct.unpack(f">{n_ch}Q", data[s + 8 : s + 8 + 8 * n_ch]))
    # expand stsc runs -> samples per chunk
    per_chunk = []
    for ri, (first, spc, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_ch
        per_chunk.extend([spc] * (last - first + 1))
    frames = []
    si = 0
    for ci, off in enumerate(offsets):
        pos = off
        for _ in range(per_chunk[ci]):
            frames.append(data[pos : pos + sizes[si]])
            pos += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError(f"mp4: sample walk consumed {si} of {len(sizes)}")
    return frames, fourcc.decode("latin1"), w, h


def decode_mp4_frames(data: bytes) -> tuple[list[bytes], int, int]:
    """Parse an ISO BMFF file and return (gray frames, width, height)
    for a single-track video, dispatching on the stsd sample entry:

    - ``raw8``: each sample IS a row-major gray frame (pass-through);
    - ``jpeg``/``mjpa`` (Motion JPEG): each sample is a complete
      baseline-sequential JPEG image, decoded by the round-10 spec codec
      in ``functions.jpeg`` (canonical Huffman + dequant + ISO IDCT),
      then reduced to exact integer luma for color samples — real
      compressed video, zero new entropy code (round 11);
    - anything else (``avc1``/``hvc1``/...) raises NotImplementedError —
      h264/h265 entropy decode needs a codec library not present here;
      the container parse is complete and this is the plug-in seam.
    """
    samples, fourcc, w, h = read_samples(data)
    if fourcc == "raw8":
        return samples, w, h
    if fourcc in ("jpeg", "mjpa"):
        import numpy as np

        from .jpeg import decode_jpeg

        frames = []
        for si, sample in enumerate(samples):
            px = decode_jpeg(bytes(sample))
            if px.ndim == 3:  # exact integer luma, same rule as images
                p32 = px.astype(np.int64)
                px = (
                    (299 * p32[:, :, 0] + 587 * p32[:, :, 1] + 114 * p32[:, :, 2])
                    // 1000
                ).astype(np.uint8)
            if px.shape != (h, w):
                raise ValueError(
                    f"mp4: sample {si} decodes to {px.shape}, stsd says "
                    f"({h}, {w})"
                )
            frames.append(px.tobytes())
        return frames, w, h
    raise NotImplementedError(
        f"mp4: compressed video codec {fourcc!r} needs a codec library "
        "not present in this environment; the container parse is complete "
        "— plug a real decoder into this seam"
    )


def encode_mp4_raw8(
    frames: list[bytes], width: int, height: int, *, samples_per_chunk: int = 2
) -> bytes:
    """Write a spec-clean single-track ISO BMFF file whose samples are
    raw gray frames (fourcc ``raw8``), split into multi-sample chunks so
    the decoder's stsc/stco walk is genuinely exercised."""
    return _encode_mp4(
        frames, b"raw8", width, height, samples_per_chunk=samples_per_chunk
    )


def encode_mp4_mjpeg(
    frames_px: list, width: int, height: int, *, samples_per_chunk: int = 2
) -> bytes:
    """Motion-JPEG mux: each (h, w) uint8 gray frame is baseline-JPEG
    encoded by ``functions.jpeg.encode_jpeg`` and written as one sample
    of a ``jpeg`` sample-entry track — variable sample sizes, so the
    decoder's per-sample stsz path is exercised (raw8 tracks take the
    fixed-size shortcut)."""
    from .jpeg import encode_jpeg

    samples = [encode_jpeg(px) for px in frames_px]
    return _encode_mp4(
        samples, b"jpeg", width, height, samples_per_chunk=samples_per_chunk
    )


def _encode_mp4(
    frames: list[bytes],
    fourcc: bytes,
    width: int,
    height: int,
    *,
    samples_per_chunk: int = 2,
) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    # mdat laid out in chunks
    chunks = [
        frames[i : i + samples_per_chunk]
        for i in range(0, len(frames), samples_per_chunk)
    ]
    mdat_payload = b"".join(b"".join(ch) for ch in chunks)
    mdat = _box(b"mdat", mdat_payload)
    mdat_base = len(ftyp) + 8  # offset of first media byte in the file
    offsets = []
    pos = mdat_base
    for ch in chunks:
        offsets.append(pos)
        pos += sum(len(f) for f in ch)

    # stbl
    entry = (
        struct.pack(">I", 86)  # VisualSampleEntry size (no extensions)
        + fourcc
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 8, -1)  # depth=8 gray, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, len(frames), 1)
    )
    # stsc: one run if every chunk is full, else a second run for the tail
    runs = [(1, samples_per_chunk, 1)]
    if chunks and len(chunks[-1]) != samples_per_chunk:
        if len(chunks) == 1:
            runs = [(1, len(chunks[-1]), 1)]
        else:
            runs.append((len(chunks), len(chunks[-1]), 1))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", *r) for r in runs),
    )
    if frames and all(len(f) == len(frames[0]) for f in frames):
        stsz = _full(
            b"stsz", 0, 0, struct.pack(">II", len(frames[0]), len(frames))
        )
    else:
        stsz = _full(
            b"stsz",
            0,
            0,
            struct.pack(">II", 0, len(frames))
            + b"".join(struct.pack(">I", len(f)) for f in frames),
        )
    stco = _full(
        b"stco",
        0,
        0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    # minimal mdia/minf scaffolding
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1, len(frames), 0x55C4, 0)
    )
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIIII", 0, 0, 1, 0, len(frames))
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, 1, len(frames))
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
