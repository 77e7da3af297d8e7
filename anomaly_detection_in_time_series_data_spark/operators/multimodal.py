"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (training-data-pipeline surface): media rows are
``(media_id, kind, format, payload: binary, meta: struct)`` — the payload is
never interpreted by Catalyst, only by Arrow-batched ``mapInPandas`` stages,
so scans stay columnar and prunable (reading metadata never touches bytes;
Parquet column pruning drops ``payload`` unless a decode stage needs it).

Codec handling: this environment has no image/audio libraries, so decode is
*format-gated*:

- ``raw8`` images (row-major uint8 gray pixels), ``pcm16`` audio
  (little-endian int16 mono), and ``rawv8`` video (concatenated raw8
  frames) are decoded for real with numpy — the full pipeline (decode ->
  resize -> features / frame-sample) is genuinely executable and tested.
- ``png`` images are decoded for real by the pure-Python spec
  implementation in ``functions.png`` (stdlib zlib; CRC-checked chunks,
  all five scanline filters) — one genuinely COMPRESSED format runs
  end-to-end; color inputs reduce to gray via the exact integer luma
  (299 r + 587 g + 114 b) / 1000.
- ``wav`` audio is decoded for real via the stdlib ``wave`` module
  (round 10): the RIFF/PCM container is parsed — channel count, sample
  width, frame rate come from the container itself, not the metadata
  struct — so the audio leg reads a genuine container format end-to-end.
- ``jpeg`` images are decoded for real by the pure-Python/numpy
  baseline-sequential spec implementation in ``functions.jpeg``
  (round 10): canonical Huffman entropy decode, dequantize, batched
  float64 IDCT, chroma upsampling, YCbCr->RGB — the reference's actual
  committed image artifact (`samoyed_puppy_dog_pictures.jpg`,
  `Week#6_assignment.ipynb:445-520`) decodes end-to-end and is pinned
  by golden pixel-stat constants.
- ``mp4`` video reads a real ISO BMFF container (round 10,
  ``functions.mp4``): box walking, stsd/stsz/stsc/stco sample tables,
  mdat payload extraction — uncompressed ``raw8`` sample entries decode
  to frames end-to-end, and since round 11 so does COMPRESSED video:
  Motion-JPEG tracks (``jpeg``/``mjpa`` sample entries) decode every
  sample through the ``functions.jpeg`` baseline spec codec, so the
  video leg runs decode-for-real on a genuinely compressed format with
  zero new entropy code.  What remains gated is inter-frame codec
  entropy decode (an ``avc1``/``hvc1`` sample entry raises
  ``NotImplementedError`` from the same seam an ffmpeg-backed decoder
  would plug into).  The Spark-side plumbing — schema, batch iteration,
  partition behavior — is identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # raw8 | pcm16 | rawv8 | jpeg | ...
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

_REAL_FORMATS = {"raw8", "pcm16", "rawv8", "png", "wav", "jpeg", "mp4"}


def decode_wav_samples(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE container with the stdlib ``wave`` module and
    return (int16 mono samples as int64, sample_rate) — the container's
    OWN header is the metadata source.  Multi-channel input downmixes by
    exact integer mean (sum // n_channels, matching the house
    integer-luma discipline on the image side)."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError(
                f"wav: only 16-bit PCM is supported, got sampwidth="
                f"{wf.getsampwidth()}"
            )
        n_ch = wf.getnchannels()
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    if n_ch > 1:
        samples = samples[: (len(samples) // n_ch) * n_ch]
        samples = samples.reshape(-1, n_ch).sum(axis=1) // n_ch
    return samples, int(sr)


def _require_known_format(fmt: str) -> None:
    if fmt not in _REAL_FORMATS:
        raise NotImplementedError(
            f"decode for format {fmt!r} needs a codec library not present in "
            "this environment; plug a real decoder into this mapInPandas seam"
        )


def _to_gray(px: np.ndarray) -> np.ndarray:
    """Exact integer luma reduction (299 r + 587 g + 114 b) // 1000 for
    color planes; gray+alpha keeps the gray channel."""
    if px.ndim == 3:
        if px.shape[2] >= 3:
            p32 = px.astype(np.int64)
            px = (
                (299 * p32[:, :, 0] + 587 * p32[:, :, 1] + 114 * p32[:, :, 2])
                // 1000
            ).astype(np.uint8)
        else:
            px = px[:, :, 0]
    return px


def decode_image_pixels(payload: bytes, width: int, height: int, fmt: str) -> np.ndarray:
    """uint8 gray pixel matrix from a raw8, png, or jpeg payload (real
    decode: raw8 is a numpy view; png runs the full spec decoder in
    ``functions.png`` — zlib inflate, CRC verification, scanline
    unfiltering; jpeg runs the baseline-sequential spec decoder in
    ``functions.jpeg`` — canonical Huffman, dequantize, batched float64
    IDCT, YCbCr->RGB — then exact integer luma for color inputs)."""
    _require_known_format(fmt)
    if fmt in ("png", "jpeg"):
        if fmt == "png":
            from ..functions.png import decode_png

            px = decode_png(bytes(payload))
        else:
            from ..functions.jpeg import decode_jpeg

            px = decode_jpeg(bytes(payload))
        px = _to_gray(px)
        if px.shape != (height, width):
            raise ValueError(
                f"{fmt} dimensions {px.shape} disagree with metadata "
                f"({height}, {width})"
            )
        return px
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr[: width * height].reshape(height, width)


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy, deterministic."""
    h, w = px.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys][:, xs]


def synthetic_media(spark: SparkSession, n: int = 20) -> DataFrame:
    """Deterministic fake media corpus for tests/demos (seeded per id)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        rng = np.random.RandomState(42 + i)
        if kind == "image":
            w, h = 16 + (i % 3) * 8, 16
            px = rng.randint(0, 256, size=w * h, dtype=np.uint8)
            if i % 6 == 0:
                # Every other image rides the REAL compressed path: the
                # same pixels PNG-encoded (Paeth filter — exercises the
                # decoder's hardest predictor), so the corpus always
                # carries both a raw and a compressed format.
                from ..functions.png import encode_png

                payload = encode_png(px.reshape(h, w), filter_type=4)
                fmt = "png"
            else:
                payload = px.tobytes()
                fmt = "raw8"
            meta = (w, h, 1, None, None)
        elif kind == "audio":
            sr = 8000
            wave = (np.sin(np.arange(sr) * (220 + i) * 2 * np.pi / sr) * 20000).astype(
                "<i2"
            )
            if i % 6 == 1:
                # Every other audio row rides the REAL container path: the
                # same samples wrapped in a RIFF/WAVE container (stdlib
                # wave module), so the corpus always carries both a raw
                # and a container audio format — the audio twin of the
                # raw8/png image split.
                import io
                import wave as _wave

                buf = io.BytesIO()
                with _wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(sr)
                    wf.writeframes(wave.tobytes())
                payload = buf.getvalue()
                fmt = "wav"
            else:
                payload = wave.tobytes()
                fmt = "pcm16"
            meta = (None, None, 1, sr, None)
        else:
            w, h, nf = 8, 8, 6
            raw = rng.randint(0, 256, size=w * h * nf, dtype=np.uint8).tobytes()
            # Video ids are i = 2 mod 3, so i % 9 cycles 2 -> 5 -> 8:
            # a three-way split over the SAME seeded frames per id.
            if i % 9 == 5:
                # Container path: frames muxed into an ISO BMFF (MP4)
                # file with raw8 sample entries — the video twin of the
                # raw8/png and pcm16/wav splits; the sample-table walk
                # is genuinely exercised per row.
                from ..functions.mp4 import encode_mp4_raw8

                frames_list = [
                    raw[k * w * h : (k + 1) * w * h] for k in range(nf)
                ]
                payload = encode_mp4_raw8(frames_list, w, h)
                fmt = "mp4"
            elif i % 9 == 2:
                # COMPRESSED path (round 11): the same frames
                # baseline-JPEG encoded per sample and muxed as a
                # Motion-JPEG track — real compressed video through the
                # real container, decoded by the spec codecs
                # (functions.jpeg inside functions.mp4), no codec gate.
                from ..functions.mp4 import encode_mp4_mjpeg

                px_list = [
                    np.frombuffer(
                        raw[k * w * h : (k + 1) * w * h], dtype=np.uint8
                    ).reshape(h, w)
                    for k in range(nf)
                ]
                payload = encode_mp4_mjpeg(px_list, w, h)
                fmt = "mp4"
            else:
                payload = raw
                fmt = "rawv8"
            meta = (w, h, 1, None, nf)
        rows.append((i, kind, fmt, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA)


def image_features(df: DataFrame, *, resize_to: tuple[int, int] = (8, 8)) -> DataFrame:
    """Decode -> resize -> feature-extract for image rows.

    One ``mapInPandas`` stage: per Arrow batch, decode pixels (raw8 view
    or full PNG inflate+unfilter), resize, emit (media_id, mean/std
    brightness, 8-bin histogram, thumbnail floats) PLUS the exact integer
    sufficient statistics (pixel count / sum / sum-of-squares and raw
    histogram counts) — the bigint components every float feature derives
    from, emitted so downstream correctness gates can hash them without
    float risk.  Narrow transformation — no shuffle; partition count
    preserved.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("px_mean", T.DoubleType()),
            T.StructField("px_std", T.DoubleType()),
            T.StructField("histogram", T.ArrayType(T.DoubleType())),
            T.StructField("thumbnail", T.ArrayType(T.DoubleType())),
            T.StructField("n_px", T.LongType()),
            T.StructField("px_sum", T.LongType()),
            T.StructField("px_sq_sum", T.LongType()),
            T.StructField("hist_counts", T.ArrayType(T.LongType())),
        ]
    )
    ow, oh = resize_to

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, r in pdf.iterrows():
                px = decode_image_pixels(
                    r["payload"], r["meta"]["width"], r["meta"]["height"], r["format"]
                )
                thumb = resize_nearest(px, ow, oh).astype(float) / 255.0
                hist = np.histogram(px, bins=8, range=(0, 256))[0]
                p64 = px.astype(np.int64)
                recs.append(
                    {
                        "media_id": r["media_id"],
                        "px_mean": float(px.mean()),
                        "px_std": float(px.std()),
                        "histogram": (hist / hist.sum()).tolist(),
                        "thumbnail": thumb.ravel().tolist(),
                        "n_px": int(px.size),
                        "px_sum": int(p64.sum()),
                        "px_sq_sum": int((p64 * p64).sum()),
                        "hist_counts": [int(c) for c in hist],
                    }
                )
            yield pd.DataFrame(recs, columns=[f.name for f in out_schema.fields])

    return df.filter(F.col("kind") == "image").mapInPandas(gen, out_schema)


def audio_features(df: DataFrame) -> DataFrame:
    """Audio decode (raw pcm16 buffers, or RIFF/WAVE containers parsed by
    the stdlib ``wave`` module with the container header as the metadata
    source) -> RMS energy, zero-crossing rate, duration — plus
    the exact integer sufficient statistics (sample count, amplitude
    sum-of-squares, crossing count, sample rate) the float features
    derive from, so correctness gates can hash bigints instead of
    doubles."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossing_rate", T.DoubleType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sq_sum", T.LongType()),
            T.StructField("n_crossings", T.LongType()),
            T.StructField("sample_rate", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, r in pdf.iterrows():
                _require_known_format(r["format"])
                if r["format"] == "wav":
                    iw, sr = decode_wav_samples(r["payload"])
                else:
                    iw = np.frombuffer(r["payload"], dtype="<i2").astype(np.int64)
                    sr = r["meta"]["sample_rate"] or 1
                wave = iw.astype(float)
                crossings = int(np.abs(np.diff(np.signbit(wave)).astype(int)).sum())
                zc = crossings / max(len(wave) - 1, 1)
                recs.append(
                    {
                        "media_id": r["media_id"],
                        "rms": float(np.sqrt(np.mean(wave**2))),
                        "zero_crossing_rate": zc,
                        "duration_s": len(wave) / sr,
                        "n_samples": int(iw.size),
                        "sq_sum": int((iw * iw).sum()),
                        "n_crossings": crossings,
                        "sample_rate": int(sr),
                    }
                )
            yield pd.DataFrame(recs, columns=[f.name for f in out_schema.fields])

    return df.filter(F.col("kind") == "audio").mapInPandas(gen, out_schema)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame-sampling: explode every k-th raw frame to its own row
    (one row in -> many rows out; still a narrow mapInPandas stage)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, r in pdf.iterrows():
                _require_known_format(r["format"])
                m = r["meta"]
                if r["format"] == "mp4":
                    from ..functions.mp4 import decode_mp4_frames

                    frames_all, _w, _h = decode_mp4_frames(bytes(r["payload"]))
                else:
                    fsize = m["width"] * m["height"]
                    frames_all = [
                        r["payload"][fi * fsize : (fi + 1) * fsize]
                        for fi in range(m["n_frames"])
                    ]
                for fi in range(0, len(frames_all), every_k):
                    recs.append(
                        {
                            "media_id": r["media_id"],
                            "frame_index": fi,
                            "frame": frames_all[fi],
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in out_schema.fields])

    return df.filter(F.col("kind") == "video").mapInPandas(gen, out_schema)


def motion_energy(df: DataFrame) -> DataFrame:
    """Per-video MOTION features from consecutive-frame deltas — the
    multi-frame temporal leg `sample_frames` (which treats frames
    independently) cannot express: for each video decode ALL frames in
    presentation order and fold the inter-frame residuals into exact
    integer sufficient statistics:

    - ``n_frames``  — frames decoded,
    - ``motion_abs`` — sum over consecutive pairs of sum(|f[k+1]-f[k]|),
    - ``motion_sq``  — same fold with squared residuals,
    - ``peak_pair_abs`` — the largest single-pair abs-residual sum
      (the cut-detection statistic: a scene cut is a spike here).

    Mean motion energy / normalized cut scores derive downstream as
    rationals.  Decode rides the same format dispatch as
    `sample_frames` (raw concat, raw8-in-MP4, Motion-JPEG-in-MP4 — the
    compressed path pays a real JPEG entropy decode per sample).  Scale
    shape: one narrow Arrow ``mapInPandas`` stage, payload bytes never
    shuffle — each task folds its own videos to 4 ints per row."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("motion_abs", T.LongType()),
            T.StructField("motion_sq", T.LongType()),
            T.StructField("peak_pair_abs", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, r in pdf.iterrows():
                _require_known_format(r["format"])
                m = r["meta"]
                if r["format"] == "mp4":
                    from ..functions.mp4 import decode_mp4_frames

                    frames_all, _w, _h = decode_mp4_frames(bytes(r["payload"]))
                else:
                    fsize = m["width"] * m["height"]
                    frames_all = [
                        r["payload"][fi * fsize : (fi + 1) * fsize]
                        for fi in range(m["n_frames"])
                    ]
                fs = [
                    np.frombuffer(f, dtype=np.uint8).astype(np.int64)
                    for f in frames_all
                ]
                abs_sum = sq_sum = peak = 0
                for a, b in zip(fs, fs[1:]):
                    d = b - a
                    pa = int(np.abs(d).sum())
                    abs_sum += pa
                    sq_sum += int((d * d).sum())
                    peak = max(peak, pa)
                recs.append(
                    {
                        "media_id": r["media_id"],
                        "n_frames": len(fs),
                        "motion_abs": abs_sum,
                        "motion_sq": sq_sum,
                        "peak_pair_abs": peak,
                    }
                )
            yield pd.DataFrame(
                recs, columns=[f.name for f in out_schema.fields]
            )

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "format", "payload", "meta")
        .mapInPandas(gen, out_schema)
    )
