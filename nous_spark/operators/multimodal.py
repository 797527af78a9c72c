"""Multimodal columns: image/audio/video as opaque BINARY columns with
typed metadata, decoded inside Arrow-batched mapInPandas.

Image decode is REAL for PNG (all five filter types, 8-bit gray/RGB/RGBA,
pure NumPy + stdlib zlib — no PIL in this container) and binary PPM (P6).
Audio decode is REAL for WAV (PCM 8/16/32-bit int + 32-bit float).
Video decode is REAL for Y4M / YUV4MPEG2 (C420/C422/C444/Cmono, pure
NumPy — the one video container that needs no codec libs); compressed
codecs (H.264 etc.) raise a decode_error row, which is data, not a crash.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests/bench with REAL decodable
    payloads: PNG images, 16-bit PCM WAV audio, Cmono Y4M video."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng((seed, i))
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 12 + i % 9, 8 + i % 7
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payload, dur = encode_png(img), None
        elif kind == "audio":
            rate = 8000
            n_fr = 400 + 40 * (i % 11)
            x = rng.uniform(-0.8, 0.8, (n_fr, 1 + i % 2))
            payload, dur = encode_wav(x, rate), int(1000 * n_fr / rate)
            w = h = None
        else:
            nf, fh, fw = 4 + i % 5, 6 + i % 4, 8 + i % 5
            frames = rng.integers(0, 256, (nf, fh, fw), dtype=np.uint8)
            payload, dur = encode_y4m(frames, fps_num=10), int(1000 * nf / 10)
            w, h = fw, fh
        if kind == "image":
            w, h = img.shape[1], img.shape[0]
        mime = {"image": "image/png", "audio": "audio/wav",
                "video": "video/x-yuv4mpeg"}[kind]
        rows.append((i, kind, mime, w, h, dur, bytearray(payload)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _image_feature(data: bytes, dim: int) -> list[float]:
    """Real image feature: decode, gray-convert, nearest-resize to a
    square thumbnail of ~dim cells, L2-normalize."""
    img = decode_png(data) if data[:8] == _PNG_MAGIC else decode_ppm(data)
    gray = img.astype(np.float64).mean(axis=2) if img.ndim == 3 else img
    side = max(int(round(dim ** 0.5)), 1)
    thumb = resize_image_nearest(gray, side, side).ravel()
    vec = np.zeros(dim)
    vec[: thumb.size] = thumb[:dim]
    norm = float(np.linalg.norm(vec)) or 1.0
    return (vec / norm).tolist()


def _audio_feature(data: bytes, dim: int) -> list[float]:
    """Real audio feature: mono mix, log-magnitude FFT folded into dim
    bands, L2-normalized."""
    x, _ = decode_wav(data)
    mono = x.mean(axis=1)
    if mono.size == 0:
        return [0.0] * dim
    mag = np.abs(np.fft.rfft(mono))
    bands = np.array_split(np.log1p(mag), dim)
    vec = np.array([b.mean() if b.size else 0.0 for b in bands])
    norm = float(np.linalg.norm(vec)) or 1.0
    return (vec / norm).tolist()


def _video_feature(data: bytes, dim: int) -> list[float]:
    """Real video feature: per-frame mean luma resampled to dim points
    (a temporal intensity profile), L2-normalized."""
    frames, _, _ = decode_y4m(data)
    if not frames:
        return [0.0] * dim
    prof = np.array([float(f.mean()) for f in frames])
    idx = (np.arange(dim) * len(prof) // dim).clip(0, len(prof) - 1)
    vec = prof[idx]
    norm = float(np.linalg.norm(vec)) or 1.0
    return (vec / norm).tolist()


def extract_features(media: DataFrame, dim: int = 32) -> DataFrame:
    """Decode + feature-extract via mapInPandas over Arrow batches of
    binary payloads, dispatching on the ``kind`` column to the REAL
    decoders (PNG/PPM images, WAV audio, Y4M video). Undecodable payloads
    get decode_error and an empty feature instead of killing the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fns = {"image": _image_feature, "audio": _audio_feature,
               "video": _video_feature}
        for pdf in batches:
            feats, errs = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                try:
                    fn = fns.get(kind)
                    if fn is None:
                        raise ValueError(f"unknown media kind {kind!r}")
                    feats.append(fn(bytes(payload), dim))
                    errs.append(None)
                except Exception as exc:  # decode failures are data
                    feats.append([])
                    errs.append(str(exc))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "feature": feats,
                "decode_error": errs,
            })

    schema = T.StructType(
        FEATURE_SCHEMA.fields + [T.StructField("decode_error", T.StringType(), True)]
    )
    return media.mapInPandas(run, schema=schema)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type → samples/pixel


def decode_png(data: bytes) -> np.ndarray:
    """Pure-NumPy PNG decode: 8-bit depth, color types 0/2/4/6, all five
    scanline filters (spec: https://www.w3.org/TR/png-3/#9Filters).
    Returns (H, W, C) uint8."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, b"", None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace != 0 or color not in _CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth} color={color})")
            meta = (w, h, _CHANNELS[color])
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, c = meta
    raw = zlib.decompress(idat)
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for row in range(h):
        off = row * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw[off + 1:off + 1 + stride], dtype=np.uint8).copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - c]) if i >= c else 0
                b = int(prev[i])
                if ftype == 1:
                    val = line[i] + a
                elif ftype == 3:
                    val = line[i] + (a + b) // 2
                else:
                    pc = int(prev[i - c]) if i >= c else 0
                    p = a + b - pc
                    pa, pb, pcc = abs(p - a), abs(p - b), abs(p - pc)
                    pred = a if (pa <= pb and pa <= pcc) else (b if pb <= pcc else pc)
                    val = line[i] + pred
                cur[i] = val & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[row] = cur
        prev = cur
    return out.reshape(h, w, c)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0) for fixtures/round-trip tests."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (_PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6), 8-bit. Returns (H, W, 3) uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while data[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return np.frombuffer(data[pos:pos + w * h * 3], dtype=np.uint8).reshape(h, w, 3)


_IMAGE_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("mean_intensity", T.DoubleType(), True),
    T.StructField("pixel_sha", T.StringType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def decode_image_stats(media: DataFrame, payload_col: str = "payload",
                       id_col: str = "media_id") -> DataFrame:
    """Real image decode over a BINARY column: PNG or PPM per payload magic,
    emitting width/height/channels/mean intensity and a sha256 of the raw
    pixel buffer (the lineage invariant carrier). Undecodable payloads get
    decode_error instead of killing the job. Arrow-batched mapInPandas —
    one Python roundtrip per batch, never per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                try:
                    if data[:8] == _PNG_MAGIC:
                        img = decode_png(data)
                    elif data[:2] == b"P6":
                        img = decode_ppm(data)
                    else:
                        raise ValueError("unknown image format")
                    rows.append((
                        int(mid), img.shape[1], img.shape[0], img.shape[2],
                        float(img.mean()),
                        hashlib.sha256(img.tobytes()).hexdigest(),
                        None,
                    ))
                except Exception as exc:  # decode failures are data, not crashes
                    rows.append((int(mid), None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _IMAGE_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=_IMAGE_STATS_SCHEMA)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib WAV decode (PCM 8/16/32-bit int + 32-bit float).
    Returns (samples[n_frames, n_channels] as float64 in [-1, 1],
    sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            raw = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt == 3 and bits == 32:
        x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt} bits={bits})")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Minimal 16-bit PCM WAV encoder for fixtures/round-trip tests."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


_AUDIO_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("duration_ms", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("peak", T.DoubleType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def decode_audio_stats(media: DataFrame, payload_col: str = "payload",
                       id_col: str = "media_id") -> DataFrame:
    """Real audio decode over a BINARY column (WAV/PCM): rate, channels,
    frames, duration, RMS and peak amplitude. Arrow-batched mapInPandas;
    undecodable payloads get decode_error instead of killing the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    x, rate = decode_wav(bytes(payload))
                    rows.append((
                        int(mid), int(rate), int(x.shape[1]), int(x.shape[0]),
                        1000.0 * x.shape[0] / rate,
                        float(np.sqrt((x ** 2).mean())) if x.size else 0.0,
                        float(np.abs(x).max()) if x.size else 0.0,
                        None,
                    ))
                except Exception as exc:
                    rows.append((int(mid), None, None, None, None, None,
                                 None, str(exc)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _AUDIO_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=_AUDIO_STATS_SCHEMA)


def resize_image_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize kernel (NumPy index arithmetic)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


_Y4M_MAGIC = b"YUV4MPEG2"
# chroma tag → (x_div, y_div); mono has no chroma planes
_Y4M_CHROMA = {
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2), "420paldv": (2, 2),
    "422": (2, 1), "444": (1, 1),
}


def decode_y4m(data: bytes) -> tuple[list[np.ndarray], int, float]:
    """Pure-NumPy Y4M / YUV4MPEG2 decode (the one video container that
    needs no codec: raw planar 8-bit YUV frames behind a text header).
    Supports C420*/C422/C444/Cmono. Returns (luma frames [(H, W) uint8],
    n_frames, fps)."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a Y4M stream")
    nl = data.index(b"\n")
    w = h = 0
    fps = 0.0
    chroma = "420jpeg"  # spec default when C is absent
    for tok in data[len(_Y4M_MAGIC):nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps = int(num) / max(int(den), 1)
        elif t[0] == "C":
            chroma = t[1:]
    if w <= 0 or h <= 0:
        raise ValueError("Y4M missing W/H")
    if chroma == "mono":
        frame_len = w * h
    elif chroma in _Y4M_CHROMA:
        xd, yd = _Y4M_CHROMA[chroma]
        frame_len = w * h + 2 * ((w // xd) * (h // yd))
    else:
        raise ValueError(f"unsupported Y4M chroma C{chroma}")
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        if pos + frame_len > len(data):
            raise ValueError("truncated frame")
        y = np.frombuffer(data[pos:pos + w * h], dtype=np.uint8).reshape(h, w)
        frames.append(y)
        pos += frame_len
    return frames, len(frames), fps


def encode_y4m(frames: np.ndarray, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Minimal Cmono Y4M encoder for fixtures/round-trip tests.
    ``frames``: (N, H, W) uint8 luma."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 Cmono\n".encode()
    return head + b"".join(b"FRAME\n" + frames[i].tobytes() for i in range(n))


_VIDEO_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("fps", T.DoubleType(), True),
    T.StructField("duration_ms", T.DoubleType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("luma_sha", T.StringType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def decode_video_stats(media: DataFrame, payload_col: str = "payload",
                       id_col: str = "media_id") -> DataFrame:
    """Real video decode over a BINARY column (Y4M): dimensions, frame
    count, fps, duration, mean luma over all frames and a sha256 of the
    concatenated luma planes (lineage invariant). Arrow-batched
    mapInPandas; undecodable payloads get decode_error."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames, n, fps = decode_y4m(bytes(payload))
                    if not frames:
                        raise ValueError("zero frames")
                    h, w = frames[0].shape
                    sha = hashlib.sha256()
                    tot, cnt = 0.0, 0
                    for f in frames:
                        sha.update(f.tobytes())
                        tot += float(f.sum())
                        cnt += f.size
                    rows.append((
                        int(mid), w, h, n, float(fps),
                        1000.0 * n / fps if fps > 0 else None,
                        tot / cnt, sha.hexdigest(), None,
                    ))
                except Exception as exc:
                    rows.append((int(mid), None, None, None, None, None,
                                 None, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _VIDEO_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=_VIDEO_STATS_SCHEMA)


_FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("frame_ts_ms", T.DoubleType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("frame_sha", T.StringType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def sample_frames(media: DataFrame, every_n: int = 25,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """REAL frame sampling: decode Y4M payloads and emit one row per
    every_n-th frame with its timestamp, mean luma, and pixel sha —
    the decode stage that ``frame_sample_plan`` schedules."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames, _, fps = decode_y4m(bytes(payload))
                    for i in range(0, len(frames), every_n):
                        f = frames[i]
                        rows.append((
                            int(mid), i,
                            1000.0 * i / fps if fps > 0 else None,
                            float(f.mean()),
                            hashlib.sha256(f.tobytes()).hexdigest(), None,
                        ))
                except Exception as exc:
                    rows.append((int(mid), None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FRAME_SAMPLE_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=_FRAME_SAMPLE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling SCHEDULE: one row per planned frame timestamp
    (``sample_frames`` above performs the actual decode). Pure Catalyst —
    explode over a sequence bounded by duration."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
