"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Three REAL pure-stdlib decoders run inside the pandas batches — no
external media libraries needed:
- PNG (image): signature + IHDR parse, IDAT zlib inflate, scanline
  unfilter (filter types 0-4), 8-bit gray/RGB/RGBA -> pixel ndarray.
- WAV (audio): RIFF/fmt/data chunk walk, PCM 8/16-bit -> sample ndarray.
- AVI (video): RIFF/hdrl/movi chunk walk, uncompressed 24-bit DIB
  frames -> frame ndarray. Compressed codecs (H.264 etc.) are ffmpeg
  territory on a real cluster; `decode_stub` remains only for unknown
  media types and as the corrupt-payload fallback.

Rows whose payload fails to decode get decode_ok=false with
deterministic fallback features instead of failing the batch, mirroring
the parse-failure-counting contract of the main pipeline.

Design for 100 TB of media:
- media rows are WIDE (MBs each): maxRecordsPerBatch is capped so one
  Arrow batch of decoded frames fits executor memory;
- feature extraction emits NARROW rows (url + feature vector) — project
  the binary away as early as possible so downstream shuffles never move
  payload bytes;
- mapInPandas (iterator of batches) not a scalar UDF: per-batch setup
  (model load, codec init) amortizes across the batch stream.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "url string, media_type string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_DIM = 16

_REAL_DECODERS = False  # stub now covers only unknown media types / corrupt fallback

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# 8-bit color types we decode: gray, RGB, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode -> (height, width, channels) uint8 array.

    Handles non-interlaced 8-bit-depth gray/RGB/RGBA with all five
    scanline filter types. Raises ValueError on anything else."""
    if not payload or not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, w = len(_PNG_SIG), None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(f"unsupported PNG (depth={depth} color={color})")
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad scanline payload size")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ftype == 1:
                    rec = line[x] + a
                elif ftype == 3:
                    rec = line[x] + (a + b) // 2
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec = line[x] + pr
                cur[x] = rec & 0xFF
        else:
            raise ValueError(f"unknown filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 scanlines) — the synth_media source of
    REAL image payloads, and decode_png's round-trip test twin."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib WAV decode -> ((n_frames, channels) float array in
    [-1, 1], sample_rate). PCM 8-bit unsigned / 16-bit signed only."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated chunk")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (fmt={audio_fmt} bits={bits})")
    if bits == 16:
        samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        scaled = samples.astype(np.float64) / 32768.0
    else:
        samples = np.frombuffer(data, dtype=np.uint8)
        scaled = (samples.astype(np.float64) - 128.0) / 128.0
    n = len(scaled) // channels
    return scaled[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal PCM16 WAV writer — synth_media's real audio payload source."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    channels = s.shape[1]
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_avi(payload: bytes) -> np.ndarray:
    """Pure-stdlib AVI decode (RIFF 'AVI ', uncompressed 24-bit DIB
    '00db' frames) -> (n_frames, height, width, 3) uint8 RGB array —
    the same RIFF chunk-walk discipline as the WAV decoder. Compressed
    codecs are out of scope (ffmpeg territory) and raise ValueError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    w = h = None
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal w, h
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the list-type fourcc
            elif cid == b"avih":
                w = struct.unpack("<I", payload[body + 32 : body + 36])[0]
                h = struct.unpack("<I", payload[body + 36 : body + 40])[0]
            elif cid == b"00db":
                frames.append(payload[body : body + size])
            pos = body + size + (size & 1)  # RIFF chunks are word-aligned

    walk(12, len(payload))
    if not w or not h or not frames:
        raise ValueError("unsupported AVI (no avih header / no DIB frames)")
    row_bytes = (w * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, fr in enumerate(frames):
        if len(fr) != row_bytes * h:
            raise ValueError("bad DIB frame size")
        rows = (
            np.frombuffer(fr, dtype=np.uint8)
            .reshape(h, row_bytes)[:, : w * 3]
            .reshape(h, w, 3)
        )
        out[i] = rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
    return out


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Minimal uncompressed-DIB AVI writer — synth_media's real video
    payload source. RIFF('AVI ', LIST hdrl(avih, LIST strl(strh, strf)),
    LIST movi('00db' per frame))."""
    n, h, w, _ = frames.shape
    row_bytes = (w * 3 + 3) & ~3

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = (
        struct.pack(
            "<10I", 1_000_000 // fps, row_bytes * h * fps, 0, 0x10, n, 0, 1,
            row_bytes * h, w, h,
        )
        + b"\x00" * 16
    )
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, row_bytes * h, 0, 0
    ) + b"\x00" * 8
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 0, 0, 0, 0)
    body_frames = []
    for i in range(n):
        dib = np.zeros((h, row_bytes), dtype=np.uint8)
        dib[:, : w * 3] = frames[i, ::-1, :, ::-1].reshape(h, w * 3)
        body_frames.append(chunk(b"00db", dib.tobytes()))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    riff_body = b"AVI " + hdrl + lst(b"movi", b"".join(body_frames))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _hist_features(values: np.ndarray, bins: int, lo: float, hi: float) -> list[float]:
    hist, _ = np.histogram(values, bins=bins, range=(lo, hi))
    total = max(int(hist.sum()), 1)
    return [float(c) / total for c in hist]


def image_features(px: np.ndarray) -> np.ndarray:
    """Deterministic 16-dim image descriptor: shape, gray stats, 9-bin
    gray histogram."""
    gray = px.astype(np.float64).mean(axis=2)
    feats = [
        float(px.shape[0]), float(px.shape[1]), float(px.shape[2]),
        float(gray.mean()), float(gray.std()),
        float(gray.min()), float(gray.max()),
        *_hist_features(gray.ravel(), 9, 0.0, 256.0),
    ]
    return np.asarray(feats, dtype=np.float32)


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """Deterministic 16-dim audio descriptor: shape/rate, amplitude stats,
    RMS + zero-crossing rate, 7-bin amplitude histogram (9 stats + 7 bins
    = FEATURE_DIM — the 'features' column must not be ragged across media
    types, ADVICE r3)."""
    mono = samples.mean(axis=1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if len(mono) > 1 else 0.0
    feats = [
        float(samples.shape[0]), float(samples.shape[1]), float(rate),
        float(mono.mean()), float(mono.std()),
        float(mono.min()), float(mono.max()),
        float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0,
        zc,
        *_hist_features(mono, 7, -1.0, 1.0),
    ]
    return np.asarray(feats, dtype=np.float32)


def video_features(frames: np.ndarray) -> np.ndarray:
    """Deterministic 16-dim video descriptor: frame count + dims, gray
    stats over all frames, 9-bin gray histogram."""
    gray = frames.astype(np.float64).mean(axis=3)
    feats = [
        float(frames.shape[0]), float(frames.shape[1]), float(frames.shape[2]),
        float(gray.mean()), float(gray.std()),
        float(gray.min()), float(gray.max()),
        *_hist_features(gray.ravel(), 9, 0.0, 256.0),
    ]
    return np.asarray(feats, dtype=np.float32)


def decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB decoder (video + unknown types, and the fallback for corrupt
    payloads): deterministic fake features from the payload bytes.

    Replace with a real decode (ffmpeg frame extraction) on a cluster with
    media libraries. Raises if someone flips the flag without providing a
    decoder."""
    if _REAL_DECODERS:
        raise NotImplementedError("wire a real decoder (ffmpeg) here")
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (arr % 1000).astype(np.float32) / 1000.0


def decode_features(payload: bytes, media_type: str) -> tuple[bool, np.ndarray]:
    """Dispatch: real PNG/WAV decode for image/audio; stub for the rest.
    Corrupt payloads -> (False, deterministic fallback) — one bad row must
    not fail an Arrow batch of 10k rows."""
    try:
        if media_type == "image":
            return True, image_features(decode_png(payload))
        if media_type == "audio":
            samples, rate = decode_wav(payload)
            return True, audio_features(samples, rate)
        if media_type == "video":
            return True, video_features(decode_avi(payload))
    except (ValueError, zlib.error, struct.error):
        return False, decode_stub(payload, media_type)
    return True, decode_stub(payload, media_type)


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Binary payload -> FEATURE_DIM float features via mapInPandas.

    The iterator contract lets per-partition init happen once; the output
    drops the payload (narrow rows out). decode_ok marks rows whose
    payload failed its real decoder (parse-failure analog)."""

    out_schema = (
        "url string, media_type string, n_bytes long, decode_ok boolean, "
        "features array<float>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init happens HERE (codec/model load in production)
        for pdf in batches:
            oks, feats = [], []
            for p, mt in zip(pdf["payload"], pdf["media_type"]):
                ok, f = decode_features(
                    p if p is None or isinstance(p, bytes) else bytes(p), mt
                )
                oks.append(ok)
                feats.append(f.tolist())
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "decode_ok": oks,
                    "features": feats,
                }
            )

    pruned = media.select("url", "media_type", "payload")
    return pruned.mapInPandas(run, schema=out_schema)


def extract_frames(media: DataFrame, every_n: int = 1, batch_hint: int = 64) -> DataFrame:
    """REAL video frame extraction: decode each AVI payload, keep every
    every_n-th frame, emit one NARROW row per kept frame with its image
    feature vector — the frame-sampling stage of a video training-data
    pipeline (decode wide binary -> project to narrow features before any
    shuffle). Corrupt/non-AVI payloads yield zero rows (the pairing
    frame_sample_plan row-explosion covers the planned-count contract)."""
    out_schema = "url string, frame_idx int, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, feats = [], [], []
            for u, p in zip(pdf["url"], pdf["payload"]):
                try:
                    frames = decode_avi(p if isinstance(p, bytes) else bytes(p))
                except (ValueError, struct.error):
                    continue
                for i in range(0, frames.shape[0], every_n):
                    urls.append(u)
                    idxs.append(i)
                    feats.append(image_features(frames[i]).tolist())
            # explicit dtypes: an empty partition's default float64 columns
            # fail Arrow's list<float> conversion
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype=object),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "features": pd.Series(feats, dtype=object),
                }
            )

    pruned = media.where(F.col("media_type") == "video").select("url", "payload")
    return pruned.mapInPandas(run, schema=out_schema)


def resize_pixels(px: np.ndarray, height: int, width: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize of an (h, w, c) uint8 array:
    output pixel (i, j) takes input pixel (floor(i·h/H), floor(j·w/W)) —
    pure integer index math, bit-identical on every platform (bilinear
    would make the result depend on float rounding)."""
    h, w = px.shape[0], px.shape[1]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return px[rows][:, cols]


def resize_images(
    media: DataFrame, height: int, width: int, batch_hint: int = 256
) -> DataFrame:
    """REAL image resize: decode each PNG payload, nearest-neighbor resize
    to (height, width), re-encode PNG — the normalize-resolution stage a
    multimodal training pipeline runs before feature extraction / model
    input. mapInPandas with the same batch-iterator shape as
    extract_features; corrupt/non-decodable payloads pass through
    UNCHANGED with resize_ok=False (one bad row must not fail an Arrow
    batch). Non-image rows are pruned JVM-side before the payload ever
    crosses to Python."""
    out_schema = (
        "url string, resize_ok boolean, out_h int, out_w int, "
        "n_bytes_in long, n_bytes_out long, payload binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in (
                "url", "resize_ok", "out_h", "out_w",
                "n_bytes_in", "n_bytes_out", "payload",
            )}
            for u, p in zip(pdf["url"], pdf["payload"]):
                raw = p if isinstance(p, bytes) else bytes(p)
                try:
                    px = decode_png(raw)
                    out = encode_png(
                        np.ascontiguousarray(resize_pixels(px, height, width))
                    )
                    vals = (u, True, height, width, len(raw), len(out), out)
                except (ValueError, zlib.error, struct.error):
                    vals = (u, False, None, None, len(raw), len(raw), raw)
                for k, v in zip(cols, vals):
                    cols[k].append(v)
            # explicit dtypes: an empty partition's default float64 columns
            # fail Arrow's int/binary conversion (same as extract_frames)
            yield pd.DataFrame(
                {
                    "url": pd.Series(cols["url"], dtype=object),
                    "resize_ok": pd.Series(cols["resize_ok"], dtype=bool),
                    "out_h": pd.Series(cols["out_h"], dtype="Int32"),
                    "out_w": pd.Series(cols["out_w"], dtype="Int32"),
                    "n_bytes_in": pd.Series(cols["n_bytes_in"], dtype="int64"),
                    "n_bytes_out": pd.Series(cols["n_bytes_out"], dtype="int64"),
                    "payload": pd.Series(cols["payload"], dtype=object),
                }
            )

    pruned = media.where(F.col("media_type") == "image").select("url", "payload")
    return pruned.mapInPandas(run, schema=out_schema)


def resample_samples(samples: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Deterministic nearest-sample rate conversion of an (n, ch) array:
    output frame i takes input frame floor(i·rate_in/rate_out) — the audio
    twin of resize_pixels (pure integer index math, no interpolation
    float-rounding to diverge across platforms). Output length
    floor(n·rate_out/rate_in)."""
    n = samples.shape[0]
    n_out = (n * rate_out) // rate_in
    idx = (np.arange(n_out) * rate_in) // rate_out
    return samples[idx]


def resample_audio(
    media: DataFrame, rate_out: int, batch_hint: int = 256
) -> DataFrame:
    """REAL audio resample: decode each WAV payload, nearest-sample
    convert to rate_out, re-encode WAV — the normalize-sample-rate stage
    an audio training pipeline runs before feature extraction. Same
    mapInPandas + pass-through-on-corrupt contract as resize_images;
    non-audio rows pruned JVM-side."""
    out_schema = (
        "url string, resample_ok boolean, rate_in int, rate_out int, "
        "n_frames_out long, n_bytes_in long, n_bytes_out long, payload binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in (
                "url", "resample_ok", "rate_in", "rate_out",
                "n_frames_out", "n_bytes_in", "n_bytes_out", "payload",
            )}
            for u, p in zip(pdf["url"], pdf["payload"]):
                raw = p if isinstance(p, bytes) else bytes(p)
                try:
                    samples, rate = decode_wav(raw)
                    res = resample_samples(samples, rate, rate_out)
                    out = encode_wav(res, rate=rate_out)
                    vals = (u, True, rate, rate_out, res.shape[0],
                            len(raw), len(out), out)
                except (ValueError, struct.error):
                    vals = (u, False, None, rate_out, None,
                            len(raw), len(raw), raw)
                for k, v in zip(cols, vals):
                    cols[k].append(v)
            yield pd.DataFrame(
                {
                    "url": pd.Series(cols["url"], dtype=object),
                    "resample_ok": pd.Series(cols["resample_ok"], dtype=bool),
                    "rate_in": pd.Series(cols["rate_in"], dtype="Int32"),
                    "rate_out": pd.Series(cols["rate_out"], dtype="Int32"),
                    "n_frames_out": pd.Series(cols["n_frames_out"], dtype="Int64"),
                    "n_bytes_in": pd.Series(cols["n_bytes_in"], dtype="int64"),
                    "n_bytes_out": pd.Series(cols["n_bytes_out"], dtype="int64"),
                    "payload": pd.Series(cols["payload"], dtype=object),
                }
            )

    pruned = media.where(F.col("media_type") == "audio").select("url", "payload")
    return pruned.mapInPandas(run, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled timestamp
    (explode of a sequence — pure JVM, no payload touched); the decode
    half is extract_frames above. Shows the row-explosion shape."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "url",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
                "frame_idx"
            ),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def synth_media(spark, n_rows: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table. Image, audio AND video payloads
    are REAL (valid PNG / PCM16 WAV / uncompressed-DIB AVI bytes from the
    encoders above)."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    rows = []
    for i in range(n_rows):
        mt = types[i % 3]
        if mt == "image":
            w, h = 8 + i % 8, 5 + i % 5
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload, width, height, dur = encode_png(px), w, h, None
        elif mt == "audio":
            n = 64 + (i % 64)
            samples = rng.uniform(-0.8, 0.8, size=(n, 1))
            payload, width, height, dur = (
                encode_wav(samples, rate=8000), None, None, (n * 1000) // 8000,
            )
        else:
            nf, w, h = 2 + i % 3, 6 + i % 4, 4 + i % 3
            fr = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            payload, width, height, dur = encode_avi(fr), w, h, nf * 100
        rows.append((f"https://media.example.org/{mt}/{i}", mt, payload, width,
                     height, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
