"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decode is REAL for the formats the Python stdlib can parse — P6 PPM
images (header + raw RGB) and RIFF/PCM WAV audio (``wave`` module) —
and the synthetic generator emits VALID payloads in those formats, so
the pipeline decodes actual bytes end-to-end. Formats needing
external codecs (PNG/JPEG, MP3/OGG, any video) fall back to a
clearly-marked deterministic pseudo-decode (or raise when
``fallback_fake=False``) exactly where PIL/soundfile/ffmpeg would
plug in on a real cluster.

Pattern for a real deployment: put model/codec init in ``__init__``
(once per actor), keep ``batch_size`` small (payload × batch ×
concurrency must fit the worker heap), keep the stage in
``batch_format="pyarrow"`` (binary columns do not round-trip pandas
cleanly).
"""

from __future__ import annotations

import hashlib
import io
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → P6 PPM bytes (the stdlib-decodable format)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM bytes → (h, w, 3) uint8. Raises ValueError on non-PPM."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    if len(parts) < 4:
        raise ValueError("truncated PPM header")
    w, h = (int(x) for x in parts[1].split())
    data = parts[3][:w * h * 3]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/PCM WAV bytes (stdlib ``wave``)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples in [-1, 1], sample rate)."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        raw = f.readframes(f.getnframes())
        rate = f.getframerate()
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    return x, rate


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) video codec — pure Python/numpy, REAL decode.
#
# Y4M is the uncompressed interchange format of the ffmpeg/x264
# toolchain: a one-line ASCII stream header, then per frame a "FRAME"
# marker followed by planar YCbCr. With C444 (no chroma subsampling)
# both directions are exact plane reshapes plus the JPEG full-range
# color transform, so a container with no codec libraries can still
# decode real video bytes end-to-end.

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(…, 3) uint8 RGB → uint8 YCbCr (JPEG full-range)."""
    f = px.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1).round().clip(0, 255) \
        .astype(np.uint8)


def _ycbcr_to_rgb(yc: np.ndarray) -> np.ndarray:
    f = yc.astype(np.float32)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1).round().clip(0, 255) \
        .astype(np.uint8)


def encode_y4m(frames: np.ndarray, fps: int = 4) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → YUV4MPEG2 C444 bytes."""
    n, h, w, _ = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for i in range(n):
        yc = _rgb_to_ycbcr(frames[i])
        out.append(b"FRAME\n")
        # planar: all Y, then all Cb, then all Cr
        out.append(np.ascontiguousarray(
            yc.transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int, int]:
    """YUV4MPEG2 bytes → ((n, h, w, 3) uint8 RGB, fps_num, fps_den).

    Raises ValueError on anything that is not a C444 Y4M stream."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = fn = fd = None
    colorspace = "C420"  # Y4M default when the C tag is absent
    for tok in payload[:nl].split()[1:]:
        tag, val = chr(tok[0]), tok[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            fn, fd = (int(x) for x in val.split(b":"))
        elif tag == "C":
            colorspace = tok.decode()
    if not (w and h and fn):
        raise ValueError("incomplete Y4M stream header")
    if colorspace != "C444":
        raise ValueError(f"unsupported Y4M colorspace {colorspace} "
                         "(only C444 in pure Python)")
    frame_bytes = 3 * w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        mark = payload.index(b"\n", pos)
        if not payload[pos:mark].startswith(b"FRAME"):
            raise ValueError("corrupt Y4M frame marker")
        start = mark + 1
        data = payload[start:start + frame_bytes]
        if len(data) < frame_bytes:
            raise ValueError("truncated Y4M frame")
        yc = np.frombuffer(data, np.uint8).reshape(3, h, w) \
            .transpose(1, 2, 0)
        frames.append(_ycbcr_to_rgb(yc))
        pos = start + frame_bytes
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return np.stack(frames), fn, (fd or 1)


def synthetic_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic media rows with REAL payload bytes: P6 PPM images
    and PCM16 WAV audio (both stdlib-decodable); video payloads stay
    opaque bytes (no pure-Python codec)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows: dict = {k: [] for k in ("media_id", "kind", "payload", "mime",
                                  "width", "height", "duration_ms")}
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w = int(rng.integers(8, 48))
            h = int(rng.integers(8, 48))
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload, mime = encode_ppm(px), "image/x-portable-pixmap"
            dur = -1
        elif kind == "audio":
            n_samp = int(rng.integers(400, 4000))
            wave_f = (np.sin(np.linspace(0, rng.uniform(5, 60), n_samp))
                      * rng.uniform(0.1, 0.9) * 32767)
            payload, mime = encode_wav(wave_f.astype(np.int16)), "audio/wav"
            w = h = -1
            dur = int(n_samp / 8.0)        # 8 kHz
        else:
            w = int(rng.integers(8, 33))
            h = int(rng.integers(8, 33))
            fps = 4
            dur = int(rng.integers(400, 8000))
            n_frames = max(1, -(-dur * fps // 1000))
            fr = rng.integers(0, 256, size=(n_frames, h, w, 3),
                              dtype=np.uint8)
            payload, mime = encode_y4m(fr, fps), "video/x-yuv4mpeg"
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w if kind != "audio" else -1)
        rows["height"].append(h if kind != "audio" else -1)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _resize_nearest(px: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy (real, not a stub)."""
    tw, th = target
    h, w, _ = px.shape
    yi = (np.arange(th) * h // th).clip(0, h - 1)
    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
    return px[yi][:, xi]


class DecodeImage:
    """Actor-pool stage: decode + resize image payloads.

    REAL for P6 PPM payloads (header parse + zero-copy frombuffer +
    numpy nearest-neighbor resize). Other formats (PNG/JPEG) need
    PIL/opencv — not in this container — and take the deterministic
    pseudo-decode when ``fallback_fake=True`` (default) or raise
    ValueError into the error column otherwise."""

    def __init__(self, target: tuple[int, int] = (64, 64),
                 fallback_fake: bool = True):
        self.target = target
        self.fallback_fake = fallback_fake

    def _fake_pixels(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        w, ht = self.target
        return rng.integers(0, 256, size=(ht, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, errs = [], []
        for payload in batch["payload"].to_pylist():
            try:
                px = decode_ppm(payload)
                errs.append(None)
            except ValueError as e:
                if self.fallback_fake:
                    px = self._fake_pixels(payload)
                    errs.append(None)
                else:
                    feats.append(np.zeros(3, np.float32))
                    errs.append(str(e))
                    continue
            px = _resize_nearest(px, self.target)
            feats.append(px.reshape(-1, 3).mean(axis=0).astype(np.float32))
        arr = pa.array([f.tolist() for f in feats], pa.list_(pa.float32(), 3))
        out = batch.drop_columns(["payload"]).append_column("rgb_mean", arr)
        return out.append_column("decode_err", pa.array(errs, pa.string()))


class DecodeAudio:
    """Audio feature extraction — REAL for RIFF/PCM16 WAV payloads
    (stdlib ``wave`` decode → rms + zero-crossing rate over the actual
    samples). Non-WAV formats fall back to the deterministic
    pseudo-decode (or error-column with ``fallback_fake=False``)."""

    def __init__(self, fallback_fake: bool = True):
        self.fallback_fake = fallback_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zcr, errs = [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                x, _rate = decode_wav(payload)
                errs.append(None)
            except Exception as e:
                if not self.fallback_fake:
                    rms.append(0.0)
                    zcr.append(0.0)
                    errs.append(str(e))
                    continue
                h = hashlib.blake2b(payload, digest_size=8).digest()
                rng = np.random.default_rng(int.from_bytes(h, "little"))
                x = rng.normal(size=256).astype(np.float32)
                errs.append(None)
            rms.append(float(np.sqrt(np.mean(x ** 2))) if len(x) else 0.0)
            zcr.append(float(np.mean(np.signbit(x[:-1]) !=
                                     np.signbit(x[1:]))) if len(x) > 1
                       else 0.0)
        out = batch.drop_columns(["payload"])
        out = out.append_column("rms", pa.array(rms, pa.float32()))
        out = out.append_column("zero_cross_rate",
                                pa.array(zcr, pa.float32()))
        return out.append_column("decode_err", pa.array(errs, pa.string()))


class SampleFrames:
    """Video frame-sampling stage: emits one row per sampled frame
    (one-to-many, like unnest) with per-frame features from REAL
    decoded pixels.

    Decode is real for Y4M/YUV4MPEG2 payloads (pure-numpy plane
    reshape + color transform, ``decode_y4m``) — the synthetic
    generator emits valid Y4M. Compressed containers (MP4/H.264 …)
    need ffmpeg bindings, absent from this container: those payloads
    keep metadata-derived timestamps with null ``rgb_mean`` and a
    ``decode_err`` (or are dropped-to-error with
    ``fallback_meta=False``), exactly where an ffmpeg actor would
    plug in on a real cluster."""

    def __init__(self, every_ms: int = 1000, fallback_meta: bool = True):
        self.every_ms = every_ms
        self.fallback_meta = fallback_meta

    def __call__(self, batch: pa.Table) -> pa.Table:
        mid, fidx, fts, means, errs = [], [], [], [], []
        ids = batch["media_id"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist() \
            if "payload" in batch.column_names else [None] * len(ids)
        for i, dur, kind, payload in zip(ids, durs, kinds, payloads):
            if kind != "video" or dur is None or dur <= 0:
                continue
            frames = fps = None
            err = None
            if payload is not None:
                try:
                    frames, fn, fd = decode_y4m(payload)
                    fps = fn / fd
                    # vectorized per-frame mean once per video, indexed
                    # per sample below
                    fmeans = frames.reshape(len(frames), -1, 3) \
                        .mean(axis=1).astype(np.float32)
                except ValueError as e:
                    if not self.fallback_meta:
                        mid.append(i); fidx.append(-1); fts.append(-1)
                        means.append(None); errs.append(str(e))
                        continue
                    err = str(e)
            t = 0
            j = 0
            while t < dur:
                mid.append(i)
                fidx.append(j)
                fts.append(t)
                if frames is not None:
                    k = min(int(t * fps / 1000.0), len(frames) - 1)
                    means.append(fmeans[k].tolist())
                    errs.append(None)
                else:
                    means.append(None)
                    errs.append(err or "no payload column")
                t += self.every_ms
                j += 1
        return pa.table({"media_id": pa.array(mid, pa.int64()),
                         "frame_idx": pa.array(fidx, pa.int32()),
                         "frame_ts_ms": pa.array(fts, pa.int32()),
                         "rgb_mean": pa.array(means,
                                              pa.list_(pa.float32(), 3)),
                         "decode_err": pa.array(errs, pa.string())})


# Task-pool forms: the decode classes carry only config (construction
# is free), so plain tasks — which ride the session's warm workers and
# share cores with the read — beat dedicated pools whose combined
# fixed minimums can exceed the CPU count (three concurrent pools used
# to need explicit ncpu/3 sizing to avoid deadlock).
def decode_image_batch(batch: pa.Table, *, target=(64, 64),
                       fallback_fake: bool = True) -> pa.Table:
    return DecodeImage(target=tuple(target),
                       fallback_fake=fallback_fake)(batch)


def decode_audio_batch(batch: pa.Table) -> pa.Table:
    return DecodeAudio()(batch)


def sample_frames_batch(batch: pa.Table, *, every_ms: int = 1000) \
        -> pa.Table:
    return SampleFrames(every_ms=every_ms)(batch)


def media_pipeline(ds, *, batch_size: int = 64, concurrency=None):
    """Reference wiring: small batches for big payloads, pyarrow
    format end-to-end; tasks by default, an actor pool only when the
    caller pins ``concurrency``."""
    if concurrency is not None:
        return ds.map_batches(
            DecodeImage, batch_format="pyarrow",
            batch_size=batch_size, concurrency=concurrency,
        )
    return ds.map_batches(
        decode_image_batch, batch_format="pyarrow",
        batch_size=batch_size,
    )
