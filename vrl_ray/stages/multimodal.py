"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode bodies are STUBS (image/audio libraries are not in this
container — marked explicitly); everything Ray-side is real and
tested: schema handling, small-batch actor stages sized for large
binary payloads, deterministic fake feature extraction for pipeline
tests, output layout.

Pattern for a real deployment: put model/codec init in ``__init__``
(once per actor), keep ``batch_size`` small (payload × batch ×
concurrency must fit the worker heap), keep the stage in
``batch_format="pyarrow"`` (binary columns do not round-trip pandas
cleanly).
"""

from __future__ import annotations

import hashlib

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


def synthetic_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows (binary payloads) for tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime", "width",
                            "height", "duration_ms")}
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(rng.bytes(size))
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(16, 512)) if kind != "audio" else -1)
        rows["height"].append(int(rng.integers(16, 512)) if kind != "audio" else -1)
        rows["duration_ms"].append(int(rng.integers(100, 60000)) if kind != "image" else -1)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool stage: decode + resize image payloads.

    STUB: the real body would be `PIL.Image.open(...)` loaded in
    ``__init__``-checked imports; this container has no imaging
    library, so `deterministic_fake=True` derives a stable
    pseudo-decode from the payload hash (keeps pipeline tests real),
    and `deterministic_fake=False` raises NotImplementedError exactly
    where the real decoder would plug in.
    """

    def __init__(self, target: tuple[int, int] = (64, 64),
                 deterministic_fake: bool = True):
        self.target = target
        self.fake = deterministic_fake
        if not deterministic_fake:
            raise NotImplementedError(
                "real image decoding requires PIL/opencv (not in this "
                "container); construct with deterministic_fake=True")

    def _fake_pixels(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        w, ht = self.target
        return rng.integers(0, 256, size=(ht, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            px = self._fake_pixels(payload)
            # mean-RGB "feature" — stands in for a real embedding head
            feats.append(px.reshape(-1, 3).mean(axis=0).astype(np.float32))
        arr = pa.array([f.tolist() for f in feats], pa.list_(pa.float32(), 3))
        return batch.drop_columns(["payload"]).append_column("rgb_mean", arr)


class DecodeAudio:
    """Audio feature-extraction stage (STUB decode, real plumbing):
    derives fixed-width pseudo-waveform stats per payload; the real
    body would load soundfile/librosa in ``__init__``."""

    def __init__(self, deterministic_fake: bool = True):
        if not deterministic_fake:
            raise NotImplementedError(
                "real audio decoding requires soundfile/librosa (not in "
                "this container)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zcr = [], []
        for payload in batch["payload"].to_pylist():
            h = hashlib.blake2b(payload, digest_size=8).digest()
            rng = np.random.default_rng(int.from_bytes(h, "little"))
            wave = rng.normal(size=256).astype(np.float32)
            rms.append(float(np.sqrt(np.mean(wave ** 2))))
            zcr.append(float(np.mean(np.signbit(wave[:-1]) !=
                                     np.signbit(wave[1:]))))
        out = batch.drop_columns(["payload"])
        out = out.append_column("rms", pa.array(rms, pa.float32()))
        return out.append_column("zero_cross_rate",
                                 pa.array(zcr, pa.float32()))


class SampleFrames:
    """Video frame-sampling stage (STUB decode, real plumbing):
    emits one row per sampled frame (one-to-many, like unnest)."""

    def __init__(self, every_ms: int = 1000, deterministic_fake: bool = True):
        self.every_ms = every_ms
        if not deterministic_fake:
            raise NotImplementedError(
                "real video decoding requires ffmpeg bindings (not in "
                "this container)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        mid, fidx, fts = [], [], []
        ids = batch["media_id"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        kinds = batch["kind"].to_pylist()
        for i, dur, kind in zip(ids, durs, kinds):
            if kind != "video" or dur is None or dur <= 0:
                continue
            t = 0
            j = 0
            while t < dur:
                mid.append(i); fidx.append(j); fts.append(t)
                t += self.every_ms
                j += 1
        return pa.table({"media_id": pa.array(mid, pa.int64()),
                         "frame_idx": pa.array(fidx, pa.int32()),
                         "frame_ts_ms": pa.array(fts, pa.int32())})


def media_pipeline(ds, *, batch_size: int = 64, concurrency=(1, 4)):
    """Reference wiring: small batches for big payloads, actor pool,
    pyarrow format end-to-end."""
    return ds.map_batches(
        DecodeImage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
