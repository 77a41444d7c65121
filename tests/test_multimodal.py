"""Multimodal stage tests: REAL stdlib decode (P6 PPM images, PCM16
WAV audio), fallback behavior for undecodable payloads, and the
one-to-many frame-sampling plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vrl_ray.stages.multimodal import (DecodeAudio, DecodeImage,
                                       SampleFrames, _resize_nearest,
                                       decode_ppm, decode_wav,
                                       encode_ppm, encode_wav,
                                       synthetic_media_table)


class TestCodecs:
    def test_ppm_roundtrip(self):
        rng = np.random.default_rng(1)
        px = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(px)), px)

    def test_wav_roundtrip(self):
        s = (np.sin(np.linspace(0, 20, 800)) * 20000).astype(np.int16)
        x, rate = decode_wav(encode_wav(s, rate=8000))
        assert rate == 8000 and len(x) == 800
        assert np.allclose(x * 32768.0, s, atol=1.0)

    def test_resize_nearest_exact_on_downscale(self):
        px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        out = _resize_nearest(px, (2, 2))
        assert out.shape == (2, 2, 3)
        assert np.array_equal(out[0, 0], px[0, 0])


class TestDecodeStages:
    def test_image_decode_is_real(self):
        t = synthetic_media_table(12, seed=5)
        imgs = t.filter(pc.equal(t["kind"], "image"))
        out = DecodeImage(fallback_fake=False)(imgs)
        # every synthetic image payload is valid PPM → zero errors
        assert out["decode_err"].null_count == len(out)
        # spot-verify the mean against a direct decode
        px = _resize_nearest(decode_ppm(imgs["payload"][0].as_py()),
                             (64, 64))
        want = px.reshape(-1, 3).mean(axis=0)
        got = np.array(out["rgb_mean"][0].as_py())
        assert np.allclose(got, want, atol=1e-3)

    def test_audio_decode_is_real(self):
        t = synthetic_media_table(12, seed=5)
        aud = t.filter(pc.equal(t["kind"], "audio"))
        out = DecodeAudio(fallback_fake=False)(aud)
        assert out["decode_err"].null_count == len(out)
        x, _ = decode_wav(aud["payload"][0].as_py())
        assert abs(out["rms"][0].as_py() -
                   float(np.sqrt(np.mean(x ** 2)))) < 1e-5

    def test_undecodable_goes_to_error_column_not_raise(self):
        bad = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"\x00garbage"], pa.large_binary()),
        })
        out = DecodeImage(fallback_fake=False)(bad)
        assert out["decode_err"][0].as_py() is not None
        out2 = DecodeAudio(fallback_fake=False)(bad)
        assert out2["decode_err"][0].as_py() is not None

    def test_frame_sampling_one_to_many(self):
        t = synthetic_media_table(9, seed=5)
        out = SampleFrames(every_ms=5000)(t)
        vids = t.filter(pc.equal(t["kind"], "video"))
        durs = vids["duration_ms"].to_pylist()
        want = sum(-(-d // 5000) for d in durs)
        assert len(out) == want
