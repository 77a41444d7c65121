"""Multimodal stage tests: REAL stdlib decode (P6 PPM images, PCM16
WAV audio), fallback behavior for undecodable payloads, and the
one-to-many frame-sampling plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

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


class TestY4MVideo:
    """r4: real video decode — Y4M (YUV4MPEG2, the ffmpeg/x264
    uncompressed interchange format) in pure numpy; the synthetic
    generator emits valid streams."""

    def test_roundtrip_within_color_transform_error(self):
        from vrl_ray.stages.multimodal import decode_y4m, encode_y4m

        rng = np.random.default_rng(3)
        fr = rng.integers(0, 256, size=(4, 9, 11, 3), dtype=np.uint8)
        dec, fn, fd = decode_y4m(encode_y4m(fr, fps=25))
        assert (fn, fd) == (25, 1)
        assert dec.shape == fr.shape
        # JPEG full-range YCbCr is near-lossless for uint8 RGB
        assert np.abs(dec.astype(int) - fr.astype(int)).max() <= 2

    def test_header_parsing_rejects_subsampled(self):
        from vrl_ray.stages.multimodal import decode_y4m

        with pytest.raises(ValueError, match="colorspace"):
            decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n"
                       b"FRAME\n" + bytes(4 * 4 * 3 // 2))
        with pytest.raises(ValueError, match="not a YUV4MPEG2"):
            decode_y4m(b"\x00\x00\x00 ftypmp42")

    def test_sample_frames_features_are_real_pixels(self):
        from vrl_ray.stages.multimodal import (SampleFrames, decode_y4m,
                                               synthetic_media_table)

        t = synthetic_media_table(9, seed=5)
        vids = t.filter(pc.equal(t["kind"], "video"))
        out = SampleFrames(every_ms=1000)(t)
        assert out["decode_err"].null_count == len(out)
        # recompute the first sampled frame's mean straight from the
        # decoded payload
        payload = vids["payload"][0].as_py()
        frames, fn, fd = decode_y4m(payload)
        want = frames[0].reshape(-1, 3).mean(axis=0)
        first = out.filter(pc.equal(out["media_id"], vids["media_id"][0]))
        got = np.array(first["rgb_mean"][0].as_py())
        assert np.allclose(got, want, atol=1e-3)

    def test_non_y4m_payload_error_lane(self):
        from vrl_ray.stages.multimodal import SampleFrames

        bad = pa.table({
            "media_id": pa.array([7], pa.int64()),
            "kind": pa.array(["video"]),
            "duration_ms": pa.array([2500], pa.int32()),
            "payload": pa.array([b"\x00mp4?"], pa.large_binary()),
        })
        out = SampleFrames(every_ms=1000)(bad)
        assert len(out) == 3
        assert out["rgb_mean"].null_count == 3
        assert out["decode_err"].null_count == 0
