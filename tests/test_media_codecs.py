"""Real media decode: codecs round-trip + Spark operators over true fixtures.

Fixtures are synthesized in-test with the encoders (BMP/PPM/WAV are fully
specified formats), so every assertion checks actual decoded CONTENT —
dimensions, channel means, sample rate, RMS — not just plumbing shape.
"""

from __future__ import annotations

import numpy as np
import pytest

from graphrag_litex_spark.functions import media_codecs as mc


def _img(h=6, w=5) -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestCodecs:
    def test_bmp_round_trip(self):
        img = _img()
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)

    def test_bmp_row_padding(self):
        # width 5 -> 15 bytes/row, padded to 16: padding must not leak.
        img = _img(3, 5)
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)

    def test_ppm_round_trip_and_comments(self):
        img = _img(4, 7)
        payload = mc.encode_ppm(img)
        assert np.array_equal(mc.decode_ppm(payload), img)
        commented = payload.replace(b"P6\n", b"P6\n# a comment\n", 1)
        assert np.array_equal(mc.decode_ppm(commented), img)

    def test_wav_round_trip(self):
        rate = 8000
        t = np.arange(rate) / rate
        samples = 0.5 * np.sin(2 * np.pi * 440 * t)
        got_rate, got = mc.decode_wav(mc.encode_wav(rate, samples))
        assert got_rate == rate
        assert got.size == rate
        assert abs(np.sqrt((got**2).mean()) - 0.5 / np.sqrt(2)) < 1e-3

    def test_detect_format(self):
        assert mc.detect_format(mc.encode_bmp(_img())) == "bmp"
        assert mc.detect_format(mc.encode_ppm(_img())) == "ppm"
        assert mc.detect_format(mc.encode_wav(8000, np.zeros(8))) == "wav"
        assert mc.detect_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
        assert mc.detect_format(b"\x89PNG\r\n") == "png"
        assert mc.detect_format(b"garbage") is None
        assert mc.detect_format(None) is None

    def test_resize_nearest(self):
        img = _img(8, 8)
        small = mc.resize_nearest(img, 4, 4)
        assert small.shape == (4, 4, 3)
        assert np.array_equal(small, img[::2, ::2])

    def test_ppm_crlf_after_maxval(self):
        # Some Windows tools emit CRLF as the single separator after maxval;
        # it must count as ONE separator, not shift the pixel stream.
        img = _img(4, 7)
        payload = mc.encode_ppm(img)
        header_end = payload.index(b"255\n") + 3
        crlf = payload[:header_end] + b"\r\n" + payload[header_end + 1 :]
        assert np.array_equal(mc.decode_ppm(crlf), img)

    def test_ppm_nonwhitespace_after_maxval_rejected(self):
        img = _img(2, 2)
        payload = mc.encode_ppm(img)
        header_end = payload.index(b"255\n") + 3
        corrupt = payload[:header_end] + b"X" + payload[header_end + 1 :]
        with pytest.raises(ValueError):
            mc.decode_ppm(corrupt)

    def test_unsupported_raises(self):
        if mc._pil() is None:
            with pytest.raises(NotImplementedError):
                mc.decode_image(b"\xff\xd8\xff\xe0jpegdata")
        else:  # with Pillow the payload is merely corrupt, not unsupported
            with pytest.raises(Exception):
                mc.decode_image(b"\xff\xd8\xff\xe0jpegdata")
        # video is unsupported in every environment
        with pytest.raises(NotImplementedError):
            mc.decode_image(b"\x00\x00\x00\x18ftypmp42")

    def test_decodable_formats_reflect_environment(self):
        fmts = mc.decodable_image_formats()
        assert {"bmp", "ppm"} <= fmts
        if mc._pil() is None:
            assert not (fmts & mc.PIL_IMAGE_FORMATS)
        else:
            assert mc.PIL_IMAGE_FORMATS <= fmts

    def test_pil_decode_path_with_fake_pil(self, monkeypatch):
        """Exercise the guarded Pillow branch without Pillow installed: a
        stand-in PIL.Image module proves decode_image routes PNG payloads
        through Image.open(...).convert('RGB') -> uint8 array."""
        import sys
        import types

        want = _img(3, 4)

        class _FakeImg:
            def convert(self, mode):
                assert mode == "RGB"
                return want

        fake_image = types.SimpleNamespace(open=lambda buf: _FakeImg())
        fake_pil = types.ModuleType("PIL")
        fake_pil.Image = fake_image
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)
        got = mc.decode_image(b"\x89PNG\r\n\x1a\nrest")
        assert np.array_equal(got, want)
        assert mc.PIL_IMAGE_FORMATS <= mc.decodable_image_formats()

    @pytest.mark.skipif(mc._pil() is None, reason="Pillow not installed")
    def test_pil_png_round_trip(self):
        import io

        from PIL import Image

        img = _img(5, 6)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")  # lossless
        assert np.array_equal(mc.decode_image(buf.getvalue()), img)


@pytest.fixture(scope="module")
def media_df(spark):
    from pyspark.sql import Row

    from graphrag_litex_spark.operators.multimodal import MEDIA_SCHEMA

    img = np.zeros((4, 6, 3), dtype=np.uint8)
    img[..., 0] = 200  # pure-red image: channel_mean = [200, 0, 0]
    rate = 8000
    samples = 0.25 * np.sin(2 * np.pi * 440 * np.arange(3 * rate) / rate)  # 3 s
    rows = [
        Row(media_id="img_bmp", kind="image", payload=bytes(mc.encode_bmp(img)),
            meta=Row(mime="image/bmp", width=6, height=4, duration_ms=None)),
        Row(media_id="img_ppm", kind="image", payload=bytes(mc.encode_ppm(img)),
            meta=Row(mime="image/x-portable-pixmap", width=6, height=4, duration_ms=None)),
        Row(media_id="aud_wav", kind="audio", payload=bytes(mc.encode_wav(rate, samples)),
            meta=Row(mime="audio/wav", width=None, height=None, duration_ms=3000)),
        Row(media_id="img_jpeg", kind="image", payload=b"\xff\xd8\xff\xe0fakejpeg",
            meta=Row(mime="image/jpeg", width=None, height=None, duration_ms=None)),
        Row(media_id="corrupt", kind="image", payload=b"BMgarbage",
            meta=Row(mime="image/bmp", width=None, height=None, duration_ms=None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


class TestSparkOperators:
    def test_decode_and_featurize(self, media_df):
        from graphrag_litex_spark.operators.multimodal import decode_and_featurize

        feats = {r["media_id"]: r.asDict() for r in decode_and_featurize(media_df).collect()}
        for mid in ("img_bmp", "img_ppm"):
            f = feats[mid]
            assert f["decoded"] and (f["width"], f["height"]) == (6, 4)
            assert f["channel_mean"] == [200.0, 0.0, 0.0]
            assert f["luma_std"] == 0.0
        a = feats["aud_wav"]
        assert a["decoded"] and a["sample_rate"] == 8000 and a["duration_ms"] == 3000
        assert abs(a["rms"] - 0.25 / np.sqrt(2)) < 1e-3
        assert feats["img_jpeg"] == {**feats["img_jpeg"], "decoded": False, "format": "jpeg"}
        assert feats["corrupt"]["decoded"] is False  # envelope, not task failure

    def test_resize_images(self, media_df):
        from graphrag_litex_spark.operators.multimodal import resize_images

        out = {r["media_id"]: r for r in resize_images(media_df, 3, 2).collect()}
        for mid in ("img_bmp", "img_ppm"):
            img = mc.decode_ppm(bytes(out[mid]["payload"]))
            assert img.shape == (2, 3, 3)
            assert out[mid]["meta"]["width"] == 3 and out[mid]["meta"]["height"] == 2
        # Non-decodable payload passes through untouched.
        assert bytes(out["img_jpeg"]["payload"]) == b"\xff\xd8\xff\xe0fakejpeg"

    def test_sample_audio_windows(self, media_df):
        from graphrag_litex_spark.operators.multimodal import sample_audio_windows

        frames = sample_audio_windows(media_df, every_ms=1000).collect()
        assert [r["media_id"] for r in frames] == ["aud_wav"] * 3  # 3 s -> 3 windows
        assert [r["ts_ms"] for r in frames] == [0, 1000, 2000]
        rate, chunk = mc.decode_wav(bytes(frames[1]["payload"]))
        assert rate == 8000 and chunk.size == 8000


class TestCodecProperties:
    """Property-based round-trips (hypothesis): encode∘decode == identity for
    every dimension/dtype the codecs claim to support."""

    def test_bmp_ppm_round_trip_any_shape(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            h=st.integers(min_value=1, max_value=24),
            w=st.integers(min_value=1, max_value=24),
            seed=st.integers(min_value=0, max_value=2**31 - 1),
        )
        def check(h, w, seed):
            img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
            assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)

        check()

    def test_wav_round_trip_any_length(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=30, deadline=None)
        @given(
            n=st.integers(min_value=1, max_value=5000),
            rate=st.sampled_from([8000, 16000, 44100]),
            seed=st.integers(min_value=0, max_value=2**31 - 1),
        )
        def check(n, rate, seed):
            samples = np.random.default_rng(seed).uniform(-1, 1, n)
            got_rate, got = mc.decode_wav(mc.encode_wav(rate, samples))
            assert got_rate == rate and got.size == n
            assert np.abs(got - samples).max() < 2.0 / 32767  # 16-bit quantization

        check()
