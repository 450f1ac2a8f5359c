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

    def test_ppm_cr_separator_with_newline_first_pixel(self):
        # A lone '\r' separator (valid whitespace) followed by a first pixel
        # byte of 0x0A looks byte-identical to CRLF; the length heuristic
        # must prefer the skip that makes the pixel stream fit exactly.
        img = _img(2, 2)
        img[0, 0] = (10, 20, 30)  # first payload byte = 0x0A
        payload = mc.encode_ppm(img)
        header_end = payload.index(b"255\n") + 3
        cr = payload[:header_end] + b"\r" + payload[header_end + 1 :]
        assert np.array_equal(mc.decode_ppm(cr), img)

    def test_ppm_nonwhitespace_after_maxval_rejected(self):
        img = _img(2, 2)
        payload = mc.encode_ppm(img)
        header_end = payload.index(b"255\n") + 3
        corrupt = payload[:header_end] + b"X" + payload[header_end + 1 :]
        with pytest.raises(ValueError):
            mc.decode_ppm(corrupt)

    def test_unsupported_raises(self):
        # JPEG decodes natively now; a truncated stream is corrupt, not
        # unsupported (ValueError from the segment parser in any env).
        with pytest.raises(ValueError):
            mc.decode_image(b"\xff\xd8\xff\xe0jpegdata")
        if mc._pil() is None:  # GIF still needs Pillow
            with pytest.raises(NotImplementedError):
                mc.decode_image(b"GIF87a-rest")
        # video is unsupported in every environment
        with pytest.raises(NotImplementedError):
            mc.decode_image(b"\x00\x00\x00\x18ftypmp42")

    def test_decodable_formats_reflect_environment(self):
        fmts = mc.decodable_image_formats()
        # png (stdlib zlib) and baseline jpeg (functions/jpeg.py) are native
        assert {"bmp", "ppm", "png", "jpeg"} <= fmts
        if mc._pil() is None:
            assert not (fmts & mc.PIL_IMAGE_FORMATS)
        else:
            assert mc.PIL_IMAGE_FORMATS <= fmts

    def test_pil_decode_path_with_fake_pil(self, monkeypatch):
        """Exercise the guarded Pillow branch without Pillow installed: a
        stand-in PIL.Image module proves decode_image routes GIF payloads
        (no native codec) through Image.open(...).convert('RGB')."""
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
        got = mc.decode_image(b"GIF87a-rest-of-stream")
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


def _wrap_png(w, h, ctype, filtered_rows: bytes, palette: bytes | None = None) -> bytes:
    """Assemble a PNG from an already-filtered scanline stream (test helper:
    lets each test choose the filter bytes the decoder must undo)."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    )
    if palette is not None:
        out += chunk(b"PLTE", palette)
    return out + chunk(b"IDAT", zlib.compress(filtered_rows)) + chunk(b"IEND", b"")


def _filter_rows(img2d: np.ndarray, bpp: int, filt: int) -> bytes:
    """Reference scanline FILTERING (the encode direction of PNG spec §6) —
    independent arithmetic the decoder's defilter must invert exactly."""
    h, stride = img2d.shape
    out = bytearray()
    prev = np.zeros(stride, int)
    for y in range(h):
        cur = img2d[y].astype(int)
        row = bytearray([filt])
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = a
            elif filt == 2:
                pred = b
            elif filt == 3:
                pred = (a + b) >> 1
            else:  # 4 Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            row.append((cur[x] - pred) & 0xFF)
        out += row
        prev = cur
    return bytes(out)


class TestPng:
    """Native (stdlib-zlib) PNG codec: encode/decode round-trip, every
    scanline filter, every 8-bit color type, and the honest failure modes."""

    def test_round_trip(self):
        img = _img(7, 5)
        payload = mc.encode_png(img)
        assert mc.detect_format(payload) == "png"
        assert np.array_equal(mc.decode_png(payload), img)
        assert np.array_equal(mc.decode_image(payload), img)  # routing

    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    def test_all_scanline_filters(self, filt):
        img = _img(6, 4)
        raw = _filter_rows(img.reshape(6, 12), bpp=3, filt=filt)
        assert np.array_equal(mc.decode_png(_wrap_png(4, 6, 2, raw)), img)

    def test_mixed_filters_per_row(self):
        # Real encoders pick a filter per row; splice rows filtered with
        # different types into one stream.
        img = _img(5, 3)
        rows = []
        prev = np.zeros(9, int)
        for y in range(5):
            f = y % 5
            cur = img.reshape(5, 9)[y].astype(int)
            row = bytearray([f])
            for x in range(9):
                a = cur[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                pred = {
                    0: 0,
                    1: a,
                    2: b,
                    3: (a + b) >> 1,
                }.get(f)
                if pred is None:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row.append((cur[x] - pred) & 0xFF)
            rows.append(bytes(row))
            prev = cur
        assert np.array_equal(
            mc.decode_png(_wrap_png(3, 5, 2, b"".join(rows))), img
        )

    def test_grayscale(self):
        g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
        raw = _filter_rows(g, bpp=1, filt=0)
        out = mc.decode_png(_wrap_png(4, 3, 0, raw))
        assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))

    def test_rgba_drops_alpha(self):
        rgba = _img(3, 3)
        rgba = np.dstack([rgba, np.full((3, 3), 77, np.uint8)])
        raw = _filter_rows(rgba.reshape(3, 12), bpp=4, filt=2)
        assert np.array_equal(mc.decode_png(_wrap_png(3, 3, 6, raw)), rgba[:, :, :3])

    def test_gray_alpha(self):
        ga = np.dstack([np.full((2, 2), 9, np.uint8), np.full((2, 2), 1, np.uint8)])
        raw = _filter_rows(ga.reshape(2, 4), bpp=2, filt=0)
        assert np.array_equal(
            mc.decode_png(_wrap_png(2, 2, 4, raw)), np.full((2, 2, 3), 9, np.uint8)
        )

    def test_palette(self):
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = np.array([[0, 1], [2, 0]], np.uint8)
        raw = _filter_rows(idx, bpp=1, filt=1)
        out = mc.decode_png(_wrap_png(2, 2, 3, raw, palette=pal.tobytes()))
        assert np.array_equal(out, pal[idx])

    def test_multiple_idat_chunks(self):
        # The pixel stream may be split across any number of IDAT chunks.
        import struct
        import zlib

        img = _img(4, 4)
        z = zlib.compress(_filter_rows(img.reshape(4, 12), 3, 0))
        half = len(z) // 2

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", z[:half])
            + chunk(b"IDAT", z[half:])
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(mc.decode_png(payload), img)

    def test_unsupported_depth_interlace(self):
        import struct
        import zlib

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        for ihdr in [
            struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0),  # 16-bit
            struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1),  # Adam7
        ]:
            payload = (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b""))
                + chunk(b"IEND", b"")
            )
            with pytest.raises(NotImplementedError):
                mc.decode_png(payload)

    def test_truncated_stream_rejected(self):
        img = _img(4, 4)
        payload = mc.encode_png(img)
        with pytest.raises(ValueError):
            mc.decode_png(payload[:20])  # signature ok, IHDR chopped
        # well-formed chunks but short pixel stream
        raw = _filter_rows(img.reshape(4, 12), 3, 0)
        with pytest.raises(ValueError):
            mc.decode_png(_wrap_png(4, 5, 2, raw))  # h claims 5 rows, has 4

    def test_exotic_png_falls_back_to_pil(self, monkeypatch):
        """A 16-bit PNG is beyond the native codec; decode_image must route
        it to Pillow when installed (fake module) and raise
        NotImplementedError — not crash — when it is not."""
        import struct
        import sys
        import types
        import zlib

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        deep = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 25))
            + chunk(b"IEND", b"")
        )
        if mc._pil() is None:
            with pytest.raises(NotImplementedError):
                mc.decode_image(deep)
        want = _img(2, 2)

        class _FakeImg:
            def convert(self, mode):
                assert mode == "RGB"
                return want

        fake_image = types.SimpleNamespace(open=lambda buf: _FakeImg())
        fake_pil = types.ModuleType("PIL")
        fake_pil.Image = fake_image
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)
        assert np.array_equal(mc.decode_image(deep), want)


def _gradient(h=41, w=57) -> np.ndarray:
    """Smooth gradient — the signal JPEG is designed for, so round-trip
    error bounds are tight and deterministic."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


class TestJpeg:
    """Baseline JPEG codec (functions/jpeg.py): lossy round-trips assert
    dimensions exactly and pixel closeness (MAE), per layout variant."""

    def test_444_round_trip(self):
        from graphrag_litex_spark.functions import jpeg

        img = _gradient()
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert out.shape == img.shape
        assert np.abs(out.astype(float) - img.astype(float)).mean() < 2.0

    def test_420_subsampled_round_trip(self):
        from graphrag_litex_spark.functions import jpeg

        img = _gradient(30, 22)  # non-multiple-of-16 dims exercise padding
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=True))
        assert out.shape == img.shape
        assert np.abs(out.astype(float) - img.astype(float)).mean() < 4.0

    def test_restart_markers(self):
        from graphrag_litex_spark.functions import jpeg

        img = _gradient(33, 49)
        plain = jpeg.encode_jpeg(img, quality=85)
        with_rst = jpeg.encode_jpeg(img, quality=85, restart_interval=2)
        assert b"\xff\xdd" in with_rst  # DRI segment present
        a = jpeg.decode_jpeg(plain).astype(float)
        b = jpeg.decode_jpeg(with_rst).astype(float)
        # RST only re-syncs the entropy stream; pixels must be identical.
        assert np.array_equal(a, b)

    def test_grayscale_single_component(self):
        from graphrag_litex_spark.functions import jpeg

        img = _gradient(17, 25)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, grayscale=True))
        assert out.shape == img.shape
        # All three output channels equal (replicated luma)...
        assert np.array_equal(out[..., 0], out[..., 1])
        assert np.array_equal(out[..., 1], out[..., 2])
        # ...and close to the true luma plane.
        luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        assert np.abs(out[..., 0].astype(float) - luma).mean() < 2.0

    def test_solid_color_near_exact(self):
        from graphrag_litex_spark.functions import jpeg

        img = np.full((16, 16, 3), [200, 30, 90], np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_noise_survives_structurally(self):
        from graphrag_litex_spark.functions import jpeg

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert np.abs(out.astype(float) - img.astype(float)).mean() < 12.0

    def test_decode_image_routes_jpeg(self):
        from graphrag_litex_spark.functions import jpeg

        img = _gradient(9, 11)
        payload = jpeg.encode_jpeg(img, quality=92)
        assert mc.detect_format(payload) == "jpeg"
        out = mc.decode_image(payload)
        assert out.shape == img.shape

    def test_progressive_raises_not_implemented(self):
        from graphrag_litex_spark.functions import jpeg

        payload = bytearray(jpeg.encode_jpeg(_gradient(9, 9)))
        sof = payload.index(b"\xff\xc0")
        payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(bytes(payload))

    def test_truncated_entropy_raises(self):
        from graphrag_litex_spark.functions import jpeg

        payload = jpeg.encode_jpeg(_gradient(25, 25))
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(payload[: len(payload) // 2])

    def test_fill_bytes_before_markers(self):
        """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        (some camera firmware pads); the parser must skip them."""
        from graphrag_litex_spark.functions import jpeg

        img = _gradient(9, 13)
        payload = jpeg.encode_jpeg(img, quality=90)
        # insert fill bytes before the SOF0 marker
        sof = payload.index(b"\xff\xc0")
        padded = payload[:sof] + b"\xff\xff\xff" + payload[sof:]
        out = jpeg.decode_jpeg(padded)
        assert np.array_equal(out, jpeg.decode_jpeg(payload))


@pytest.fixture(scope="module")
def media_df(spark):
    from pyspark.sql import Row

    from graphrag_litex_spark.functions import jpeg as _jpeg
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
        Row(media_id="img_png", kind="image", payload=bytes(mc.encode_png(img)),
            meta=Row(mime="image/png", width=6, height=4, duration_ms=None)),
        Row(media_id="aud_wav", kind="audio", payload=bytes(mc.encode_wav(rate, samples)),
            meta=Row(mime="audio/wav", width=None, height=None, duration_ms=3000)),
        Row(media_id="img_jpeg", kind="image", payload=b"\xff\xd8\xff\xe0fakejpeg",
            meta=Row(mime="image/jpeg", width=None, height=None, duration_ms=None)),
        Row(media_id="img_jpeg_real", kind="image",
            payload=bytes(_jpeg.encode_jpeg(np.ascontiguousarray(img), quality=95)),
            meta=Row(mime="image/jpeg", width=6, height=4, duration_ms=None)),
        Row(media_id="corrupt", kind="image", payload=b"BMgarbage",
            meta=Row(mime="image/bmp", width=None, height=None, duration_ms=None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


class TestSparkOperators:
    def test_decode_and_featurize(self, media_df):
        from graphrag_litex_spark.operators.multimodal import decode_and_featurize

        feats = {r["media_id"]: r.asDict() for r in decode_and_featurize(media_df).collect()}
        for mid in ("img_bmp", "img_ppm", "img_png"):
            f = feats[mid]
            assert f["decoded"] and (f["width"], f["height"]) == (6, 4)
            assert f["channel_mean"] == [200.0, 0.0, 0.0]
            assert f["luma_std"] == 0.0
        a = feats["aud_wav"]
        assert a["decoded"] and a["sample_rate"] == 8000 and a["duration_ms"] == 3000
        assert abs(a["rms"] - 0.25 / np.sqrt(2)) < 1e-3
        assert feats["img_jpeg"] == {**feats["img_jpeg"], "decoded": False, "format": "jpeg"}
        assert feats["corrupt"]["decoded"] is False  # envelope, not task failure
        # A real baseline JPEG decodes natively (functions/jpeg.py): true
        # dims and near-true channel means (lossy codec -> tolerance).
        j = feats["img_jpeg_real"]
        assert j["decoded"] and (j["width"], j["height"]) == (6, 4)
        assert abs(j["channel_mean"][0] - 200.0) < 4.0
        assert abs(j["channel_mean"][1]) < 4.0 and abs(j["channel_mean"][2]) < 4.0

    def test_resize_images(self, media_df):
        from graphrag_litex_spark.operators.multimodal import resize_images

        out = {r["media_id"]: r for r in resize_images(media_df, 3, 2).collect()}
        for mid in ("img_bmp", "img_ppm", "img_png", "img_jpeg_real"):
            img = mc.decode_ppm(bytes(out[mid]["payload"]))
            assert img.shape == (2, 3, 3)
            assert out[mid]["meta"]["width"] == 3 and out[mid]["meta"]["height"] == 2
        # Corrupt payload passes through untouched.
        assert bytes(out["img_jpeg"]["payload"]) == b"\xff\xd8\xff\xe0fakejpeg"

    def test_resize_images_png_output(self, media_df):
        from graphrag_litex_spark.operators.multimodal import resize_images

        out = {
            r["media_id"]: r
            for r in resize_images(media_df, 3, 2, out_format="png").collect()
        }
        for mid in ("img_bmp", "img_ppm", "img_png"):
            img = mc.decode_png(bytes(out[mid]["payload"]))
            assert img.shape == (2, 3, 3)
            assert out[mid]["meta"]["mime"] == "image/png"
        assert bytes(out["img_jpeg"]["payload"]) == b"\xff\xd8\xff\xe0fakejpeg"

    def test_resize_images_bad_format_rejected(self, media_df):
        from graphrag_litex_spark.operators.multimodal import resize_images

        with pytest.raises(ValueError):
            resize_images(media_df, 3, 2, out_format="webp")

    def test_sample_audio_windows(self, media_df):
        from graphrag_litex_spark.operators.multimodal import sample_audio_windows

        frames = sample_audio_windows(media_df, every_ms=1000).collect()
        assert [r["media_id"] for r in frames] == ["aud_wav"] * 3  # 3 s -> 3 windows
        assert [r["ts_ms"] for r in frames] == [0, 1000, 2000]
        rate, chunk = mc.decode_wav(bytes(frames[1]["payload"]))
        assert rate == 8000 and chunk.size == 8000


class TestMp4:
    """ISO BMFF container kernels (functions/mp4.py): the box tree, sample
    tables, and per-sample byte extents are REAL; codec decode is not."""

    def _payload(self, n=25, fps=10):
        from graphrag_litex_spark.functions import mp4

        samples = [bytes([i]) * (10 + i) for i in range(n)]
        return samples, mp4.encode_minimal_mp4(samples, fps=fps, width=64, height=48)

    def test_parse_metadata(self):
        from graphrag_litex_spark.functions import mp4

        _, payload = self._payload()
        assert mc.detect_format(payload) == "mp4"
        info = mp4.parse_mp4(payload)
        assert info.brand == "isom"
        assert info.duration_ms() == 2500  # 25 frames @ 10 fps
        t = info.video_track()
        assert t is not None
        assert (t.handler, t.codec) == ("vide", "avc1")
        assert (t.width, t.height) == (64, 48)
        assert t.n_samples == 25

    def test_samples_round_trip_bit_exact(self):
        from graphrag_litex_spark.functions import mp4

        samples, payload = self._payload()
        got = mp4.extract_samples(payload)
        assert [b for _, _, b in got] == samples
        assert [ts for _, ts, _ in got][:4] == [0, 100, 200, 300]

    def test_every_ms_grid(self):
        from graphrag_litex_spark.functions import mp4

        _, payload = self._payload()
        got = mp4.extract_samples(payload, every_ms=1000)
        assert [(i, ts) for i, ts, _ in got] == [(0, 0), (10, 1000), (20, 2000)]

    def test_truncated_raises(self):
        from graphrag_litex_spark.functions import mp4

        _, payload = self._payload()
        with pytest.raises(ValueError):
            mp4.parse_mp4(payload[: len(payload) // 3])
        with pytest.raises(ValueError):
            mp4.parse_mp4(b"\x00\x00\x00\x08free")  # no ftyp

    def test_featurize_reports_container_metadata(self, spark):
        from pyspark.sql import Row

        from graphrag_litex_spark.functions import mp4
        from graphrag_litex_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            decode_and_featurize,
        )

        _, payload = self._payload()
        media = spark.createDataFrame(
            [
                Row(media_id="vid", kind="video", payload=payload,
                    meta=Row(mime="video/mp4", width=None, height=None,
                             duration_ms=None)),
                Row(media_id="bad", kind="video", payload=b"\x00\x00\x00\x18ftypmp42garbage",
                    meta=Row(mime="video/mp4", width=None, height=None,
                             duration_ms=None)),
            ],
            MEDIA_SCHEMA,
        )
        feats = {r["media_id"]: r.asDict() for r in decode_and_featurize(media).collect()}
        v = feats["vid"]
        # Real container metadata, honest decoded=False (codec needs ffmpeg).
        assert v["format"] == "mp4" and v["decoded"] is False
        assert (v["width"], v["height"], v["duration_ms"]) == (64, 48, 2500)
        b = feats["bad"]  # corrupt container -> envelope, not task failure
        assert b["decoded"] is False and b["width"] is None

    def test_sample_frames_empty_tables_falls_back_to_stub(self, spark):
        """A parseable MP4 with NO samples in its tables (the fragmented
        /fMP4 shape, where samples live in moof boxes) must keep the
        one-frame-minimum invariant via the stub path — rows never vanish."""
        import struct

        from pyspark.sql import Row

        from graphrag_litex_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            sample_frames,
        )

        def box(tag, body):
            return struct.pack(">I", len(body) + 8) + tag + body

        # ftyp + empty moov: detected as mp4, parses, yields zero samples.
        payload = box(b"ftyp", b"isom" + b"\x00" * 8) + box(b"moov", b"")
        media = spark.createDataFrame(
            [Row(media_id="frag", kind="video", payload=payload,
                 meta=Row(mime="video/mp4", width=None, height=None,
                          duration_ms=2000))],
            MEDIA_SCHEMA,
        )
        out = sample_frames(media, every_ms=1000).collect()
        assert [r["frame_idx"] for r in out] == [0, 1]  # stub over duration_ms

    def test_sample_frames_real_mp4(self, spark):
        from pyspark.sql import Row

        from graphrag_litex_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            sample_frames,
        )

        samples, payload = self._payload()
        media = spark.createDataFrame(
            [Row(media_id="vid", kind="video", payload=payload,
                 meta=Row(mime="video/mp4", width=None, height=None,
                          duration_ms=None))],
            MEDIA_SCHEMA,
        )
        out = sample_frames(media, every_ms=1000).orderBy("frame_idx").collect()
        # True encoded access units out of mdat, on the 1000 ms grid.
        assert [(r["frame_idx"], r["ts_ms"]) for r in out] == [
            (0, 0), (10, 1000), (20, 2000),
        ]
        assert [bytes(r["payload"]) for r in out] == [samples[0], samples[10], samples[20]]


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
            assert np.array_equal(mc.decode_png(mc.encode_png(img)), img)

        check()

    def test_png_defilter_inverts_any_filter(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            h=st.integers(min_value=1, max_value=12),
            w=st.integers(min_value=1, max_value=12),
            filt=st.integers(min_value=0, max_value=4),
            seed=st.integers(min_value=0, max_value=2**31 - 1),
        )
        def check(h, w, filt, seed):
            img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            raw = _filter_rows(img.reshape(h, w * 3), bpp=3, filt=filt)
            assert np.array_equal(mc.decode_png(_wrap_png(w, h, 2, raw)), img)

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
