"""Dependency-free media codecs (numpy + stdlib only).

The container has no PIL/ffmpeg/opencv, but several real media formats are
fully decodable without them: uncompressed 24-bit BMP, binary PPM (P6), PCM
WAV, — via stdlib ``zlib`` — 8-bit non-interlaced PNG (all five scanline
filters, gray/RGB/palette/alpha color types), and — via functions/jpeg.py —
baseline sequential JPEG (SOF0/SOF1, sampling factors 1-2, restart markers).
These kernels make the multimodal operators' decode path REAL for those
formats — formats whose codecs genuinely need a native library (GIF/MP4/...,
progressive JPEG) remain the honest stub, upgraded transparently when Pillow
is installed. Pure functions shared by the Spark UDFs and the tests,
following the functions/ pattern (same code on both sides of the
differential).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---- detection -----------------------------------------------------------

_MAGIC = [
    (b"BM", "bmp"),
    (b"P6", "ppm"),
    (b"RIFF", "wav"),  # verified against the WAVE tag below
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG", "png"),
    (b"GIF8", "gif"),
]


def detect_format(payload: bytes | None) -> str | None:
    if not payload:
        return None
    for magic, name in _MAGIC:
        if payload[: len(magic)] == magic:
            if name == "wav" and payload[8:12] != b"WAVE":
                continue
            return name
    if payload[4:8] == b"ftyp":
        return "mp4"
    return None


DECODABLE = {"bmp", "ppm", "wav", "png", "jpeg"}

# Image formats decodable ONLY IF Pillow is installed (optional dependency —
# absent in this container; the import is guarded so the operators degrade
# to the decoded=False envelope, never a task failure). PNG and JPEG are NOT
# in this set: they decode natively (stdlib zlib / functions/jpeg.py);
# Pillow is only a fallback there for exotic streams (16-bit or interlaced
# PNG, progressive or 12-bit JPEG).
PIL_IMAGE_FORMATS = {"gif"}


def _pil():
    """Lazy, import-guarded Pillow handle (None when not installed).

    Called inside executor UDFs too — the try/except runs per call but
    Python caches the module, so the cost is a dict lookup."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decodable_image_formats() -> set[str]:
    """Image formats decode_image can actually decode in THIS environment."""
    base = {"bmp", "ppm", "png", "jpeg"}
    return base | PIL_IMAGE_FORMATS if _pil() else base

# ---- images --------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} unsupported")
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = abs(h)
    arr = np.frombuffer(payload, np.uint8, count=row_bytes * rows, offset=pixel_off)
    arr = arr.reshape(rows, row_bytes)[:, : w * 3].reshape(rows, w, 3)
    if h > 0:  # positive height = bottom-up storage
        arr = arr[::-1]
    return arr[..., ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP bytes."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    data_size = row_bytes * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    bgr = img[..., ::-1]
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows[::-1].tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # Header = 4 whitespace-separated tokens (comments start with '#').
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    # Exactly ONE whitespace byte separates maxval from the pixel stream
    # (PPM spec). Some Windows tools emit CRLF there. '\r' + first pixel
    # byte 0x0A is indistinguishable from CRLF by bytes alone, so use the
    # remaining length to disambiguate: prefer the skip that makes the
    # pixel stream fit exactly; fall back to treating '\r\n' as one
    # separator (the common Windows case, possibly with trailing bytes).
    sep = payload[i : i + 1]
    if not sep.isspace():
        raise ValueError("PPM header not followed by whitespace")
    need = w * h * 3
    rest = len(payload) - i
    if payload[i : i + 2] == b"\r\n" and rest - 1 != need:
        i += 2
    else:
        i += 1
    return np.frombuffer(payload, np.uint8, count=need, offset=i).reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


# ---- PNG (stdlib zlib; RFC 2083) ----------------------------------------

# color type -> channels at 8-bit depth (0 gray, 2 RGB, 3 palette,
# 4 gray+alpha, 6 RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 8-bit truecolor PNG (filter 0 scanlines)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), np.uint8)  # leading 0 = filter None per row
    raw[:, 1:] = img.reshape(h, w * 3)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> (h, w, 3) uint8 RGB array.

    Handles all five scanline filters (None/Sub/Up/Average/Paeth) and color
    types 0/2/3/4/6; alpha is dropped (the ``convert("RGB")`` analog).
    16-bit depth, sub-byte depths, and Adam7 interlacing raise
    NotImplementedError (decode_image falls back to Pillow when present)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    idat = bytearray()
    palette = None
    w = h = depth = ctype = interlace = None
    i = 8
    while i + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, i)
        tag = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        i += 12 + ln  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} color={ctype} interlace={interlace} unsupported"
        )
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel stream length mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)

    # Defilter (spec §6): rows depend on the row above, so the row loop is
    # sequential; Up/None rows stay vectorized, and Sub/Average/Paeth walk
    # bytes within the row (fine at thumbnail scale — parallelism comes from
    # the Arrow batch of many images per task, not from within one image).
    rows = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = raw[y, 0]
        cur = raw[y, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif f == 2:  # Up
            cur = (cur.astype(np.uint16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        rows[y] = cur
        prev = cur

    if ctype == 2:
        img = rows.reshape(h, w, 3)
    elif ctype == 0:
        img = np.repeat(rows.reshape(h, w, 1), 3, axis=2)
    elif ctype == 4:
        img = np.repeat(rows.reshape(h, w, 2)[:, :, :1], 3, axis=2)
    elif ctype == 6:
        img = rows.reshape(h, w, 4)[:, :, :3]
    else:  # 3: palette
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        img = palette[rows.reshape(h, w)]
    return np.ascontiguousarray(img)


def decode_image(payload: bytes) -> np.ndarray:
    fmt = detect_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "png":
        try:
            return decode_png(payload)
        except NotImplementedError:
            if _pil() is None:  # 16-bit/interlaced PNG without Pillow
                raise
    if fmt == "jpeg":
        from graphrag_litex_spark.functions.jpeg import decode_jpeg

        try:
            return decode_jpeg(payload)
        except NotImplementedError:
            if _pil() is None:  # progressive/12-bit JPEG without Pillow
                raise
    if fmt in PIL_IMAGE_FORMATS or fmt in ("png", "jpeg"):
        Image = _pil()
        if Image is not None:
            img = Image.open(io.BytesIO(payload))
            return np.asarray(img.convert("RGB"), dtype=np.uint8)
    raise NotImplementedError(f"image format {fmt or 'unknown'} needs PIL/opencv")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, pure indexing (vectorized, no Python loop)."""
    h, w = img.shape[:2]
    yy = (np.arange(height) * h) // height
    xx = (np.arange(width) * w) // width
    return img[yy][:, xx]


# ---- audio ---------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV -> (sample_rate, float64 mono array in [-1, 1])."""
    with wave.open(io.BytesIO(payload)) as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        channels = wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        arr = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit WAV unsupported")
    if channels > 1:
        arr = arr.reshape(-1, channels).mean(axis=1)
    return rate, arr


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((np.clip(samples, -1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()
