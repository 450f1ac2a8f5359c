"""Dependency-free baseline JPEG codec (numpy + stdlib only).

Makes the multimodal decode path REAL for the single most common training-
corpus image format without Pillow/libjpeg: baseline sequential DCT JPEG
(ITU-T T.81 SOF0) with Huffman entropy coding, 8-bit precision, grayscale
or YCbCr with sampling factors 1-2 (covers 4:4:4, 4:2:2, 4:2:0), restart
markers, and the standard Annex K quantization/Huffman tables on the
encode side. Progressive (SOF2), arithmetic coding, 12-bit precision and
hierarchical modes raise NotImplementedError — ``decode_image`` falls back
to Pillow for those when it is installed, else the operators' honest
``decoded=False`` envelope applies (the C2 stance).

The encoder exists so tests and fixtures can round-trip without any
external binary: it emits 4:4:4 or 4:2:0 interleaved baseline streams that
this decoder — and any standards-compliant one — can read. JPEG is lossy;
round-trip tests assert closeness (MAE/PSNR), not equality.

Reference parity: the reference repo has no media path at all — this module
(like the rest of operators/multimodal.py) is build-prompt scope, not a
port. All tables and layouts are from the public T.81 spec (Annexes F & K).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- tables (ITU-T T.81 Annex K) ------------------------------------------

# Raster index of the i-th coefficient in zigzag order (K.1 figure A.6).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Base quantization tables (K.1/K.2), raster order.
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Standard Huffman tables (K.3): (BITS counts for lengths 1..16, HUFFVAL).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: forward F = M @ b @ M.T matches
    the T.81 FDCT (A.3.3) scaling exactly; inverse b = M.T @ F @ M."""
    n = np.arange(8)
    m = 0.5 * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    m[0, :] = 0.5 / np.sqrt(2.0)
    return m


_DCT = _dct_matrix()


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> per-entry table in [1, 255]."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) -> {symbol: (code, length)} (T.81 C.2 canonical)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(BITS, HUFFVAL) -> {(length, code): symbol} for bit-serial decode."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_huffman_codes(bits, vals).items()
    }


# ---- YCbCr <-> RGB (JFIF full-range) ---------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., c].astype(np.float64) for c in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ---- bit I/O ---------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._nbits -= 8
            self._acc &= (1 << self._nbits) - 1
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            self.write(0x7F, 8 - self._nbits)  # pad with 1-bits (F.1.2.3)


class _BitReader:
    """MSB-first reader over entropy-coded data; unstuffs FF 00, stops at
    markers, and exposes restart-marker resync for DRI streams."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # A real marker inside entropy data (premature EOI /
                    # missing RST): surface as corrupt rather than looping.
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
            self._acc = byte
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self, expected: int) -> None:
        """Byte-align and consume the next RSTn marker (F.2.1.3.1)."""
        self._nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                marker = self.data[self.pos + 1]
                if 0xD0 <= marker <= 0xD7:
                    if marker - 0xD0 != expected:
                        raise ValueError("JPEG restart marker out of sequence")
                    self.pos += 2
                    return
                raise ValueError(f"expected RST marker, found 0xFF{marker:02X}")
            self.pos += 1
        raise ValueError("truncated JPEG: missing restart marker")


def _extend(value: int, nbits: int) -> int:
    """DIFF/coefficient magnitude decode (T.81 F.2.2.1 EXTEND)."""
    if nbits == 0:
        return 0
    return value if value >= (1 << (nbits - 1)) else value - (1 << nbits) + 1


def _magnitude(value: int) -> tuple[int, int]:
    """Signed value -> (category ssss, appended bits) for Huffman coding."""
    if value == 0:
        return 0, 0
    nbits = int(abs(value)).bit_length()
    return nbits, value if value >= 0 else value + (1 << nbits) - 1


# ---- encoder ---------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, qt_raster: np.ndarray) -> np.ndarray:
    """(H, W) float plane (multiple of 8) -> (H//8, W//8, 64) int zigzag
    coefficients. All blocks transform in one vectorized einsum."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    )  # (by, bx, 8, 8)
    coeff = np.einsum("ij,byjk,lk->byil", _DCT, blocks, _DCT)
    q = np.round(coeff / qt_raster.reshape(8, 8)).astype(np.int64)
    return q.reshape(h // 8, w // 8, 64)[..., ZIGZAG]


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    dc = int(zz[0])
    ssss, extra = _magnitude(dc - pred)
    code, length = dc_codes[ssss]
    writer.write(code, length)
    writer.write(extra, ssss)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        ssss, extra = _magnitude(v)
        code, length = ac_codes[(run << 4) | ssss]
        writer.write(code, length)
        writer.write(extra, ssss)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate pad both dims up to a multiple of ``mult``."""
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF JPEG bytes.

    ``subsample=False`` emits 4:4:4 (one 8x8 block per component per MCU);
    ``subsample=True`` emits 4:2:0 (16x16 MCU: four Y blocks + mean-pooled
    Cb, Cr) — the layout virtually all camera/web JPEGs use, so the decoder's
    multi-block MCU path is exercised by our own streams.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every that
    many MCUs (the resync layout long camera scans use).
    ``grayscale`` encodes the luma plane only (single-component SOF0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    h, w, _ = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ycc = _rgb_to_ycbcr(img)
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)

    if grayscale:
        subsample = False
        y_plane = _pad_to(ycc[..., 0], 8)
        cb = cr = None
        samp = [(1, 1)]
    elif subsample:
        y_plane = _pad_to(ycc[..., 0], 16)
        cb = _pad_to(ycc[..., 1], 16)
        cr = _pad_to(ycc[..., 2], 16)
        # mean-pool 2x2 -> chroma planes at half resolution (multiple of 8)
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        y_plane = _pad_to(ycc[..., 0], 8)
        cb = _pad_to(ycc[..., 1], 8)
        cr = _pad_to(ycc[..., 2], 8)
        samp = [(1, 1), (1, 1), (1, 1)]

    if grayscale:
        zz = [_fdct_quant(y_plane, qt_l)]
    else:
        zz = [
            _fdct_quant(y_plane, qt_l),
            _fdct_quant(cb, qt_c),
            _fdct_quant(cr, qt_c),
        ]
    ncomp = len(zz)

    dc_l = _build_huffman_codes(*HUFF_DC_LUMA)
    ac_l = _build_huffman_codes(*HUFF_AC_LUMA)
    dc_c = _build_huffman_codes(*HUFF_DC_CHROMA)
    ac_c = _build_huffman_codes(*HUFF_AC_CHROMA)
    comp_codes = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)][:ncomp]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    writer = _BitWriter()
    preds = [0] * ncomp
    rst_count = 0
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.flush()  # byte-align before the marker (F.1.2.3)
                writer.out += bytes([0xFF, 0xD0 + (rst_count & 7)])
                rst_count += 1
                preds = [0] * ncomp
            mcu_index += 1
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        block = zz[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            writer, block, preds[ci], *comp_codes[ci]
                        )
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in table[ZIGZAG]))

    def dht(tclass: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))

    sof_comps = b"".join(
        bytes([cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0 if cid == 0 else 1])
        for cid in range(ncomp)
    )
    sos_comps = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11])  # (dc_tid << 4) | ac_tid
        for cid in range(ncomp)
    )
    chroma_tables = b"" if grayscale else (
        dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)
    )
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, qt_l)
        + (b"" if grayscale else dqt(1, qt_c))
        + (seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b"")
        + seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
        + dht(0, 0, HUFF_DC_LUMA)
        + dht(1, 0, HUFF_AC_LUMA)
        + chroma_tables
        + seg(0xFFDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
        + bytes(writer.out)
        + b"\xff\xd9"  # EOI
    )


# ---- decoder ---------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (h, w, 3) uint8 RGB array.

    Supports SOF0 (and SOF1 extended-sequential Huffman, same layout),
    8-bit precision, 1 or 3 components, sampling factors 1-2, DRI/RSTn.
    Progressive / arithmetic / 12-bit / hierarchical raise
    NotImplementedError (decode_image falls back to Pillow when present)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")

    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, sh, sv, qid), ...])
    restart_interval = 0
    scan = None  # ([(comp_index, dc_tid, ac_tid), ...], entropy_start)

    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xFF:  # 0xFF fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / bare RST
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any scan
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec = body[i] >> 4
                tid = body[i] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit JPEG quantization tables")
                zzt = np.frombuffer(body, np.uint8, count=64, offset=i + 1).astype(
                    np.int64
                )
                raster = np.empty(64, np.int64)
                raster[ZIGZAG] = zzt
                qtables[tid] = raster
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tclass = body[i] >> 4
                tid = body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                huff[(tclass, tid)] = _build_huffman_decoder(bits, vals)
                i += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, sampling >> 4, sampling & 0x0F, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/arithmetic/hierarchical JPEG unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            comp_ids = [c[0] for c in frame[2]]
            sel = []
            for s in range(ns):
                cid = body[1 + 2 * s]
                tids = body[2 + 2 * s]
                sel.append((comp_ids.index(cid), tids >> 4, tids & 0x0F))
            scan = (sel, pos + 2 + seglen)
            break
        # APPn/COM/unknown: skipped
        pos += 2 + seglen

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    sel, entropy_start = scan
    if len(sel) != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) JPEG unsupported")
    for _, sh, sv, _ in comps:
        if not (1 <= sh <= 2 and 1 <= sv <= 2):
            raise NotImplementedError(f"JPEG sampling factor {sh}x{sv} unsupported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    # Per-component coefficient planes (block grid covering the MCU grid).
    planes = [
        np.zeros((mcus_y * sv * 8, mcus_x * sh * 8), np.float64)
        for _, sh, sv, _ in comps
    ]

    reader = _BitReader(payload, entropy_start)
    preds = [0] * len(comps)
    idct = _DCT.T
    rst_count = 0
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.sync_restart(rst_count & 7)
                rst_count += 1
                preds = [0] * len(comps)
            mcu_index += 1
            for ci, dc_tid, ac_tid in sel:
                _, sh, sv, qid = comps[ci]
                dc_table = huff.get((0, dc_tid))
                ac_table = huff.get((1, ac_tid))
                qt = qtables.get(qid)
                if dc_table is None or ac_table is None or qt is None:
                    raise ValueError("JPEG scan references missing table")
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, np.int64)
                        ssss = reader.decode_huffman(dc_table)
                        diff = _extend(reader.receive(ssss), ssss)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huffman(ac_table)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC coefficient overrun")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coeff = np.zeros(64, np.float64)
                        coeff[ZIGZAG] = zz * qt[ZIGZAG]
                        block = idct @ coeff.reshape(8, 8) @ _DCT + 128.0
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # Upsample each component to frame size (pixel replication) and convert.
    full = []
    for (cidx, (_, sh, sv, _)) in enumerate(comps):
        p = planes[cidx]
        if sh < hmax or sv < vmax:
            p = np.repeat(np.repeat(p, vmax // sv, axis=0), hmax // sh, axis=1)
        full.append(p[:fh, :fw])
    if len(comps) == 1:
        y = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG unsupported")
    return _ycbcr_to_rgb(full[0], full[1], full[2])
