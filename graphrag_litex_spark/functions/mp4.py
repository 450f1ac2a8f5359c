"""Dependency-free MP4 (ISO BMFF, ISO/IEC 14496-12) container kernels.

Pixel/audio decode of the codec streams inside an MP4 genuinely needs
ffmpeg — that boundary stays honest (``decoded=False`` in the operators).
But the CONTAINER is a plain box tree, fully parseable with stdlib
``struct``: real duration, track count, video dimensions, codec fourcc,
and — via the stts/stsc/stsz/stco sample tables — the exact byte extent of
every encoded sample. That makes the multimodal video path real at the
container level: ``decode_and_featurize`` reports true metadata and
``sample_frames`` emits true per-sample payload bytes (one row per encoded
frame), which is exactly what a downstream ffmpeg/NVDEC stage consumes.

``encode_minimal_mp4`` builds a spec-shaped single-track file (ftyp + mdat
+ moov with full sample tables) so tests exercise the parser against real
box layouts without shipping binary fixtures.

Reference parity: the reference repo has no media path — this module (like
operators/multimodal.py) is build-prompt scope, not a port.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for the boxes in data[start:end]."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad MP4 box size {size} for {tag!r}")
        yield tag, body, pos + size
        pos += size


def _full_box(data: bytes, start: int) -> tuple[int, int]:
    """FullBox header -> (version, body start after version/flags)."""
    return data[start], start + 4


@dataclass
class Mp4Track:
    handler: str | None = None  # "vide" / "soun" / ...
    codec: str | None = None  # sample-entry fourcc, e.g. "avc1"
    width: int | None = None
    height: int | None = None
    timescale: int = 0
    duration: int = 0
    # sample tables (raw, per ISO 14496-12 §8.6-8.7)
    stts: list[tuple[int, int]] = field(default_factory=list)  # (count, delta)
    stsc: list[tuple[int, int]] = field(default_factory=list)  # (first_chunk, per_chunk)
    sizes: list[int] = field(default_factory=list)
    fixed_size: int = 0
    chunk_offsets: list[int] = field(default_factory=list)

    @property
    def n_samples(self) -> int:
        return sum(c for c, _ in self.stts)

    def duration_ms(self) -> int:
        return int(self.duration * 1000 / self.timescale) if self.timescale else 0

    def sample_table(self) -> list[tuple[int, int, int, int]]:
        """-> [(sample_idx, ts_ms, file_offset, size)] from the four boxes.

        Walks stsc runs to map samples into chunks (offsets from stco),
        accumulating intra-chunk offsets from stsz and timestamps from stts
        — the standard §8.7.4 reconstruction, linear in sample count."""
        n = self.n_samples
        sizes = self.sizes if self.sizes else [self.fixed_size] * n
        if len(sizes) < n:
            raise ValueError("MP4 stsz shorter than stts sample count")
        # expand stts -> per-sample decode timestamp (track timescale units)
        ts_units: list[int] = []
        t = 0
        for count, delta in self.stts:
            for _ in range(count):
                ts_units.append(t)
                t += delta
        # stsc runs: entry i applies to chunks first_chunk_i .. first_{i+1}-1
        out: list[tuple[int, int, int, int]] = []
        si = 0
        n_chunks = len(self.chunk_offsets)
        for ei, (first_chunk, per_chunk) in enumerate(self.stsc):
            last_chunk = (
                self.stsc[ei + 1][0] - 1 if ei + 1 < len(self.stsc) else n_chunks
            )
            for chunk in range(first_chunk, last_chunk + 1):
                if chunk > n_chunks or si >= n:
                    break
                off = self.chunk_offsets[chunk - 1]
                for _ in range(per_chunk):
                    if si >= n:
                        break
                    ms = (
                        int(ts_units[si] * 1000 / self.timescale)
                        if self.timescale
                        else 0
                    )
                    out.append((si, ms, off, sizes[si]))
                    off += sizes[si]
                    si += 1
        return out


@dataclass
class Mp4Info:
    brand: str | None
    timescale: int
    duration: int
    tracks: list[Mp4Track]

    def duration_ms(self) -> int:
        return int(self.duration * 1000 / self.timescale) if self.timescale else 0

    def video_track(self) -> Mp4Track | None:
        for t in self.tracks:
            if t.handler == "vide":
                return t
        return None


def parse_mp4(payload: bytes) -> Mp4Info:
    """Parse the box tree of an MP4/MOV payload -> container metadata.

    Reads ftyp/mvhd/tkhd/mdhd/hdlr/stsd and the four sample tables; every
    other box is skipped by size, so unknown boxes never break the walk."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (missing ftyp)")
    brand = payload[8:12].decode("latin-1")
    info = Mp4Info(brand=brand, timescale=0, duration=0, tracks=[])

    def walk(start: int, end: int, track: Mp4Track | None) -> None:
        for tag, body, box_end in _iter_boxes(payload, start, end):
            if tag == b"trak":
                t = Mp4Track()
                info.tracks.append(t)
                walk(body, box_end, t)
            elif tag in _CONTAINERS:
                walk(body, box_end, track)
            elif tag == b"mvhd":
                v, p = _full_box(payload, body)
                if v == 1:
                    info.timescale, info.duration = struct.unpack_from(
                        ">IQ", payload, p + 16
                    )
                else:
                    info.timescale, info.duration = struct.unpack_from(
                        ">II", payload, p + 8
                    )
            elif tag == b"tkhd" and track is not None:
                v, p = _full_box(payload, body)
                # width/height are the LAST 8 bytes (16.16 fixed) in both
                # versions — offset from the end avoids version math.
                tw, th = struct.unpack_from(">II", payload, box_end - 8)
                track.width = tw >> 16 or None
                track.height = th >> 16 or None
            elif tag == b"mdhd" and track is not None:
                v, p = _full_box(payload, body)
                if v == 1:
                    track.timescale, track.duration = struct.unpack_from(
                        ">IQ", payload, p + 16
                    )
                else:
                    track.timescale, track.duration = struct.unpack_from(
                        ">II", payload, p + 8
                    )
            elif tag == b"hdlr" and track is not None:
                track.handler = payload[body + 8 : body + 12].decode("latin-1")
            elif tag == b"stsd" and track is not None:
                _, p = _full_box(payload, body)
                (n_entries,) = struct.unpack_from(">I", payload, p)
                if n_entries >= 1:
                    track.codec = payload[p + 8 : p + 12].decode("latin-1")
            elif tag == b"stts" and track is not None:
                _, p = _full_box(payload, body)
                (n,) = struct.unpack_from(">I", payload, p)
                track.stts = [
                    struct.unpack_from(">II", payload, p + 4 + 8 * i) for i in range(n)
                ]
            elif tag == b"stsc" and track is not None:
                _, p = _full_box(payload, body)
                (n,) = struct.unpack_from(">I", payload, p)
                track.stsc = [
                    struct.unpack_from(">II", payload, p + 4 + 12 * i)[:2]
                    for i in range(n)
                ]
            elif tag == b"stsz" and track is not None:
                _, p = _full_box(payload, body)
                track.fixed_size, n = struct.unpack_from(">II", payload, p)
                if track.fixed_size == 0:
                    track.sizes = list(
                        struct.unpack_from(f">{n}I", payload, p + 8)
                    )
            elif tag == b"stco" and track is not None:
                _, p = _full_box(payload, body)
                (n,) = struct.unpack_from(">I", payload, p)
                track.chunk_offsets = list(struct.unpack_from(f">{n}I", payload, p + 4))
            elif tag == b"co64" and track is not None:
                _, p = _full_box(payload, body)
                (n,) = struct.unpack_from(">I", payload, p)
                track.chunk_offsets = list(struct.unpack_from(f">{n}Q", payload, p + 4))

    walk(0, len(payload), None)
    return info


def extract_samples(
    payload: bytes, every_ms: int = 0
) -> list[tuple[int, int, bytes]]:
    """-> [(frame_idx, ts_ms, encoded_sample_bytes)] for the video track.

    ``every_ms`` > 0 keeps only the first sample at/after each tick (the
    frame-sampling grid); 0 keeps every sample. The bytes are the real
    encoded access units out of mdat — what a GPU decode stage consumes."""
    info = parse_mp4(payload)
    track = info.video_track() or (info.tracks[0] if info.tracks else None)
    if track is None:
        raise ValueError("MP4 has no tracks")
    out: list[tuple[int, int, bytes]] = []
    next_tick = 0
    for idx, ts_ms, off, size in track.sample_table():
        if every_ms > 0:
            if ts_ms < next_tick:
                continue
            next_tick = (ts_ms // every_ms + 1) * every_ms
        if off + size > len(payload):
            raise ValueError("MP4 sample extends past payload end")
        out.append((idx, ts_ms, payload[off : off + size]))
    return out


# ---- fixture muxer ---------------------------------------------------------


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def encode_minimal_mp4(
    samples: list[bytes],
    fps: int = 10,
    width: int = 64,
    height: int = 48,
    codec: bytes = b"avc1",
) -> bytes:
    """One-video-track MP4 with full sample tables (fixture muxer).

    ``samples`` are opaque encoded-frame byte strings laid into mdat; the
    moov sample tables index them exactly (one chunk, constant frame
    duration), so parse_mp4/extract_samples round-trip them bit-for-bit."""
    if not samples:
        raise ValueError("need at least one sample")
    timescale = fps * 100
    delta = 100  # per-frame duration in timescale units
    duration = delta * len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    chunk_offset = len(ftyp) + 8  # first sample starts right after mdat header
    mdat = _box(b"mdat", mdat_payload)

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10 + matrix + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in-movie | in-preview
        struct.pack(">IIII", 0, 0, 1, 0)  # ctime, mtime, track_id, reserved
        + struct.pack(">I", duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        codec,
        b"\x00" * 6 + struct.pack(">H", 1)  # data reference index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, len(samples), delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(samples), 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
