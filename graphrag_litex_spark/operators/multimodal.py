"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct. The decode/feature-extract kernels are Arrow-batched
``mapInPandas`` functions.

Decode is REAL for the dependency-free formats — uncompressed 24-bit BMP,
binary PPM, 8-bit PNG (stdlib zlib, all scanline filters), baseline JPEG
(functions/jpeg.py), PCM WAV (functions/media_codecs.py, numpy + stdlib):
see ``decode_and_featurize`` (true pixel/audio features), ``resize_images``
(actual nearest-neighbor resample), ``sample_audio_windows`` (actual PCM
windowing). MP4 is real at the CONTAINER level (functions/mp4.py): true
duration/dimensions/codec metadata and true per-sample encoded bytes via
``sample_frames`` — only the codec stream inside still needs ffmpeg, so
those rows keep ``decoded=False``. Formats needing a native library
(GIF, progressive JPEG) go through Pillow when installed; otherwise they
return ``decoded=False`` envelopes, and the byte-level kernels keep their
honest stub (``decode_stub=True`` computes deterministic pseudo-features;
``decode_stub=False`` raises NotImplementedError where ffmpeg would plug
in). Spark plumbing — schema, batching, partitioning, cardinality changes —
is identical on both paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_histogram", T.ArrayType(T.IntegerType())),  # 16 buckets
    ]
)


def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Demo adapter: treat document text bytes as an opaque media payload
    (the testdata has no real media column; the plumbing is identical)."""
    return docs.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so one Python call handles a whole Arrow batch; output
    is a flat typed frame ready for downstream joins/dedup.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in this container"
                )
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [],
                "byte_mean": [],
                "byte_histogram": [],
            }
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                out["n_bytes"].append(int(arr.size))
                out["byte_mean"].append(float(arr.mean()) if arr.size else 0.0)
                hist, _ = np.histogram(arr, bins=16, range=(0, 256))
                out["byte_histogram"].append([int(x) for x in hist])
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Resize kernel: same MEDIA_SCHEMA out, payload transformed, meta
    updated. The stub 'resample' is a deterministic strided byte selection
    to exactly width*height bytes (repeating when the source is smaller) —
    a real implementation swaps in PIL/opencv inside the same batch fn;
    schema, batch shape and meta handling are unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires PIL/opencv; not in this container"
                )
            payloads = []
            metas = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
                idx = (np.arange(target) * arr.size // target) % arr.size
                payloads.append(arr[idx].tobytes())
                meta = dict(meta or {})
                meta["width"], meta["height"] = width, height
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampler: one OUTPUT ROW PER FRAME (mapInPandas changes
    cardinality — the shape a real ffmpeg-backed sampler needs).

    For REAL MP4 payloads the sample tables (stts/stsc/stsz/stco) are
    parsed (functions/mp4.py, stdlib only) and each output payload is the
    true encoded access unit out of mdat at the ``every_ms`` grid — exactly
    what a downstream GPU-decode stage consumes; pixel decode itself stays
    behind the honest codec boundary. Other formats use the stub slice
    (payload byte-range proportional to the timestamp) over
    ``meta.duration_ms``; rows without a duration yield one frame at t=0.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphrag_litex_spark.functions import media_codecs as mc
        from graphrag_litex_spark.functions import mp4

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg; not in this container"
                )
            mid, fidx, ts, pay = [], [], [], []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                payload = payload or b""
                if mc.detect_format(payload) == "mp4":
                    try:
                        extracted = mp4.extract_samples(
                            bytes(payload), every_ms=every_ms
                        )
                    except Exception:
                        extracted = []  # corrupt container -> stub slice below
                    # Empty tables (fragmented/fMP4: samples live in moof
                    # boxes this parser doesn't walk) also fall through to
                    # the stub so every media row keeps >= 1 output frame.
                    if extracted:
                        for idx, ts_ms, sample in extracted:
                            mid.append(media_id)
                            fidx.append(idx)
                            ts.append(ts_ms)
                            pay.append(sample)
                        continue
                duration = int((meta or {}).get("duration_ms") or 0)
                n_frames = max(1, duration // every_ms)
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    mid.append(media_id)
                    fidx.append(i)
                    ts.append(i * every_ms)
                    pay.append(payload[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": mid, "frame_idx": fidx, "ts_ms": ts, "payload": pay}
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)


DECODED_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channel_mean", T.ArrayType(T.DoubleType())),  # RGB
        T.StructField("luma_std", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_and_featurize(media: DataFrame) -> DataFrame:
    """REAL decode + feature extraction for dependency-free formats.

    Uncompressed BMP / binary PPM / 8-bit PNG / baseline JPEG images and
    PCM WAV audio are actually decoded (functions/media_codecs.py +
    functions/jpeg.py, numpy + stdlib only) and yield true content
    features: pixel dimensions, per-channel means, luma stddev for images;
    sample rate, duration, RMS level for audio. GIF and exotic streams
    (progressive JPEG, 16-bit PNG) decode through Pillow WHEN it is
    installed on executors (optional, import-guarded); otherwise those
    rows — and always MP4/... — come back ``decoded=False`` with the
    detected format: a per-row envelope, never a task failure (the C2
    stance).
    One Arrow batch per Python call; output is flat and join-ready.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from graphrag_litex_spark.functions import media_codecs as mc

        # Resolved once per task: {bmp, ppm} plus jpeg/png/gif when Pillow
        # is installed on the executor (optional dependency, import-guarded).
        img_fmts = mc.decodable_image_formats()
        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                fmt = mc.detect_format(payload)
                row = {
                    "media_id": media_id,
                    "kind": kind,
                    "format": fmt,
                    "decoded": False,
                    "width": None,
                    "height": None,
                    "channel_mean": None,
                    "luma_std": None,
                    "sample_rate": None,
                    "duration_ms": None,
                    "rms": None,
                }
                try:
                    if fmt in img_fmts:
                        img = mc.decode_image(payload)
                        luma = img.astype(np.float64).mean(axis=2)
                        row.update(
                            decoded=True,
                            width=int(img.shape[1]),
                            height=int(img.shape[0]),
                            channel_mean=[float(x) for x in img.mean(axis=(0, 1))],
                            luma_std=float(luma.std()),
                        )
                    elif fmt == "wav":
                        rate, samples = mc.decode_wav(payload)
                        row.update(
                            decoded=True,
                            sample_rate=int(rate),
                            duration_ms=int(1000 * samples.size / rate) if rate else 0,
                            rms=float(np.sqrt((samples**2).mean())) if samples.size else 0.0,
                        )
                    elif fmt == "mp4":
                        # Container metadata is REAL (stdlib box parse);
                        # decoded stays False — the codec stream inside
                        # needs ffmpeg, and we don't pretend otherwise.
                        from graphrag_litex_spark.functions import mp4

                        info = mp4.parse_mp4(bytes(payload))
                        vt = info.video_track()
                        row.update(
                            duration_ms=int(info.duration_ms()) or None,
                            width=int(vt.width) if vt and vt.width else None,
                            height=int(vt.height) if vt and vt.height else None,
                        )
                except Exception:
                    row["decoded"] = False  # corrupt payload -> envelope, not task failure
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_FEATURE_SCHEMA])

    return media.mapInPandas(batches, DECODED_FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, out_format: str = "ppm"
) -> DataFrame:
    """REAL image resize (nearest-neighbor) for decodable formats; output
    payload is re-encoded deterministically and dependency-free as
    ``out_format`` — "ppm" (raw, fastest) or "png" (zlib-compressed; the
    right choice when resized thumbnails feed a training-data sink, where
    payload bytes are shuffled and stored at corpus scale). Rows whose
    format cannot be decoded here pass through unchanged with their
    original meta — the honest boundary, flagged by mime staying put.
    """
    if out_format not in ("ppm", "png"):
        raise ValueError(f"out_format must be 'ppm' or 'png', got {out_format!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphrag_litex_spark.functions import media_codecs as mc

        img_fmts = mc.decodable_image_formats()
        encode, mime = (
            (mc.encode_png, "image/png")
            if out_format == "png"
            else (mc.encode_ppm, "image/x-portable-pixmap")
        )
        for pdf in it:
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                fmt = mc.detect_format(payload)
                meta = dict(meta or {})
                try:
                    if fmt not in img_fmts:
                        raise NotImplementedError(fmt)
                    img = mc.resize_nearest(mc.decode_image(payload), width, height)
                    payloads.append(encode(img))
                    meta.update(mime=mime, width=width, height=height)
                except Exception:  # undecodable/corrupt -> pass through unchanged
                    payloads.append(payload)
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def sample_audio_windows(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling for PCM WAV audio: one output row per
    ``every_ms`` window, payload = that window re-encoded as WAV (same
    FRAME_SCHEMA as the video sampler — cardinality-changing mapInPandas).
    Non-WAV rows are skipped (a real ffmpeg sampler plugs into
    ``sample_frames``; this is the decodable-format half done for real).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphrag_litex_spark.functions import media_codecs as mc

        for pdf in it:
            mid, fidx, ts, pay = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if mc.detect_format(payload) != "wav":
                    continue
                try:
                    rate, samples = mc.decode_wav(payload)
                except Exception:
                    continue
                win = max(1, int(rate * every_ms / 1000))
                for i in range(0, max(len(samples), 1), win):
                    chunk = samples[i : i + win]
                    if chunk.size == 0:
                        break
                    mid.append(media_id)
                    fidx.append(i // win)
                    ts.append(int(i * 1000 / rate))
                    pay.append(mc.encode_wav(rate, chunk))
            yield pd.DataFrame(
                {"media_id": mid, "frame_idx": fidx, "ts_ms": ts, "payload": pay}
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
