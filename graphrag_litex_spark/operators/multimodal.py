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


# ---- perceptual near-duplicate detection ----------------------------------

DHASH_SCHEMA = "media_id string, format string, decoded boolean, dhash long"


def image_dhash(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """64-bit difference hash (dHash) per image -> (media_id, format,
    decoded, dhash).

    The standard perceptual fingerprint for image near-dup detection:
    decode -> luma -> nearest-neighbor downsample to (hash_size,
    hash_size+1) -> one bit per horizontal gradient sign. Re-encodes,
    resizes, format conversions, and small pixel edits perturb few bits, so
    near-duplicate images land within a small Hamming distance — the image
    analog of SimHash on text. Decode failures / undecodable codecs come
    back ``decoded=False, dhash=NULL`` (the C2 envelope stance), never a
    task failure. ``hash_size`` is validated driver-side: the hash is
    ``hash_size²`` bits and must fit the signed-int64 ``dhash`` column (and
    :func:`dhash_near_dup_pairs`'s 64-bit banding), so ``hash_size <= 8``.

    Arrow-batched ``mapInPandas``; the per-image work is a numpy index
    gather + comparison, so throughput is decode-bound. At 100 TB the
    output is 16 bytes/image — the table that ships to
    :func:`dhash_near_dup_pairs` — while payload bytes never shuffle.
    """

    if not 1 <= hash_size * hash_size <= 64:
        raise ValueError(f"hash_size² must be in [1, 64] bits, got {hash_size}²")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from graphrag_litex_spark.functions import media_codecs as mc

        img_fmts = mc.decodable_image_formats()
        for pdf in it:
            mid, fmts, dec, hs = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                fmt = mc.detect_format(payload)
                mid.append(media_id)
                fmts.append(fmt)
                h = None
                if fmt in img_fmts:
                    try:
                        img = mc.decode_image(payload)
                        luma = img.astype(np.float64).mean(axis=2)
                        g = mc.resize_nearest(luma, hash_size + 1, hash_size)
                        bits = (g[:, :-1] > g[:, 1:]).flatten()
                        # packbits is MSB-first per byte == the (acc << 1) | b
                        # bit loop, vectorized (identical ints, unit-tested).
                        acc = int.from_bytes(np.packbits(bits).tobytes(), "big")
                        acc >>= (8 - len(bits) % 8) % 8
                        if acc >= 1 << 63:  # wrap to signed int64
                            acc -= 1 << 64
                        h = acc
                    except Exception:
                        h = None
                dec.append(h is not None)
                hs.append(h)
            yield pd.DataFrame(
                {"media_id": mid, "format": fmts, "decoded": dec, "dhash": hs}
            )

    return media.mapInPandas(batches, DHASH_SCHEMA)


def dhash_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 4, hash_col: str = "dhash"
) -> DataFrame:
    """Near-duplicate pairs -> (id_a, id_b, hamming), hamming <=
    ``max_hamming``, id_a < id_b, over ANY 64-bit perceptual fingerprint
    column (image dHash, audio energy fingerprint, ...).

    Hamming-LSH by pigeonhole: the 64-bit hash splits into
    ``max_hamming + 1`` bands, so any pair within ``max_hamming`` bit flips
    agrees EXACTLY on at least one band — candidate generation is a hash
    equi-join on (band, value) with ZERO false negatives (this is exact
    search, not probabilistic LSH), then one codegen'd
    ``bit_count(a ^ b)`` verify. Never an all-pairs product; band values
    for mega-clusters (icons repeated corpus-wide) are the skew keys —
    AQE skew-join splits them, and the verify input is ids+hashes only
    (16 bytes/row)."""
    bands = max_hamming + 1
    base_w, extra = divmod(64, bands)
    rows, start = [], 0
    for i in range(bands):
        w = base_w + (1 if i < extra else 0)
        rows.append(
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned("dhash", start)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("value"),
            )
        )
        start += w
    banded = (
        hashes.withColumn("dhash", F.col(hash_col))
        .where(F.col("dhash").isNotNull())
        .select("media_id", "dhash", F.explode(F.array(*rows)).alias("b"))
        .select("media_id", "dhash", "b.band", "b.value")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.value") == F.col("b.value"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


import threading as _threading

# Thread-LOCAL lazy RandomState, re-seeded per image (see fixture_image):
# a shared instance would interleave seed/draw pairs across driver threads
# (the pipeline runs stages from a thread pool) and produce wrong pixels.
_FIXTURE_TLS = _threading.local()


def fixture_image(doc_id: int):
    """Deterministic 32x32 RGB image for integer ``doc_id`` — the shared
    pixel source for the image-dedup contract query and its pure-Python
    golden (the testdata ships no real media; pixels being a pure function
    of the id keeps the two sides trivially in agreement while the codec
    round-trip, dHash, banding, and verify join stay differentially
    tested). Ids with ``doc_id % 10 == 7`` replicate the previous id's
    image with a single-pixel edit: planted near-duplicates."""
    import numpy as np

    base_id = doc_id - 1 if doc_id % 10 == 7 and doc_id > 0 else doc_id
    # Per-id uniform noise: distinct ids land ~32 bits apart (random
    # gradients), so ONLY the planted pairs are near — the dedup output is
    # exactly the planted set plus rare random collisions. Re-seeding one
    # module-level RandomState yields the identical stream to constructing
    # a fresh one (same init_by_array path) at ~1/70th the per-image cost
    # — construction dominated the whole fixture render.
    rng = getattr(_FIXTURE_TLS, "rng", None)
    if rng is None:
        rng = _FIXTURE_TLS.rng = np.random.RandomState(0)
    rng.seed(base_id % 100003)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    if base_id != doc_id:
        img = img.copy()
        img[doc_id % 32, (3 * doc_id) % 32] = (255, 0, 255)
    return img


def media_fixture_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, kind, payload) frame of :func:`fixture_image` renders —
    PPM for most ids, BMP for ``doc_id % 3 == 0`` (two containers so the
    dedup path proves container-invariance)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphrag_litex_spark.functions import media_codecs as mc

        for pdf in it:
            mid, kind, pay = [], [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                img = fixture_image(d)
                enc = mc.encode_bmp if d % 3 == 0 else mc.encode_ppm
                mid.append(str(d))
                kind.append("image")
                pay.append(enc(img))
            yield pd.DataFrame({"media_id": mid, "kind": kind, "payload": pay})

    # Spread the id-only frame BEFORE the render: a single small parquet
    # file arrives as one input split, which would serialize the CPU-bound
    # render + downstream decode into one task. The shuffle moves 8
    # bytes/row; the render fans out to every core.
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    ids = ids.repartition(ids.sparkSession.sparkContext.defaultParallelism)
    return ids.mapInPandas(
        batches, "media_id string, kind string, payload binary"
    )


AUDIO_FP_SCHEMA = "media_id string, format string, decoded boolean, fingerprint long"


def audio_fingerprint(media: DataFrame, n_windows: int = 65) -> DataFrame:
    """64-bit perceptual audio fingerprint -> (media_id, format, decoded,
    fingerprint): decode PCM -> split into ``n_windows`` equal windows ->
    one bit per energy-gradient sign between consecutive windows — the
    audio analog of dHash (re-encodes and small edits perturb few bits;
    time-shifts perturb proportionally). Window energies are summed in
    INTEGER int16²-space, so the fingerprint is bit-exact across engines
    and partitionings (no float summation-order dependence). Undecodable
    rows -> ``decoded=False, fingerprint=NULL`` envelope. Near-dup pairs:
    feed to :func:`dhash_near_dup_pairs` with ``hash_col="fingerprint"``.

    ``n_windows`` is validated driver-side: the hash is ``n_windows - 1``
    bits and must fit the signed-int64 column (and the pair join's 64-bit
    banding), so ``n_windows <= 65``.
    """
    if not 2 <= n_windows <= 65:
        raise ValueError(f"n_windows must be in [2, 65] (<= 64 bits), got {n_windows}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from graphrag_litex_spark.functions import media_codecs as mc

        for pdf in it:
            mid, fmts, dec, fps = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                fmt = mc.detect_format(payload)
                mid.append(media_id)
                fmts.append(fmt)
                fp = None
                if fmt == "wav":
                    try:
                        _, samples = mc.decode_wav(payload)
                        # exact int16 reconstruction (k/2^15 is exact in
                        # float64), then order-free integer energy sums
                        s16 = np.rint(samples * 32768.0).astype(np.int64)
                        n = s16.size
                        acc = 0
                        prev = None
                        for i in range(n_windows):
                            w = s16[(i * n) // n_windows : ((i + 1) * n) // n_windows]
                            e = int((w * w).sum())
                            if prev is not None:
                                acc = (acc << 1) | (1 if prev > e else 0)
                            prev = e
                        if acc >= 1 << 63:
                            acc -= 1 << 64
                        fp = acc
                    except Exception:
                        fp = None
                dec.append(fp is not None)
                fps.append(fp)
            yield pd.DataFrame(
                {"media_id": mid, "format": fmts, "decoded": dec, "fingerprint": fps}
            )

    return media.mapInPandas(batches, AUDIO_FP_SCHEMA)


def fixture_audio(doc_id: int):
    """Deterministic (rate, int16-float samples) for integer ``doc_id`` —
    shared sample source for the audio-dedup contract query and its golden
    (same stance as :func:`fixture_image`). Ids with ``doc_id % 10 == 7``
    replicate the previous id's signal with a tiny localized edit:
    planted near-duplicates."""
    import numpy as np

    base_id = doc_id - 1 if doc_id % 10 == 7 and doc_id > 0 else doc_id
    rng = np.random.RandomState((base_id * 7 + 3) % 100003)
    samples = (rng.randint(-20000, 20000, 2048).astype(np.float64)) / 32768.0
    if base_id != doc_id:
        samples = samples.copy()
        pos = (doc_id * 13) % 2000
        samples[pos : pos + 8] = 0.5
    return 8000, samples


def audio_fixture_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, kind, payload) frame of WAV-encoded fixture signals."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphrag_litex_spark.functions import media_codecs as mc

        for pdf in it:
            mid, kind, pay = [], [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate, samples = fixture_audio(d)
                mid.append(str(d))
                kind.append("audio")
                pay.append(mc.encode_wav(rate, samples))
            yield pd.DataFrame({"media_id": mid, "kind": kind, "payload": pay})

    # Same id-only spread as media_fixture_from_docs: parallelize the
    # synth + encode across cores instead of one input split's task.
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    ids = ids.repartition(ids.sparkSession.sparkContext.defaultParallelism)
    return ids.mapInPandas(
        batches, "media_id string, kind string, payload binary"
    )
