"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct. The decode/feature-extract kernels are Arrow-batched
``mapInPandas`` functions; the actual media libraries (PIL/ffmpeg/...) are
NOT in this container, so the decode step is STUBBED: ``decode_stub=True``
(default) computes deterministic byte-level pseudo-features so the whole
Spark plumbing — schema, batching, partitioning, UDF signature — is real
and tested; ``decode_stub=False`` raises NotImplementedError where the real
decoder would plug in.
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
    cardinality — the shape a real ffmpeg-backed sampler needs). Frames are
    taken every ``every_ms`` of ``meta.duration_ms``; the stub 'frame' is
    the payload byte-slice proportional to the timestamp. Rows without a
    duration yield a single frame at t=0.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
