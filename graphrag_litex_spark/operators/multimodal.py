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
