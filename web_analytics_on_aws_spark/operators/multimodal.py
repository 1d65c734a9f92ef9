"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (extension surface, BASELINE.json north star).

The Spark-side machinery — schemas, Arrow-batched Pandas transforms via
``mapInPandas``, partition-friendly shapes — is real and tested. The actual
media decode is STUBBED (the container ships no image/audio libraries):
``decode_media`` raises ``NotImplementedError`` unless ``fake=True``, in
which case a clearly-marked deterministic fake derives features from the
bytes so the pipeline is exercisable end-to-end.

Scale notes: mapInPandas streams Arrow record batches — constant memory per
task regardless of partition size; binary payloads never pass through the
driver. Decode parallelism = input partitions; for 100 TB of media, size
partitions by bytes (maxPartitionBytes) not rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct — the
    storage shape for any media payload (bytes + sidecar metadata)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("blob", blob).withColumn(
        "media_meta",
        F.struct(
            F.length(blob).cast("long").alias("n_bytes"),
            F.md5(blob).alias("content_md5"),
            F.lit(mime).alias("mime"),
        ),
    )


def decode_media(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    fake: bool = False,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode binary media → (dims, feature vector) via Arrow-batched
    ``mapInPandas``.

    Real decode is unavailable in this environment (no PIL/ffmpeg): call
    with ``fake=True`` to run the DETERMINISTIC FAKE (dims/features derived
    from byte content — stable across runs, engines, partitionings), or
    expect ``NotImplementedError`` from the executors otherwise.
    """

    def decode_batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires an image/audio library not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                digest = hashlib.sha256(b).digest()
                rows.append(
                    {
                        "doc_id": int(i),
                        "width": 16 + digest[0] % 64,
                        "height": 16 + digest[1] % 64,
                        "channels": 1 + digest[2] % 3,
                        "features": [
                            float(digest[j] / 255.0) for j in range(feature_dim)
                        ],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame/segment sampling plumbing: split a binary payload into
    ``n_frames`` evenly-spaced byte slices (what a video frame sampler's
    offset math looks like), one output row per frame — pure JVM exprs."""
    n = F.length(F.col(blob_col)).cast("long")
    return (
        df.select(
            id_col,
            blob_col,
            n.alias("n_bytes"),
            F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
        )
        .withColumn("offset", F.expr(f"(frame_idx * n_bytes) DIV {n_frames}"))
        .withColumn(
            "frame_bytes",
            F.expr(f"substring({blob_col}, cast(offset as int) + 1, "
                   f"cast(n_bytes / {n_frames} as int))"),
        )
        .select(id_col, "frame_idx", "offset", "frame_bytes")
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Media → unit-normalized embedding vector, the bridge from the
    multimodal columns to the similarity-search operators (the output
    schema matches the `embeddings` table, so `similarity.*` consume it
    unchanged). Real model inference is STUBBED (no torch/onnx here):
    ``fake=True`` derives a deterministic unit vector from a sha256 stream
    of the payload. Arrow-batched ``mapInPandas``; at scale this is the
    GPU-batch boundary — batch size = Arrow batch, constant memory."""

    def feature_batches(it: Iterator) -> Iterator:
        import hashlib
        import math

        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires an inference runtime absent "
                    "here; pass fake=True for the deterministic stub"
                )
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                stream = b""
                seed = bytes(blob)
                while len(stream) < dim:
                    seed = hashlib.sha256(seed).digest()
                    stream += seed
                raw = [stream[j] / 255.0 - 0.5 for j in range(dim)]
                norm = math.sqrt(sum(x * x for x in raw)) or 1.0
                rows.append(
                    {"doc_id": int(i), "embedding": [float(x / norm) for x in raw]}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(feature_batches, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized", StructType(
            [
                StructField("n_bytes", LongType()),
                StructField("content_md5", StringType()),
                StructField("mime", StringType()),
            ]
        )),
    ]
)


def resize_media(
    df: DataFrame,
    target: tuple[int, int] = (224, 224),
    blob_col: str = "blob",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Resize binary images to ``target`` via Arrow-batched ``mapInPandas``
    — the normalize-resolution step before feature extraction. Real resize
    is STUBBED (no PIL here): ``fake=True`` emits a deterministic
    size-correct payload (target_w × target_h × 3 bytes cycled from a
    sha256 of the input) with refreshed metadata, so batch shapes, schema,
    and downstream consumers are exercised for real.
    """
    tw, th = target

    def resize_batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL/opencv, absent here; pass "
                    "fake=True for the deterministic stub"
                )
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                seed = hashlib.sha256(bytes(blob)).digest()
                payload = (seed * ((tw * th * 3) // len(seed) + 1))[: tw * th * 3]
                rows.append(
                    {
                        "doc_id": int(i),
                        "width": tw,
                        "height": th,
                        "resized": {
                            "n_bytes": len(payload),
                            "content_md5": hashlib.md5(payload).hexdigest(),
                            "mime": "image/raw-rgb",
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(resize_batches, RESIZED_SCHEMA)
