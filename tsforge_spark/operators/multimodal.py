"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery is real and tested — schema, partition-friendly
metadata extraction, Arrow-batched ``mapInPandas`` decode/feature
signatures with bounded batch shapes.  The actual media decode is stubbed
(codec libraries are not in this container): ``decode_image_features``
raises ``NotImplementedError`` unless ``fake=True``, in which case it
produces a deterministic feature vector from the bytes (so the pipeline
shape is testable end-to-end).

At 100 TB: binary payloads ride in their own parquet column (column
pruning keeps metadata-only queries from touching them); decode fans out
via ``mapInPandas`` whose batch size is bytes-bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` plus the row-group
layout, so one task never materializes more than a batch of blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(128, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(100, 60000)) if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection — must never touch ``payload`` (column
    pruning; verify with .explain ReadSchema)."""
    return df.select(
        "media_id", "kind", "mime", "width", "height", "duration_ms",
        F.length("payload").alias("n_bytes"),
    )


def decode_image_features(
    df: DataFrame, dim: int = 8, fake: bool = False
) -> DataFrame:
    """Arrow-batched decode → feature vector.  Real decode is stubbed;
    ``fake=True`` derives a deterministic feature from byte statistics
    (numpy over the whole batch — no per-row Python beyond the ndarray
    views pandas hands us)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass fake=True for the deterministic stub"
                )
            feats = []
            nbytes = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, dtype=np.uint8)
                nbytes.append(len(b))
                # deterministic "feature": means of dim equal chunks
                chunks = np.array_split(b.astype(np.float32), dim)
                feats.append(np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                    "feature": feats,
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)
