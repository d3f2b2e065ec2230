"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery is real and tested — schema, partition-friendly
metadata extraction, Arrow-batched ``mapInPandas`` decode/feature
signatures with bounded batch shapes.  The actual media decode goes
through ONE pluggable seam (``_resolve_decoder``): deployments inject a
codec-backed ``decode_fn`` without touching engine code, tests pin the
deterministic ``fake=True`` stubs, and a job configured with neither
fails fast on the driver (codec libraries are not in this container).

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


def _resolve_decoder(decode_fn, fake: bool, fake_fn, what: str):
    """THE media-decoder seam — the ONE env-gate for real codecs.

    Deployments inject ``decode_fn`` (a picklable callable backed by
    PIL/libvips/ffmpeg/torchvision — whatever the cluster images carry)
    and the engine code never changes; ``fake=True`` selects the
    deterministic byte-level stub the tests pin; neither → raise HERE,
    at plan-build time on the driver, so a misconfigured job fails fast
    with a clear message instead of from inside an executor UDF."""
    if decode_fn is not None:
        return decode_fn
    if fake:
        return fake_fn
    raise NotImplementedError(
        f"no {what} decoder configured: media codec libraries are not "
        "available in this environment.  Inject decode_fn=<your codec "
        "callable> (must be cloudpickle-able; e.g. PIL/libvips/ffmpeg-"
        "backed), or pass fake=True for the deterministic byte-level stub."
    )


def _fake_image_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: means of ``dim`` equal byte
    chunks (float32) — shape-identical to a real embedding decoder."""
    b = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(b.astype(np.float32), dim)
    return np.array(
        [c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32
    )


def decode_image_features(
    df: DataFrame, dim: int = 8, fake: bool = False, decode_fn=None
) -> DataFrame:
    """Arrow-batched decode → feature vector.

    ``decode_fn(payload: bytes) -> np.ndarray[float32]`` is the decoder
    seam (see ``_resolve_decoder``); ``fake=True`` uses the
    deterministic byte-statistics stub."""
    decoder = _resolve_decoder(
        decode_fn, fake, lambda p: _fake_image_features(p, dim),
        "image-feature",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            nbytes = []
            for payload in pdf["payload"]:
                nbytes.append(len(payload))
                feats.append(
                    np.asarray(decoder(payload), dtype=np.float32)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                    "feature": feats,
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic nearest-neighbor resample of the raw byte stream —
    same fixed-size output contract as a real pixel resampler."""
    b = np.frombuffer(payload, dtype=np.uint8)
    target = width * height
    idx = np.minimum((np.arange(target) * len(b) // target), len(b) - 1)
    return b[idx].tobytes()


def resize_image(
    df: DataFrame, width: int = 32, height: int = 32, fake: bool = False,
    decode_fn=None,
) -> DataFrame:
    """Resize plumbing: Arrow-batched ``mapInPandas`` with a fixed output
    shape contract (``width·height`` bytes per row).

    ``decode_fn(payload, width, height) -> bytes`` is the decoder seam
    (see ``_resolve_decoder``) — a real deployment injects a
    PIL/libvips-backed resampler; ``fake=True`` uses the deterministic
    byte-stream resample.  The batch shape, schema, and byte-bounding
    behavior are identical either way."""
    decoder = _resolve_decoder(decode_fn, fake, _fake_resize, "resize")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                decoder(payload, width, height)
                for payload in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "payload": out,
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def _fake_frames(
    payload: bytes, duration_ms: int, every_ms: int, frame_bytes: int
) -> list[bytes]:
    """Deterministic frame slices — one per ``every_ms`` of duration."""
    b = np.frombuffer(payload, dtype=np.uint8)
    n_frames = max(int(duration_ms) // every_ms, 1)
    out = []
    for k in range(n_frames):
        start = (k * len(b) // n_frames) if len(b) else 0
        out.append(b[start: start + frame_bytes].tobytes())
    return out


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, frame_bytes: int = 256,
    fake: bool = False, decode_fn=None,
) -> DataFrame:
    """Frame sampling plumbing (1 row in → ``duration/every_ms`` rows
    out): the UDTF-shaped fan-out a real ffmpeg keyframe sampler needs,
    with the same bounded-batch properties.

    ``decode_fn(payload, duration_ms, every_ms, frame_bytes) ->
    list[bytes]`` is the decoder seam (see ``_resolve_decoder``);
    ``fake=True`` slices the payload deterministically per frame
    index."""
    decoder = _resolve_decoder(decode_fn, fake, _fake_frames, "frame-sample")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                if dur is None or pd.isna(dur):
                    continue
                for k, fr in enumerate(
                    decoder(payload, int(dur), every_ms, frame_bytes)
                ):
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(k * every_ms)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "media_id": np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "ts_ms": np.asarray(tss, dtype=np.int32),
                    "frame": frames,
                }
            )

    return df.select("media_id", "duration_ms", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def media_embedding_neardup(
    df: DataFrame, dim: int = 8, k_cells: int = 4, threshold: float = 0.5,
    fake: bool = False,
) -> DataFrame:
    """Compose the multimodal decode with the embedding near-dup scale
    path: payload → feature vector (``decode_image_features``) → IVF cell
    assignment (first ``k_cells`` vectors as centroids) → within-cell
    cosine pairs ≥ threshold.  The same wiring a 100 TB image-dedup job
    uses (cell is the blocking/partition key; no all-pairs join)."""
    from tsforge_spark.operators.similarity import assign_cells, cosine

    # localCheckpoint (not persist): blocks are GC-cleaned, no cache;
    # not fault-tolerant (executor loss fails the query) — trade-off
    # documented in operators/dedup.lsh_candidate_pairs
    # leak across a long-lived session
    feats = decode_image_features(df, dim=dim, fake=fake).withColumn(
        "feature", F.col("feature").cast("array<double>")
    ).localCheckpoint(eager=True)
    cents = [
        (int(r["media_id"]), list(r["feature"]))
        for r in feats.orderBy("media_id").limit(k_cells).collect()
    ]
    assigned = assign_cells(feats, cents, "media_id", "feature").localCheckpoint(
        eager=True
    )
    a = assigned.select(
        F.col("media_id").alias("id_a"), F.col("feature").alias("va"),
        F.col("cell").alias("blk"),
    )
    b = assigned.select(
        F.col("media_id").alias("id_b"), F.col("feature").alias("vb"),
        F.col("cell").alias("blk"),
    )
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine")
    ).filter(F.col("cosine") >= threshold)
