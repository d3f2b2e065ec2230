"""Tier table ⇄ Gorilla blob table, via ``applyInPandas``.

One blob per ``(conv_id, segment, measure)`` where ``segment`` truncates
the bucket to a chunk window (day for the 1m tier, month for 1h/1d).
Segment chunking is also the skew control for the grouped kernel
(SURVEY.md §7.4.4): a group can never exceed the segment's bucket count
(1440 points for 1m/day), so one hot conversation can't create a straggler
``applyInPandas`` task no matter how many turns it has.

The kernels are whole-group numpy (codec/gorilla.py) on Arrow batches —
no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsforge_spark.codec.gorilla import encode_blobs_batch, assemble_blob, decode_blobs_many, decode_series, encode_timestamps

SEGMENT_TRUNC = {"1m": "day", "1h": "month", "1d": "month"}

# decode-kernel sub-batch cap (bytes of blob payload per
# decode_blobs_many call) — see decode_blobs.  Env-tunable so tests can
# force the split path.  Read at decode() CALL time, not import time:
# a module-level binding would freeze the value for driver-local
# execution while fresh executor workers still re-read it —
# asymmetric behavior for the advertised test hook.
import os as _os


def _decode_chunk_bytes() -> int:
    return int(_os.environ.get("TSF_DECODE_CHUNK_BYTES", str(64 << 20)))

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("segment", T.TimestampType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("measure", T.StringType(), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("blob_bytes", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("measure", T.StringType(), False),
        T.StructField("bucket", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def _default_n_buckets(parallelism: int, cells_hint: int | None) -> int:
    """Encode-bucket count: ~4 waves of groups per core (packs
    Pareto-skewed group sizes without per-group overhead dominating),
    AND — when the caller can bound the cell count cheaply — at most
    ~2M cells per group.  A bucket's group loads WHOLE into one pandas
    frame, and cells/bucket grows with data at fixed parallelism, so
    without the cap a full-history rebuild at 100× data OOMs the
    executors instead of just adding waves.  The pipeline passes its
    footer-derived turn count (tier cells ≤ turns) on first runs."""
    n = max(parallelism * 4, 16)
    if cells_hint is not None:
        n = max(n, int(cells_hint) // 2_000_000)
    return n


def encode_tier_blobs(
    tier_df: DataFrame,
    tier: str,
    measures: tuple[str, ...] = ("turns", "tool_calls"),
    n_buckets: int | None = None,
    cells_hint: int | None = None,
) -> DataFrame:
    """Encode tier cells into per-(conv, segment, measure) blobs.

    Packed kernel: grouping by (conv, segment) directly would create one
    Arrow batch per blob — millions of tiny groups whose per-group
    overhead dwarfs the encode.  Instead we group by a hash bucket
    (~``n_buckets`` large groups), sort inside the kernel, and split on
    (conv, segment) boundaries with numpy — the inner loop runs once per
    *blob*, never per row, and each encode_series call is vectorized.
    Bucketing also bounds task skew: a hot conversation's segments spread
    across its bucket's single sort, not a straggler group.
    """

    if n_buckets is None:
        sc = tier_df.sparkSession.sparkContext
        n_buckets = _default_n_buckets(sc.defaultParallelism, cells_hint)

    cols = [
        "conv_id", "segment", "tier", "measure",
        "n_points", "raw_bytes", "blob_bytes", "blob",
    ]

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values(["conv_id", "segment", "bucket"], kind="mergesort")
        ts_all = pdf["bucket"].to_numpy("datetime64[us]").astype(np.int64)
        seg_all = pdf["segment"].to_numpy("datetime64[us]").astype(np.int64)
        conv_all = pdf["conv_id"].to_numpy()
        # boundary detection: new blob where conv or segment changes
        change = np.empty(len(pdf), dtype=bool)
        change[0] = True
        change[1:] = (conv_all[1:] != conv_all[:-1]) | (seg_all[1:] != seg_all[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(pdf))
        vals_by_m = {m: pdf[m].to_numpy(dtype=np.float64) for m in measures}
        # ONE vectorized pass encodes every chunk in the batch (timestamp
        # streams shared across measures); per-blob work is just a header
        # pack + slices — tier cells at coarse grains average a handful of
        # points per segment, so per-chunk numpy calls would dominate
        blob_lists = encode_blobs_batch(ts_all, starts, ends, vals_by_m)
        n_pts = (ends - starts).astype(np.int64)
        conv_b = conv_all[starts]
        seg_b = pdf["segment"].iloc[starts].to_numpy()
        rows = []
        for j in range(len(starts)):
            n = int(n_pts[j])
            for m in measures:
                blob = blob_lists[m][j]
                rows.append(
                    (conv_b[j], seg_b[j], tier, m, n, n * 16, len(blob), blob)
                )
        return pd.DataFrame(rows, columns=cols)

    with_seg = tier_df.select(
        "conv_id",
        "bucket",
        *measures,
        F.date_trunc(SEGMENT_TRUNC[tier], F.col("bucket")).alias("segment"),
        F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
        .cast("int")
        .alias("_enc_bucket"),
    )  # narrow projection: only these columns cross the Arrow boundary
    return with_seg.groupBy("_enc_bucket").applyInPandas(
        encode, schema=BLOB_SCHEMA
    )


def read_series(
    spark,
    blobs_path: str,
    tier: str,
    t0,
    t1,
    conv_ids: list[str] | None = None,
    measures: tuple[str, ...] | None = None,
) -> DataFrame:
    """Serving read path over the blob store: fetch decoded series for a
    time range (and optionally a conversation set) touching only the
    relevant partitions.

    Pruning order, mirroring the store layout
    ``blobs/tier_part=<t>/seg_day=<d>/``:
    1. ``tier_part`` + ``seg_day`` partition filters (directory-level —
       a day query on the 1m tier reads one directory);
    2. blob-row filters on ``conv_id`` / ``measure`` / ``segment``
       (parquet row-group stats prune before payload bytes are read);
    3. decode only the surviving blobs, then the exact ``bucket`` range
       filter on the decoded points (a blob spans a whole segment, so
       edge segments decode fully — bounded by one segment per side).
    """
    import datetime as _dt

    t0 = pd.Timestamp(t0).to_pydatetime()
    t1 = pd.Timestamp(t1).to_pydatetime()
    unit = SEGMENT_TRUNC[tier]

    def trunc(d: _dt.datetime) -> _dt.date:
        return d.date().replace(day=1) if unit == "month" else d.date()

    df = spark.read.parquet(blobs_path).filter(
        (F.col("tier_part") == tier)
        & (F.col("seg_day") >= trunc(t0))
        & (F.col("seg_day") <= trunc(t1))
    )
    if conv_ids is not None:
        df = df.filter(F.col("conv_id").isin(list(conv_ids)))
    if measures is not None:
        df = df.filter(F.col("measure").isin(list(measures)))
    decoded = decode_blobs(df)
    return decoded.filter(
        (F.col("bucket") >= F.lit(t0)) & (F.col("bucket") <= F.lit(t1))
    )


def _split_by_bytes(pdf: pd.DataFrame, cap: int):
    """Yield consecutive row slices of ``pdf`` whose cumulative blob
    bytes stay ≈ ``cap`` each (always ≥1 row per slice; one slice when
    the whole frame fits)."""
    sizes = pdf["blob"].map(len).to_numpy(dtype=np.int64)
    total = int(sizes.sum())
    if total <= cap:
        yield pdf
        return
    cuts = np.searchsorted(
        np.cumsum(sizes), np.arange(cap, total, cap)
    )
    prev = 0
    for c in list(cuts) + [len(pdf)]:
        c = min(max(int(c), prev + 1), len(pdf))
        if prev < len(pdf):
            yield pdf.iloc[prev:c]
        prev = c


def decode_blobs(blob_df: DataFrame) -> DataFrame:
    """Blob table → long decoded series (for verification / serving)."""

    def decode(iterator):
        # Bound peak kernel memory per sub-batch: the vectorized decoder
        # concatenates every blob in its input into one buffer, so a
        # 64k-row Arrow batch of DENSE blobs (1m day segments, ~10KB
        # each) would join ~700MB before decoding.  Split on cumulative
        # blob bytes; coarse-tier batches (~20B/blob) pass through as
        # one chunk.
        cap = _decode_chunk_bytes()
        for full in iterator:
            if len(full) == 0:
                continue
            yield from (
                _decode_one(pdf)
                for pdf in _split_by_bytes(full, cap)
            )

    def _decode_one(pdf: pd.DataFrame) -> pd.DataFrame:
        # Whole-chunk vectorized decode (codec/gorilla.py
        # decode_blobs_many): headers parse as one structured-dtype
        # view, chains resolve as segmented scans — no per-blob Python.
        # A per-blob decode_series loop here paid ~6µs fixed cost per
        # blob, which at ~1 point/blob on the 1h/1d stores capped
        # serving at 168k points/s.
        ts, vals, lens = decode_blobs_many(list(pdf["blob"]))
        # id columns go out dictionary-encoded: repeating int32 codes +
        # one small category table beats materializing sum(n)
        # Python-string refs and re-encoding them to Arrow (the string
        # repeat was ~half the task-side cost at ~1 point/blob; Arrow
        # passes the dictionary through and Spark reads it as a plain
        # string column)
        return pd.DataFrame(
            {
                "conv_id": pd.Categorical(pdf["conv_id"]).repeat(lens),
                "measure": pd.Categorical(pdf["measure"]).repeat(lens),
                "bucket": ts.astype("datetime64[us]"),
                "value": vals,
            }
        )

    return blob_df.mapInPandas(decode, schema=DECODED_SCHEMA)
