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

from tsforge_spark.codec.gorilla import decode_series, encode_series

SEGMENT_TRUNC = {"1m": "day", "1h": "month", "1d": "month"}

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


def encode_tier_blobs(
    tier_df: DataFrame, tier: str, measures: tuple[str, ...] = ("turns", "tool_calls")
) -> DataFrame:
    """Encode tier cells into per-(conv, segment, measure) blobs."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket", kind="mergesort")
        ts = pdf["bucket"].to_numpy("datetime64[us]").astype(np.int64)
        n = len(pdf)
        rows = []
        for m in measures:
            vals = pdf[m].to_numpy(dtype=np.float64)
            blob = encode_series(ts, vals)
            rows.append(
                (
                    pdf["conv_id"].iat[0],
                    pdf["segment"].iat[0],
                    tier,
                    m,
                    n,
                    n * 16,
                    len(blob),
                    blob,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id", "segment", "tier", "measure",
                "n_points", "raw_bytes", "blob_bytes", "blob",
            ],
        )

    with_seg = tier_df.withColumn(
        "segment", F.date_trunc(SEGMENT_TRUNC[tier], F.col("bucket"))
    )
    return with_seg.groupBy("conv_id", "segment").applyInPandas(
        encode, schema=BLOB_SCHEMA
    )


def decode_blobs(blob_df: DataFrame) -> DataFrame:
    """Blob table → long decoded series (for verification / serving)."""

    def decode(iterator):
        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                # driver-side loop over *blobs* (one per group-chunk), not
                # rows of data — each decode_series call is vectorized.
                ts, vals = decode_series(bytes(r.blob))
                out.append(
                    pd.DataFrame(
                        {
                            "conv_id": r.conv_id,
                            "measure": r.measure,
                            "bucket": ts.astype("datetime64[us]"),
                            "value": vals,
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return blob_df.mapInPandas(decode, schema=DECODED_SCHEMA)
