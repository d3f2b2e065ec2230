"""Canonical schemas (SURVEY.md §1.3).

The reference discovers columns dynamically at runtime
(``src/tsforge/feature_engineering/encode_features.py:48-50``); our engine
declares fixed StructTypes so Catalyst can prune/push down and so parquet
footers carry exact types.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary engine input — BASELINE.json input_hint.
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# One tier cell: partial aggregates so coarser tiers fold exactly
# (mean = sum/count — SURVEY.md §4.2.4).  `bucket` is the tumbling-window
# start truncated to the tier resolution.
TIER_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("bucket", T.TimestampType(), False),
        T.StructField("turns", T.LongType(), False),
        T.StructField("tool_calls", T.LongType(), False),
        T.StructField("user_turns", T.LongType(), False),
        T.StructField("assistant_turns", T.LongType(), False),
        T.StructField("text_chars", T.LongType(), False),
        T.StructField("chars_min", T.LongType(), True),
        T.StructField("chars_max", T.LongType(), True),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)

# Gorilla blob table: one row per (conv_id, segment-window, measure)
# chunk — canonical definition lives in codec/blobs.py (re-exported here).
from tsforge_spark.codec.blobs import BLOB_SCHEMA  # noqa: E402,F401

# Lineage record — modeled on the reference lineage dicts
# (``src/tsforge/workflows/lineage.py:27-74``) but per-partition and
# appendable (SURVEY.md §2.1 sink row).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("snapshot_id", T.LongType(), True),
        T.StructField("bucket_id", T.IntegerType(), True),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("byte_count", T.LongType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)

# Standardized prediction frame — the reference result-table contract
# (``src/tsforge/workflows/manager.py:111-180``).
PRED_SCHEMA = T.StructType(
    [
        T.StructField("unique_id", T.StringType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("cutoff", T.TimestampType(), True),
        T.StructField("y", T.DoubleType(), True),
        T.StructField("yhat", T.DoubleType(), True),
        T.StructField("lo_80", T.DoubleType(), True),
        T.StructField("hi_80", T.DoubleType(), True),
        T.StructField("workflow", T.StringType(), True),
        T.StructField("engine", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
    ]
)

TIER_FREQS = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_ORDER = ["1m", "1h", "1d"]
