"""Structured Streaming variant of the tier rollup (SURVEY §2.10).

The reference has no streaming at all; the engine's batch rollup
(``operators/rollup.py``) is expressed so the same aggregation works under
``readStream``: tumbling ``F.window`` + watermark for late turns, partial
aggregates identical to the batch tier schema.  The batch path stays the
north-rule primary (snapshot-incremental continuous aggregates); this
module exists so a Kafka/file-stream deployment reuses the engine
semantics unchanged.

Late data: ``withWatermark(ts, delay)`` bounds state; turns later than
the watermark fall back to the batch re-fold path (snapshot reprocessing,
plans/pipeline.py) — the standard lambda-ish split, documented here
explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsforge_spark.schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over a transcript snapshot directory (stands in
    for Kafka in the sandbox; schema is the canonical transcript table)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_tier(
    stream: DataFrame, tier: str = "1m", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling rollup with the batch tier's partial-agg
    schema (fold-compatible with operators/rollup.fold_tier)."""
    dur = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}[tier]
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.window("ts", dur).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.count("tool").alias("tool_calls"),
            F.count(F.when(F.col("role") == "user", 1)).alias("user_turns"),
            F.count(F.when(F.col("role") == "assistant", 1)).alias("assistant_turns"),
            F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("text_chars"),
            F.min(F.length("text")).alias("chars_min"),
            F.max(F.length("text")).alias("chars_max"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(F.col("conv_id"), F.col("w.start").alias("bucket"), "turns",
                "tool_calls", "user_turns", "assistant_turns", "text_chars",
                "chars_min", "chars_max", "first_ts", "last_ts")
    )


def stream_dedup_turns(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exactly-once turn dedup:
    ``dropDuplicatesWithinWatermark`` on the ``(conv_id, turn_idx)``
    input-contract key — the streaming twin of the batch ingest's dedup
    (plans/pipeline._prepare).  State is bounded by the watermark: a
    duplicate arriving later than the delay is the batch re-fold path's
    problem, exactly like late turns in ``streaming_tier``."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def run_stream_to_parquet(
    spark, in_path: str, out_path: str, checkpoint: str,
    tier: str = "1m", watermark: str = "10 minutes",
):
    """Start the streaming tier job (append mode, parquet sink); returns
    the StreamingQuery.  Caller awaits/stops it."""
    tiered = streaming_tier(read_transcript_stream(spark, in_path), tier, watermark)
    return (
        tiered.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
