"""Hierarchical per-level feature battery, CSV source round-trip, and
the model-name filter — the last 'partial' rows of SURVEY §2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsforge_spark.operators.sessions import hierarchical_ts_features, ts_features


def _event_panel(n_users=6, n_hours=24 * 14, seed=4) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for u in range(n_users):
        rows.append(
            pd.DataFrame(
                {
                    "user_id": u,
                    "cohort": u % 2,
                    "ts": t0 + pd.to_timedelta(np.arange(n_hours), "h"),
                    "v": rng.integers(0, 100, n_hours).astype(np.int64),
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def test_hierarchical_ts_features_levels(spark):
    pdf = _event_panel()
    df = spark.createDataFrame(pdf)
    out = hierarchical_ts_features(
        df, ["cohort", "user_id"], "ts", "v", bucket="1h", freq=24
    ).toPandas()
    # one row per level value, tagged with its level
    by_level = out.groupby("level")["hier_id"].nunique()
    assert by_level["cohort"] == 2
    assert by_level["user_id"] == 6
    # a level's features equal running the battery on that level's series
    coh = (
        pdf.assign(bucket=pdf["ts"].dt.floor("h"))
        .groupby(["cohort", "bucket"], as_index=False)["v"]
        .sum()
    )
    coh["cohort"] = coh["cohort"].astype(str)
    direct = (
        ts_features(
            spark.createDataFrame(coh), "cohort", "bucket", "v", freq=24
        )
        .toPandas()
        .set_index("series_id")
        .sort_index()
    )
    got = (
        out[out["level"] == "cohort"]
        .set_index("hier_id")
        .sort_index()[direct.columns]
    )
    pd.testing.assert_frame_equal(
        got, direct, check_names=False, rtol=1e-12
    )


def test_csv_source_roundtrip(spark, tmp_path):
    """CSV source (SURVEY §2.1): write events as CSV with header, read
    back with an explicit schema, and check a rollup matches the
    DataFrame-native path exactly."""
    pdf = _event_panel(n_users=3, n_hours=100)
    df = spark.createDataFrame(pdf)
    csv_dir = str(tmp_path / "events_csv")
    df.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")).write.option(
        "header", True
    ).mode("overwrite").csv(csv_dir)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("cohort", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
    back = spark.read.option("header", True).schema(schema).csv(csv_dir)

    def roll(d):
        return (
            d.groupBy("user_id", F.date_trunc("hour", "ts").alias("b"))
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .toPandas()
            .sort_values(["user_id", "b"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(roll(back), roll(df))


def test_model_name_filter(spark, preds_pdf):
    """Model-name predicate on the standardized preds frame
    (SURVEY §2.2; reference filters scoreboards by model)."""
    preds = spark.createDataFrame(preds_pdf)
    only = preds.filter(F.col("model") == "naive")
    got = {r["model"] for r in only.select("model").distinct().collect()}
    assert got == {"naive"}
    want = int((preds_pdf["model"] == "naive").sum())
    assert only.count() == want
