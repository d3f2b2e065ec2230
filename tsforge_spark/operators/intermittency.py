"""Intermittency statistics + Syntetos-Boylan classification
(SURVEY.md §2.4).

Reference: ``src/tsforge/plots/charts/plot_intermittancy.py:110-155``
(per-series zero %, nonzero mean/std, CV², ADI) and ``:23-77``
(classification at CV²=0.49 / ADI=1.32); ADI = mean gap between nonzero
positions, ``eda/ts_features_extension.py:26-29``.

All conditional aggregations + one window pass for nonzero positions —
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CV2_THRESHOLD = 0.49
ADI_THRESHOLD = 1.32


def intermittency_stats(
    df: DataFrame, id_col: str, time_col: str, y_col: str
) -> DataFrame:
    y = F.col(y_col)
    nz = F.when(y != 0, y)
    # position index of each row per series; ADI = mean diff between
    # consecutive nonzero positions (ts_features_extension.py:26-29)
    w = Window.partitionBy(id_col).orderBy(time_col)
    pos = F.row_number().over(w)
    with_pos = df.withColumn("_pos", pos)
    nz_rows = with_pos.filter(y != 0)
    wnz = Window.partitionBy(id_col).orderBy("_pos")
    gaps = nz_rows.withColumn("_gap", F.col("_pos") - F.lag("_pos").over(wnz))
    adi = gaps.groupBy(id_col).agg(F.avg("_gap").alias("adi"))

    stats = df.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.sum(F.when(y == 0, 1).otherwise(0)) / F.count(F.lit(1)) * 100.0).alias(
            "pct_zero"
        ),
        F.avg(nz).alias("nonzero_mean"),
        F.stddev_samp(nz).alias("nonzero_std"),
    )
    out = stats.join(adi, id_col, "left")
    cv2 = (F.col("nonzero_std") / F.col("nonzero_mean")) ** 2
    out = out.withColumn("cv2", cv2)
    return out.withColumn(
        "sbc_class",
        F.when(
            (F.col("adi") < ADI_THRESHOLD) & (F.col("cv2") < CV2_THRESHOLD), "smooth"
        )
        .when(
            (F.col("adi") >= ADI_THRESHOLD) & (F.col("cv2") < CV2_THRESHOLD),
            "intermittent",
        )
        .when(
            (F.col("adi") < ADI_THRESHOLD) & (F.col("cv2") >= CV2_THRESHOLD), "erratic"
        )
        .otherwise("lumpy"),
    )
