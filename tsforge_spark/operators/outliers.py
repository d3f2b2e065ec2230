"""Outlier flagging and correction (SURVEY.md §2.4).

Reference: global z-score / IQR flag+cap
(``src/tsforge/preprocessing/outliers.py:33-53``); per-series
zscore/iqr/sigma flags with correct ∈ {interpolate, mean, median,
winsorize} (``src/tsforge/workflows/nixtla_demo.py:382-504``).

Per-series stats are window aggregates (one shuffle on id); correction is
column expressions, except linear interpolation of flagged points which
reuses the gap-fill kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def flag_outliers(
    df: DataFrame,
    y_col: str,
    id_col: str | None = None,
    method: str = "zscore",
    threshold: float = 3.0,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Flag = 1 where the point is an outlier by ``method`` ∈
    {zscore, iqr}; per-series when ``id_col`` given, else global."""
    w = Window.partitionBy(id_col) if id_col else Window.partitionBy()
    y = F.col(y_col)
    if method == "zscore":
        mu = F.avg(y).over(w)
        sd = F.stddev_samp(y).over(w)
        flag = (F.abs((y - mu) / sd) > threshold) & sd.isNotNull() & (sd != 0)
    elif method == "iqr":
        q1 = F.expr(f"percentile({y_col}, 0.25)").over(w)
        q3 = F.expr(f"percentile({y_col}, 0.75)").over(w)
        iqr = q3 - q1
        flag = (y < q1 - threshold * iqr) | (y > q3 + threshold * iqr)
    else:
        raise ValueError(f"unknown method: {method}")
    return df.withColumn(flag_col, F.coalesce(flag.cast("int"), F.lit(0)))


def flag_outliers_deseasonalized(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    cents_col: str,
    method: str = "zscore",
    threshold: float = 3.0,
    period: int = 24,
) -> DataFrame:
    """Outlier flags on the DESEASONALIZED series — the reference's
    ``_detect_outliers_df(deseasonalize=True)`` composition
    (``nixtla_demo.py:434-459``): subtract the seasonal component for
    series that pass the guards (length/ADI/CV), then flag on the
    residual-ish series; gated-out series flag on the raw values.  A
    seasonal spike that hides inside the raw variance becomes visible
    once the cycle is removed.  Returns the guard columns + flags."""
    from tsforge_spark.operators.decompose import deseasonalize_guard

    d = deseasonalize_guard(df, id_col, ts_col, cents_col, period)
    return flag_outliers(
        d, "deseasonalized", id_col, method, threshold
    )


def correct_outliers(
    df: DataFrame,
    y_col: str,
    id_col: str | None = None,
    method: str = "zscore",
    threshold: float = 3.0,
    correct: str = "winsorize",
    time_col: str | None = None,
) -> DataFrame:
    """Replace flagged points: winsorize (clip at the bound), mean,
    median, or interpolate from neighbors (``nixtla_demo.py:465-504``)."""
    flagged = flag_outliers(df, y_col, id_col, method, threshold, "_flag")
    w = Window.partitionBy(id_col) if id_col else Window.partitionBy()
    y = F.col(y_col)
    if correct == "winsorize":
        if method == "iqr":
            q1 = F.expr(f"percentile({y_col}, 0.25)").over(w)
            q3 = F.expr(f"percentile({y_col}, 0.75)").over(w)
            lo, hi = q1 - threshold * (q3 - q1), q3 + threshold * (q3 - q1)
        else:
            mu, sd = F.avg(y).over(w), F.stddev_samp(y).over(w)
            lo, hi = mu - threshold * sd, mu + threshold * sd
        fixed = F.least(F.greatest(y, lo), hi)
    elif correct == "mean":
        fixed = F.avg(F.when(F.col("_flag") == 0, y)).over(w)
    elif correct == "median":
        fixed = F.expr(
            f"percentile(case when _flag = 0 then {y_col} end, 0.5)"
        ).over(w)
    elif correct == "interpolate":
        if not (id_col and time_col):
            raise ValueError("interpolate needs id_col and time_col")
        from tsforge_spark.operators.gapfill import _interp_exprs

        nulled = flagged.withColumn(
            y_col, F.when(F.col("_flag") == 0, y)
        )
        return _interp_exprs(nulled, y_col, id_col, time_col, "clamp").drop("_flag")
    else:
        raise ValueError(f"unknown correct: {correct}")
    return flagged.withColumn(
        y_col, F.when(F.col("_flag") == 1, fixed).otherwise(y)
    ).drop("_flag")
