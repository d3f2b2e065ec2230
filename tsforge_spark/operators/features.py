"""Per-series ordered-window features (SURVEY.md §2.5).

Reference: ``src/tsforge/feature_engineering/rolling_features.py`` —
``add_rolling`` (:77-112, min_periods=1), ``add_expanding`` (:165-198),
``add_differences`` (:248-264); exog lags ``workflows/nixtla_demo.py:281-289``.

All are built-in window expressions over ``Window.partitionBy(id).orderBy
(ts, *tiebreak)`` — JVM-side, whole-stage-codegen, one shuffle on the id
shared by every feature column.  A deterministic tiebreak column is
required for reproducibility when timestamps tie (the engine convention is
``turn_idx`` / ``event_id``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ROLL_FNS = {
    "mean": F.avg,
    "std": F.stddev_samp,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "median": lambda c: F.expr(f"percentile({c}, 0.5)"),
}


def _w(id_col: str, order_cols: list[str]):
    return Window.partitionBy(id_col).orderBy(*order_cols)


def add_rolling(
    df: DataFrame,
    value_col: str,
    windows: list[int],
    fns: list[str],
    id_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Rolling aggregates with ``min_periods=1`` semantics (the frame
    simply contains fewer rows near the series head —
    ``rolling_features.py:98``): ``{col}_roll{fn}_{w}`` columns."""
    out = df
    for w in windows:
        frame = _w(id_col, order_cols).rowsBetween(-(w - 1), 0)
        for fn in fns:
            out = out.withColumn(
                f"{value_col}_roll{fn}_{w}", _ROLL_FNS[fn](value_col).over(frame)
            )
    return out


def add_expanding(
    df: DataFrame,
    value_col: str,
    fns: list[str],
    id_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Expanding aggregates (``rolling_features.py:165-198``):
    ``{col}_expand{fn}`` columns."""
    frame = _w(id_col, order_cols).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for fn in fns:
        out = out.withColumn(f"{value_col}_expand{fn}", _ROLL_FNS[fn](value_col).over(frame))
    return out


def add_differences(
    df: DataFrame,
    value_col: str,
    lags: list[int],
    id_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Lag-k differences ``y - lag(y, k)`` (``rolling_features.py:248-264``):
    ``{col}_diff_{k}`` columns."""
    w = _w(id_col, order_cols)
    out = df
    for k in lags:
        out = out.withColumn(
            f"{value_col}_diff_{k}", F.col(value_col) - F.lag(value_col, k).over(w)
        )
    return out


def add_lags(
    df: DataFrame,
    cols: list[str],
    lags: list[int],
    id_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Exogenous lags (``nixtla_demo.py:281-289``): ``{col}_lag{k}``."""
    w = _w(id_col, order_cols)
    out = df
    for c in cols:
        for k in lags:
            out = out.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
    return out


def smooth(
    df: DataFrame, value_col: str, window: int, id_col: str, order_cols: list[str]
) -> DataFrame:
    """Centered-ish trailing rolling-mean smoothing
    (``plots/core/preprocess.py:8-22`` uses trailing window, min_periods=1)."""
    frame = _w(id_col, order_cols).rowsBetween(-(window - 1), 0)
    return df.withColumn(value_col, F.avg(value_col).over(frame))


def ts_delta(df: DataFrame, ts_col: str, id_col: str, order_cols: list[str]) -> Column:
    """Per-series timestamp delta in seconds (``eda/diagnostics.py:182``)."""
    w = _w(id_col, order_cols)
    return (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    ) / 1e6


def top_n_per_group(
    df: DataFrame, id_col: str, order_by: list[Column], n: int
) -> DataFrame:
    """Ranking/top-k per group (``nixtla_demo.py:1062-1071``)."""
    w = Window.partitionBy(id_col).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
