"""Calendar / time features (SURVEY.md §2.8).

Reference: ``src/tsforge/feature_engineering/time_features.py:26-50`` —
calendar extraction, boundary flags, numeric time index, cyclical sin/cos
encodings.  All pure column expressions.

Cross-engine note: Spark ``dayofweek`` is 1=Sunday; the reference uses
pandas ``dt.dayofweek`` (0=Monday).  We emit the pandas convention
(``dow``: 0=Mon..6=Sun) so features match the reference bit-for-bit, and
ISO week via ``weekofyear``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pandas_dow(ts: Column) -> Column:
    """0=Monday .. 6=Sunday (pandas dt.dayofweek convention)."""
    return (F.dayofweek(ts) + 5) % 7


def add_time_features(df: DataFrame, ts_col: str, prefix: str = "") -> DataFrame:
    """The full battery of ``time_features.py:26-50``."""
    ts = F.col(ts_col)
    p = prefix
    dow = pandas_dow(ts)
    month = F.month(ts)
    out = (
        df.withColumn(f"{p}year", F.year(ts))
        .withColumn(f"{p}quarter", F.quarter(ts))
        .withColumn(f"{p}month", month)
        .withColumn(f"{p}week", F.weekofyear(ts))
        .withColumn(f"{p}day", F.dayofmonth(ts))
        .withColumn(f"{p}dayofweek", dow)
        .withColumn(f"{p}dayofyear", F.dayofyear(ts))
        .withColumn(f"{p}is_weekend", dow.isin(5, 6).cast("int"))
        .withColumn(
            f"{p}is_month_start", (F.dayofmonth(ts) == 1).cast("int")
        )
        .withColumn(
            f"{p}is_month_end", (F.col(ts_col).cast("date") == F.last_day(ts)).cast("int")
        )
        .withColumn(
            f"{p}is_quarter_start",
            ((F.dayofmonth(ts) == 1) & (month.isin(1, 4, 7, 10))).cast("int"),
        )
        .withColumn(
            f"{p}is_quarter_end",
            (
                (F.col(ts_col).cast("date") == F.last_day(ts))
                & month.isin(3, 6, 9, 12)
            ).cast("int"),
        )
        .withColumn(
            f"{p}is_year_start",
            ((F.dayofmonth(ts) == 1) & (month == 1)).cast("int"),
        )
        .withColumn(
            f"{p}is_year_end",
            ((F.dayofmonth(ts) == 31) & (month == 12)).cast("int"),
        )
    )
    return out


def add_cyclical(df: DataFrame, ts_col: str, prefix: str = "") -> DataFrame:
    """sin/cos encodings of day-of-week (/7) and month (/12)
    (``time_features.py:47-50``)."""
    ts = F.col(ts_col)
    two_pi = 2 * math.pi
    dow = pandas_dow(ts)
    return (
        df.withColumn(f"{prefix}dow_sin", F.sin(dow * two_pi / 7))
        .withColumn(f"{prefix}dow_cos", F.cos(dow * two_pi / 7))
        .withColumn(f"{prefix}month_sin", F.sin(F.month(ts) * two_pi / 12))
        .withColumn(f"{prefix}month_cos", F.cos(F.month(ts) * two_pi / 12))
    )


def add_time_index(df: DataFrame, ts_col: str, id_col: str, name: str = "time_idx") -> DataFrame:
    """Days since per-series min (``time_features.py:44``)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col)
    return df.withColumn(
        name, F.datediff(F.col(ts_col), F.min(ts_col).over(w))
    )
