"""Rolling-origin cross-validation folds + baselines + ensembles
(SURVEY.md §2.9, §3).

Reference: ``CVPlan`` cutoffs ``last_ds − step·(n−i)`` and per-cutoff
train ≤ cutoff / test (cutoff, cutoff+h] splits
(``src/tsforge/workflows/nixtla_demo.py:173-200, 601-639``); future frame
``workflows/baselines.py:3-9``; ensemble combine
``workflows/manager.py:577-614``.

Spark realization: cutoffs are computed on the driver (a handful of
scalars); each fold is a *filtered lazy plan* over the same scan, unioned
— Catalyst shares the scan and pushes the time predicates down; no data
is duplicated.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cv_cutoffs(
    df: DataFrame, ts_col: str, n_windows: int, step, as_of=None
) -> list:
    """Cutoffs at ``last − step·(n−i)`` (``nixtla_demo.py:196-200``)."""
    last = as_of or df.agg(F.max(ts_col)).collect()[0][0]
    if isinstance(step, (int, float)):
        step = dt.timedelta(days=step)
    return [last - step * (n_windows - i) for i in range(n_windows)]


def cv_folds(
    df: DataFrame,
    ts_col: str,
    cutoffs: list,
    horizon,
) -> DataFrame:
    """Union of test windows, tagged with their cutoff: rows with
    ``cutoff < ts <= cutoff + horizon`` (``nixtla_demo.py:614-615``)."""
    if isinstance(horizon, (int, float)):
        horizon = dt.timedelta(days=horizon)
    folds = []
    for co in cutoffs:
        fold = df.filter(
            (F.col(ts_col) > F.lit(co)) & (F.col(ts_col) <= F.lit(co + horizon))
        ).withColumn("cutoff", F.lit(co))
        folds.append(fold)
    out = folds[0]
    for f in folds[1:]:
        out = out.unionByName(f)
    return out


def train_split(df: DataFrame, ts_col: str, cutoff) -> DataFrame:
    return df.filter(F.col(ts_col) <= F.lit(cutoff))


def future_frame(
    df: DataFrame, id_col: str, ts_col: str, horizon: int, freq: str
) -> DataFrame:
    """Per-id future grid: (last_ts, last_ts + h·freq]
    (``baselines.py:3-9``) via sequence+explode."""
    interval = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}[freq]
    last = df.groupBy(id_col).agg(F.max(ts_col).alias("_last"))
    return last.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"sequence(_last + interval {interval},"
                f" _last + interval {interval} * {horizon},"
                f" interval {interval})"
            )
        ).alias(ts_col),
    )


def naive_last_window_mean(
    df: DataFrame, id_col: str, ts_col: str, y_col: str, window: int, horizon: int, freq: str
) -> DataFrame:
    """Mean of the last ``window`` observations broadcast over the
    horizon (``baselines.py:3-9``)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc(ts_col))
    recent = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= window)
        .groupBy(id_col)
        .agg(F.avg(y_col).alias("yhat"))
    )
    future = future_frame(df, id_col, ts_col, horizon, freq)
    return future.join(recent, id_col, "left")


def ensemble_combine(
    members: list[DataFrame],
    keys: list[str],
    yhat_col: str = "yhat",
    mode: str = "mean",
    weights: list[float] | None = None,
) -> DataFrame:
    """Align members on keys (inner multi-way join,
    ``manager.py:570-571``) then combine row-wise
    (``manager.py:577-614``): mean / median / weighted."""
    aliased = [
        m.select(*keys, F.col(yhat_col).alias(f"_m{i}")) for i, m in enumerate(members)
    ]
    joined = aliased[0]
    for m in aliased[1:]:
        joined = joined.join(m, keys, "inner")
    cols = [F.col(f"_m{i}") for i in range(len(members))]
    arr = F.array(*cols)
    if mode == "mean":
        combined = F.aggregate(
            arr, F.lit(0.0), lambda acc, x: acc + x
        ) / F.lit(float(len(members)))
    elif mode == "median":
        mid = len(members) // 2
        sorted_arr = F.array_sort(arr)
        if len(members) % 2 == 1:
            combined = F.element_at(sorted_arr, mid + 1)
        else:
            combined = (
                F.element_at(sorted_arr, mid) + F.element_at(sorted_arr, mid + 1)
            ) / 2.0
    elif mode == "weighted":
        assert weights and len(weights) == len(members)
        total = sum(weights)
        combined = sum(
            (c * (wt / total) for c, wt in zip(cols, weights)), F.lit(0.0)
        )
    else:
        raise ValueError(f"unknown mode: {mode}")
    return joined.withColumn(yhat_col, combined).drop(
        *[f"_m{i}" for i in range(len(members))]
    )
