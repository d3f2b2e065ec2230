"""Forecast metrics as algebraic aggregate expressions (SURVEY.md §2.8).

Reference: ``src/tsforge/evaluation/metrics.py:6-177`` —
mae, mse, rmse, mape (mask y≠0, ×100), smape (2·|Δ|/(|y|+|ŷ|+1e-12)·100),
wape, accuracy = 1−wape, bias, mpe, forecast_bias_ratio = Σŷ/Σy, mase
(naive-1 in-sample scale); interval metrics: coverage, width, Winkler,
CWC (Khosravi 2011).

Deliberate deviations from the reference (all scaling/guard choices, not
formula changes): wape / accuracy / coverage / smape are reported ×100
(percent) where the reference returns fractions, and the reference's
``+1e-12`` denominator guards on wape and forecast_bias_ratio are
dropped — an all-zero actuals group yields NULL (honest) instead of a
finite artifact.  smape keeps its 1e-12 guard (it bounds a per-row
ratio, not a group sum).

Each metric is a single algebraic ``agg`` expression, so any grouping
granularity (aggregate / by fold / by id / by fold+id — the Scoreboard of
``workflows/nixtla_demo.py:963-982``) is one ``groupBy().agg()`` pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _err(y: str, yhat: str) -> Column:
    return F.col(yhat) - F.col(y)


def metric_exprs(y: str = "y", yhat: str = "yhat") -> dict[str, Column]:
    e = _err(y, yhat)
    ae = F.abs(e)
    yv, fv = F.col(y), F.col(yhat)
    wape = F.sum(ae) / F.sum(F.abs(yv))
    return {
        "mae": F.avg(ae),
        "mse": F.avg(e * e),
        "rmse": F.sqrt(F.avg(e * e)),
        # mape masks y == 0 (metrics.py:42-49)
        "mape": F.avg(F.when(yv != 0, ae / F.abs(yv))) * 100.0,
        "smape": F.avg(2.0 * ae / (F.abs(yv) + F.abs(fv) + F.lit(1e-12))) * 100.0,
        "wape": wape * 100.0,
        "accuracy": (1.0 - wape) * 100.0,
        "bias": F.avg(e),
        "mpe": F.avg(F.when(yv != 0, e / yv)) * 100.0,
        "forecast_bias_ratio": F.sum(fv) / F.sum(yv),
        "n": F.count(F.lit(1)),
    }


def interval_exprs(
    y: str = "y", lo: str = "lo_80", hi: str = "hi_80", level: int = 80,
    eta: float = 50.0,
) -> dict[str, Column]:
    """Interval metrics (``metrics.py:141-177``): coverage, mean width,
    Winkler score with alpha = 1 - level/100, and CWC
    (Khosravi 2011, ``metrics.py:130-138``):
    ``(1 − mean_width) · exp(−eta · (coverage − (1 − alpha))²)`` with
    coverage as a fraction."""
    alpha = 1.0 - level / 100.0
    yv, lov, hiv = F.col(y), F.col(lo), F.col(hi)
    covered = (yv >= lov) & (yv <= hiv)
    width = hiv - lov
    winkler = (
        width
        + F.when(yv < lov, 2.0 / alpha * (lov - yv)).otherwise(0.0)
        + F.when(yv > hiv, 2.0 / alpha * (yv - hiv)).otherwise(0.0)
    )
    cov_frac = F.sum(covered.cast("long")) / F.count(F.lit(1))
    cov_err = cov_frac - F.lit(1.0 - alpha)
    cwc = (F.lit(1.0) - F.avg(width)) * F.exp(
        F.lit(-eta) * cov_err * cov_err
    )
    return {
        "coverage": F.avg(covered.cast("double")) * 100.0,
        "interval_width": F.avg(width),
        "winkler": F.avg(winkler),
        "cwc": cwc,
    }


def accuracy_table(
    preds: DataFrame,
    keys: list[str],
    metrics: list[str] | None = None,
    y: str = "y",
    yhat: str = "yhat",
) -> DataFrame:
    """One scoreboard granularity = one groupBy().agg() pass
    (``evaluation/accuracy_table.py:42-107``)."""
    exprs = metric_exprs(y, yhat)
    metrics = metrics or [m for m in exprs if m != "n"]
    aggs = [exprs[m].alias(m) for m in metrics] + [exprs["n"].alias("n")]
    return preds.groupBy(*keys).agg(*aggs)


def scoreboard(preds: DataFrame, metrics: list[str] | None = None) -> dict[str, DataFrame]:
    """The 4 granularities of ``nixtla_demo.py:963-982``."""
    base = ["workflow", "engine", "model"]
    return {
        "aggregate": accuracy_table(preds, base, metrics),
        "by_fold": accuracy_table(preds, base + ["cutoff"], metrics),
        "by_id": accuracy_table(preds, base + ["unique_id"], metrics),
        "by_fold_id": accuracy_table(preds, base + ["cutoff", "unique_id"], metrics),
    }


def mase_scale(train: DataFrame, id_col: str, time_col: str, y: str) -> DataFrame:
    """Per-series naive-1 in-sample MAE — the MASE denominator
    (``metrics.py:96-118``): mean |y_t − y_{t−1}| over the training span."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(time_col)
    d = F.abs(F.col(y) - F.lag(y).over(w))
    return (
        train.withColumn("_d", d)
        .groupBy(id_col)
        .agg(F.avg("_d").alias("mase_scale"))
    )
