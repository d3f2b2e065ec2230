"""Metric identities — replicates the reference's own test strategy
(``tests/test_metrics.py:1-71``: closed-form toy assertions, the
accuracy == 100 − wape identity, bias properties) plus the scoreboard
granularities on the preds fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tsforge_spark.functions.metrics import (
    accuracy_table,
    interval_exprs,
    mase_scale,
    metric_exprs,
    scoreboard,
)


def _toy(spark):
    pdf = pd.DataFrame(
        {
            "unique_id": ["a"] * 4,
            "y": [100.0, 200.0, 300.0, 400.0],
            "yhat": [110.0, 190.0, 310.0, 390.0],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_closed_form_values(spark):
    df, pdf = _toy(spark)
    m = df.groupBy().agg(
        *[e.alias(k) for k, e in metric_exprs().items()]
    ).collect()[0]
    err = pdf["yhat"] - pdf["y"]
    assert abs(m["mae"] - err.abs().mean()) < 1e-12
    assert abs(m["mse"] - (err**2).mean()) < 1e-12
    assert abs(m["rmse"] - np.sqrt((err**2).mean())) < 1e-12
    wape = err.abs().sum() / pdf["y"].abs().sum() * 100
    assert abs(m["wape"] - wape) < 1e-12
    # reference identity: accuracy == 100 − wape (tests/test_metrics.py:35-39)
    assert abs(m["accuracy"] - (100 - wape)) < 1e-9
    assert abs(m["bias"] - err.mean()) < 1e-12
    assert abs(m["forecast_bias_ratio"] - pdf["yhat"].sum() / pdf["y"].sum()) < 1e-12
    mape = (err.abs() / pdf["y"].abs()).mean() * 100
    assert abs(m["mape"] - mape) < 1e-12


def test_mape_masks_zero_truth(spark):
    pdf = pd.DataFrame({"y": [0.0, 100.0], "yhat": [5.0, 110.0]})
    m = (
        spark.createDataFrame(pdf)
        .groupBy()
        .agg(metric_exprs()["mape"].alias("mape"))
        .collect()[0]
    )
    assert abs(m["mape"] - 10.0) < 1e-12  # only the y=100 row counts


def test_smape_epsilon_guard(spark):
    pdf = pd.DataFrame({"y": [0.0], "yhat": [0.0]})
    m = (
        spark.createDataFrame(pdf)
        .groupBy()
        .agg(metric_exprs()["smape"].alias("smape"))
        .collect()[0]
    )
    assert m["smape"] == 0.0  # 0/ (0+0+1e-12) → 0, no NaN


def test_interval_metrics(spark):
    pdf = pd.DataFrame(
        {"y": [10.0, 20.0, 30.0], "lo_80": [8.0, 22.0, 25.0], "hi_80": [12.0, 28.0, 28.0]}
    )
    m = (
        spark.createDataFrame(pdf)
        .groupBy()
        .agg(*[e.alias(k) for k, e in interval_exprs().items()])
        .collect()[0]
    )
    assert abs(m["coverage"] - 100 / 3) < 1e-9  # only first row covered
    assert abs(m["interval_width"] - np.mean([4, 6, 3])) < 1e-12
    # winkler: width + 2/alpha * violation
    alpha = 0.2
    w = np.mean([4, 6 + 2 / alpha * 2, 3 + 2 / alpha * 2])
    assert abs(m["winkler"] - w) < 1e-9


def test_scoreboard_granularities(spark, preds, preds_pdf):
    boards = scoreboard(preds)
    agg = boards["aggregate"].toPandas()
    assert set(agg.columns) >= {"workflow", "engine", "model", "mae", "rmse", "n"}
    assert agg["n"].sum() == len(preds_pdf)
    by_fold = boards["by_fold"].toPandas()
    assert by_fold["n"].sum() == len(preds_pdf)
    # pandas oracle for one cell
    cell = preds_pdf[(preds_pdf.workflow == "wf_a") & (preds_pdf.model == "naive")]
    want_mae = (cell["yhat"] - cell["y"]).abs().mean()
    got_mae = agg[(agg.workflow == "wf_a") & (agg.model == "naive")]["mae"].iloc[0]
    assert abs(got_mae - want_mae) < 1e-9


def test_accuracy_table_by_id(spark, preds, preds_pdf):
    t = accuracy_table(preds, ["unique_id"], ["mae", "wape"]).toPandas()
    assert len(t) == preds_pdf["unique_id"].nunique()


def test_mase_scale(spark, panel, panel_pdf):
    s = mase_scale(panel, "unique_id", "ds", "y").toPandas()
    one = panel_pdf[panel_pdf.unique_id == "series_000"].sort_values("ds")["y"]
    want = one.diff().abs().mean()
    got = s[s.unique_id == "series_000"]["mase_scale"].iloc[0]
    assert abs(got - want) < 1e-9
