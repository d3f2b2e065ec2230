"""Window features vs pandas rolling/expanding/shift oracles
(reference semantics: feature_engineering/rolling_features.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tsforge_spark.operators.features import (
    add_differences,
    add_expanding,
    add_lags,
    add_rolling,
    top_n_per_group,
)
from tsforge_spark.operators.timefeat import add_cyclical, add_time_features, add_time_index


def test_rolling_matches_pandas(spark, panel, panel_pdf):
    got = (
        add_rolling(panel, "y", [7], ["mean", "std", "min", "max", "sum"],
                    "unique_id", ["ds"])
        .toPandas()
        .sort_values(["unique_id", "ds"])
        .reset_index(drop=True)
    )
    g = panel_pdf.sort_values(["unique_id", "ds"]).groupby("unique_id")["y"]
    want = {
        "y_rollmean_7": g.transform(lambda s: s.rolling(7, min_periods=1).mean()),
        "y_rollstd_7": g.transform(lambda s: s.rolling(7, min_periods=1).std()),
        "y_rollmin_7": g.transform(lambda s: s.rolling(7, min_periods=1).min()),
        "y_rollmax_7": g.transform(lambda s: s.rolling(7, min_periods=1).max()),
        "y_rollsum_7": g.transform(lambda s: s.rolling(7, min_periods=1).sum()),
    }
    base = panel_pdf.sort_values(["unique_id", "ds"]).reset_index(drop=True)
    for col, series in want.items():
        np.testing.assert_allclose(
            got[col].to_numpy(),
            series.reset_index(drop=True).to_numpy(),
            rtol=1e-9, atol=1e-12, equal_nan=True,
        )
    assert len(got) == len(base)


def test_expanding_and_diff(spark, panel, panel_pdf):
    df = add_expanding(panel, "y", ["sum", "max"], "unique_id", ["ds"])
    df = add_differences(df, "y", [1, 7], "unique_id", ["ds"])
    df = add_lags(df, ["y"], [3], "unique_id", ["ds"])
    got = df.toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)
    srt = panel_pdf.sort_values(["unique_id", "ds"])
    g = srt.groupby("unique_id")["y"]
    np.testing.assert_allclose(
        got["y_expandsum"], g.cumsum().reset_index(drop=True), rtol=1e-12
    )
    np.testing.assert_allclose(
        got["y_expandmax"], g.cummax().reset_index(drop=True), rtol=1e-12
    )
    np.testing.assert_allclose(
        got["y_diff_1"],
        (srt["y"] - g.shift(1)).reset_index(drop=True),
        rtol=1e-12, equal_nan=True,
    )
    np.testing.assert_allclose(
        got["y_lag3"], g.shift(3).reset_index(drop=True), rtol=1e-12, equal_nan=True
    )


def test_time_features_match_pandas(spark, panel, panel_pdf):
    got = (
        add_time_features(panel.select("unique_id", "ds"), "ds")
        .toPandas()
        .sort_values(["unique_id", "ds"])
        .reset_index(drop=True)
    )
    dt = pd.DatetimeIndex(
        panel_pdf.sort_values(["unique_id", "ds"])["ds"].reset_index(drop=True)
    )
    assert (got["year"] == dt.year).all()
    assert (got["month"] == dt.month).all()
    assert (got["week"] == dt.isocalendar().week.to_numpy()).all()
    assert (got["dayofweek"] == dt.dayofweek).all()
    assert (got["is_weekend"] == (dt.dayofweek >= 5).astype(int)).all()
    assert (got["is_month_start"] == dt.is_month_start.astype(int)).all()
    assert (got["is_month_end"] == dt.is_month_end.astype(int)).all()
    assert (got["is_quarter_start"] == dt.is_quarter_start.astype(int)).all()
    assert (got["is_year_end"] == dt.is_year_end.astype(int)).all()


def test_cyclical_and_time_index(spark, panel, panel_pdf):
    got = (
        add_time_index(add_cyclical(panel, "ds"), "ds", "unique_id")
        .toPandas()
        .sort_values(["unique_id", "ds"])
        .reset_index(drop=True)
    )
    srt = panel_pdf.sort_values(["unique_id", "ds"])
    dt = pd.DatetimeIndex(srt["ds"].reset_index(drop=True))
    np.testing.assert_allclose(
        got["dow_sin"], np.sin(2 * np.pi * dt.dayofweek / 7), atol=1e-12
    )
    want_idx = (
        srt.groupby("unique_id")["ds"].transform(lambda s: (s - s.min()).dt.days)
    ).reset_index(drop=True)
    assert (got["time_idx"] == want_idx).all()


def test_top_n_per_group(spark, panel):
    top = top_n_per_group(panel, "unique_id", [__import__("pyspark.sql.functions", fromlist=["desc"]).desc("y")], 3)
    counts = top.groupBy("unique_id").count().toPandas()
    assert (counts["count"] == 3).all()
