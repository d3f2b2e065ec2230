"""Gap fill vs the reference semantics (``preprocessing/fill_gaps.py``):
pandas oracle = Grouper grid + Series.interpolate / np.interp, exercising
both interpolation edge behaviors (SURVEY.md §7.4.5), and SQL-path ==
UDF-path equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsforge_spark.operators.gapfill import complete_grid, fill_gaps, locf


@pytest.fixture(scope="module")
def daily_pdf():
    rng = np.random.default_rng(42)
    frames = []
    for i, n in [(0, 40), (1, 25), (2, 60)]:
        dates = pd.date_range("2024-01-01", periods=n, freq="D")
        keep = rng.random(n) > 0.3
        keep[0] = keep[-1] = True
        y = rng.normal(10, 3, n)
        frames.append(
            pd.DataFrame(
                {"uid": f"s{i}", "ds": dates[keep].astype("datetime64[us]"),
                 "y": y[keep]}
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    # leading/trailing gap series: nulls at both edges after grid join are
    # exercised via a series whose first/last retained dates differ.
    return pdf


@pytest.fixture(scope="module")
def daily(spark, daily_pdf):
    return spark.createDataFrame(daily_pdf).cache()


def pandas_fill_oracle(pdf: pd.DataFrame, how: str) -> pd.DataFrame:
    out = []
    for uid, g in pdf.groupby("uid"):
        g = g.set_index("ds").sort_index()
        grid = pd.date_range(g.index.min(), g.index.max(), freq="D")
        y = g["y"].reindex(grid)
        if how == "zero":
            y = y.fillna(0.0)
        elif how == "locf":
            y = y.ffill()
        elif how == "mean":
            y = y.fillna(y.mean())
        elif how == "interp_pandas":
            y = y.interpolate()  # leading stays NaN, trailing ffills
        elif how == "interp_clamp":
            t = grid.view("int64")
            mask = y.notna().to_numpy()
            y = pd.Series(
                np.where(mask, y, np.interp(t, t[mask], y[mask])), index=grid
            )
        out.append(pd.DataFrame({"uid": uid, "ds": grid, "y": y.to_numpy()}))
    res = pd.concat(out, ignore_index=True)
    res["ds"] = res["ds"].astype("datetime64[us]")
    return res.sort_values(["uid", "ds"]).reset_index(drop=True)


def normalize(pdf):
    pdf = pdf.sort_values(["uid", "ds"]).reset_index(drop=True)
    pdf["ds"] = pd.to_datetime(pdf["ds"]).astype("datetime64[us]")
    return pdf[["uid", "ds", "y"]]


def test_grid_is_dense(spark, daily, daily_pdf):
    grid = complete_grid(daily, "uid", "ds", "1d").toPandas()
    for uid, g in daily_pdf.groupby("uid"):
        n_expected = (g["ds"].max() - g["ds"].min()).days + 1
        assert (grid["uid"] == uid).sum() == n_expected


@pytest.mark.parametrize("how", ["zero", "locf", "mean"])
def test_simple_fills(spark, daily, daily_pdf, how):
    got = normalize(
        fill_gaps(daily, "uid", "ds", "1d", target_col="y", target_fill=how).toPandas()
    )
    want = pandas_fill_oracle(daily_pdf, how)
    pd.testing.assert_frame_equal(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("method,oracle", [("pandas", "interp_pandas"), ("clamp", "interp_clamp")])
@pytest.mark.parametrize("use_udf", [False, True])
def test_interpolate_both_paths(spark, daily, daily_pdf, method, oracle, use_udf):
    got = normalize(
        fill_gaps(
            daily, "uid", "ds", "1d",
            target_col="y", target_fill="interpolate",
            method=method, use_udf=use_udf,
        ).toPandas()
    )
    want = pandas_fill_oracle(daily_pdf, oracle)
    pd.testing.assert_frame_equal(got, want, rtol=1e-9, atol=1e-12)


def test_static_replication_and_dynamic_ffill(spark):
    pdf = pd.DataFrame(
        {
            "uid": ["a"] * 3,
            "ds": pd.to_datetime(["2024-01-01", "2024-01-03", "2024-01-06"]).astype(
                "datetime64[us]"
            ),
            "y": [1.0, 2.0, 3.0],
            "cat": ["red", "red", "red"],
            "promo": [0.5, None, 0.7],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        fill_gaps(
            df, "uid", "ds", "1d",
            target_col="y", target_fill="zero",
            static_cols=["cat"], dynamic_fill={"promo": "ffill"},
        )
        .toPandas()
        .sort_values("ds")
        .reset_index(drop=True)
    )
    assert len(out) == 6
    assert (out["cat"] == "red").all()  # static replicated into gap rows
    assert out["y"].tolist() == [1.0, 0.0, 2.0, 0.0, 0.0, 3.0]
    assert out["promo"].tolist() == [0.5, 0.5, 0.5, 0.5, 0.5, 0.7]


def test_locf_helper(spark):
    pdf = pd.DataFrame(
        {
            "uid": ["a"] * 4,
            "ds": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
            ).astype("datetime64[us]"),
            "y": [None, 1.0, None, 2.0],
        }
    )
    out = (
        locf(spark.createDataFrame(pdf), ["y"], "uid", "ds")
        .toPandas()
        .sort_values("ds")["y"]
        .tolist()
    )
    assert out[0] is None or np.isnan(out[0])
    assert out[1:] == [1.0, 1.0, 2.0]


def test_complete_grid_two_level_matches_single_sequence_any_tz(spark):
    """The chunked (physical-24h-window) fine-freq grid must equal the
    single-level sequence in ANY session timezone — calendar-day
    chunking breaks under DST shifts (America/New_York) and non-:00
    bucket phases (+05:30 truncation); the windows are therefore
    anchored at _lo in pure microsecond arithmetic."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tsforge_spark.operators.gapfill import _FREQ_INTERVAL, complete_grid

    prev = spark.conf.get("spark.sql.session.timeZone")
    pdf = pd.DataFrame(
        {
            "id": ["a", "a", "b", "b", "c", "c"],
            "t": pd.to_datetime(
                [
                    "2025-03-08 07:23:00", "2025-03-10 15:00:00",
                    "2025-11-01 00:00:00", "2025-11-03 12:02:00",
                    "2024-12-31 23:59:00", "2025-01-01 00:01:00",
                ]
            ),
        }
    )
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.createDataFrame(pdf)
            for freq, unit in (("1h", "hour"), ("1m", "minute")):
                src = df.select(
                    "id", F.date_trunc(unit, "t").alias("t")
                )
                got = (
                    complete_grid(src, "id", "t", freq)
                    .orderBy("id", "t")
                    .toPandas()
                )
                spans = src.groupBy("id").agg(
                    F.min("t").alias("_lo"), F.max("t").alias("_hi")
                )
                want = (
                    spans.select(
                        "id",
                        F.explode(
                            F.expr(
                                f"sequence(_lo, _hi, {_FREQ_INTERVAL[freq]})"
                            )
                        ).alias("t"),
                    )
                    .orderBy("id", "t")
                    .toPandas()
                )
                pd.testing.assert_frame_equal(
                    got, want, obj=f"grid[{tz}/{freq}]"
                )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_zero_filled_series_matches_grid_join(spark):
    """``zero_filled_series`` (round-8 single-pass gap-explode) must be
    ROW-IDENTICAL to the grid + left-join + coalesce(0) zero-fill it
    replaced on the catalog's hot paths — including multi-day gaps
    (exercises the day-chunked explode) and values at both span edges."""
    import datetime as dt

    from tsforge_spark.operators.gapfill import (
        complete_grid,
        zero_filled_series,
    )

    rows = []
    t0 = dt.datetime(2025, 1, 1, 0)
    # id 1: hourly with a 3-day hole; id 2: single observation;
    # id 3: dense pair at the end of a long span
    for h, v in ((0, 5), (1, 7), (80, 9), (81, 1)):
        rows.append((1, t0 + dt.timedelta(hours=h), v))
    rows.append((2, t0, 42))
    rows += [(3, t0 + dt.timedelta(hours=h), h) for h in (0, 50)]
    src = spark.createDataFrame(rows, ["id", "t", "v"])
    got = (
        zero_filled_series(src, "id", "t", "v", "1h")
        .orderBy("id", "t")
        .toPandas()
    )
    h = src
    grid = complete_grid(h.select("id", "t"), "id", "t", "1h")
    want = (
        grid.join(h, ["id", "t"], "left")
        .select("id", "t", F.coalesce("v", F.lit(0)).alias("v"))
        .orderBy("id", "t")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 82 + 1 + 51


def test_complete_grid_spread_row_identical(spark):
    """``complete_grid(spread=False)`` (round-8 per-consumer opt-out of
    the spans kernel_repartition) must return the same rows as the
    spread default — the flag may only change partitioning, never
    content — and the spread plan must carry the user-numbered
    repartition while the opt-out must not."""
    import datetime as dt

    from tsforge_spark.operators.gapfill import complete_grid

    t0 = dt.datetime(2025, 3, 1, 0)
    rows = [(i, t0 + dt.timedelta(hours=h)) for i in (1, 2, 3)
            for h in (0, 5, 30)]
    src = spark.createDataFrame(rows, ["id", "t"])
    on = complete_grid(src, "id", "t", "1h", spread=True)
    off = complete_grid(src, "id", "t", "1h", spread=False)
    a = on.orderBy("id", "t").toPandas()
    b = off.orderBy("id", "t").toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 3 * 31
    plan_on = on._jdf.queryExecution().toString()
    plan_off = off._jdf.queryExecution().toString()
    assert "REPARTITION_BY_NUM" in plan_on
    assert "REPARTITION_BY_NUM" not in plan_off
