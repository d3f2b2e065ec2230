"""Classical decomposition, deseasonalize guard, ts-features battery,
k-means fit — each checked against an independent pandas/numpy oracle
written with different primitives than the operators under test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsforge_spark.operators.decompose import (
    classical_decompose,
    deseasonalize_guard,
    seasonal_strength,
)
from tsforge_spark.operators.sessions import ts_features

PERIOD = 24


def _hourly_cents(n_ids=5, n_hours=24 * 14, seed=7) -> pd.DataFrame:
    """Deterministic hourly panel with a planted daily cycle + trend."""
    rng = np.random.default_rng(seed)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for i in range(n_ids):
        hod = np.arange(n_hours) % 24
        cyc = (100 * np.sin(2 * np.pi * hod / 24) * (i + 1)).round()
        trend = np.arange(n_hours) * (i + 1)
        noise = rng.integers(-20, 21, n_hours)
        c = (1000 + trend + cyc + noise).astype(np.int64)
        rows.append(
            pd.DataFrame(
                {
                    "uid": f"u{i}",
                    "bucket": t0 + pd.to_timedelta(np.arange(n_hours), "h"),
                    "c": c,
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def _pandas_decompose(g: pd.DataFrame) -> pd.DataFrame:
    """Independent oracle: pandas rolling (not window expressions)."""
    g = g.sort_values("bucket").reset_index(drop=True)
    y = g["c"].astype(float) / 100.0
    ma24 = y.rolling(24, center=True).mean()  # centers on right-of-middle
    trend = (ma24 + ma24.shift(-1)) / 2  # 2x24 MA
    detr = y - trend
    phase = g["bucket"].dt.hour
    means = detr.groupby(phase).mean()
    means = means - means.mean()
    seasonal = phase.map(means)
    resid = detr - seasonal
    return pd.DataFrame(
        {
            "bucket": g["bucket"],
            "value": y,
            "trend": trend,
            "seasonal": seasonal,
            "resid": resid,
        }
    )


def test_classical_decompose_matches_pandas(spark):
    pdf = _hourly_cents()
    df = spark.createDataFrame(pdf)
    out = (
        classical_decompose(df, "uid", "bucket", "c", period=PERIOD)
        .toPandas()
        .sort_values(["uid", "bucket"])
        .reset_index(drop=True)
    )
    for uid, g in pdf.groupby("uid"):
        want = _pandas_decompose(g)
        got = out[out["uid"] == uid].reset_index(drop=True)
        np.testing.assert_allclose(got["value"], want["value"], rtol=1e-12)
        np.testing.assert_allclose(got["trend"], want["trend"], rtol=1e-9)
        np.testing.assert_allclose(
            got["seasonal"], want["seasonal"], rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            got["resid"], want["resid"], rtol=1e-9, atol=1e-9
        )
        # additive identity on interior rows
        interior = got["trend"].notna()
        recon = got.loc[interior, ["trend", "seasonal", "resid"]].sum(axis=1)
        np.testing.assert_allclose(
            recon, got.loc[interior, "value"], rtol=1e-9
        )


def test_seasonal_strength_separates_cyclic_from_noise(spark):
    rng = np.random.default_rng(3)
    n = 24 * 21
    t0 = pd.Timestamp("2024-01-01")
    hod = np.arange(n) % 24
    cyc = (2000 + 1000 * np.sin(2 * np.pi * hod / 24)).round().astype(np.int64)
    flat = 2000 + rng.integers(-500, 501, n).astype(np.int64)
    pdf = pd.concat(
        [
            pd.DataFrame({"uid": "cyclic", "bucket": t0 + pd.to_timedelta(np.arange(n), "h"), "c": cyc}),
            pd.DataFrame({"uid": "noise", "bucket": t0 + pd.to_timedelta(np.arange(n), "h"), "c": flat}),
        ]
    )
    dec = classical_decompose(
        spark.createDataFrame(pdf), "uid", "bucket", "c", period=PERIOD
    )
    s = {
        r["uid"]: r["seasonal_strength"]
        for r in seasonal_strength(dec, "uid").collect()
    }
    assert s["cyclic"] > 0.95
    assert s["noise"] < 0.3


def _stationary_cyclic(n_ids=2, n_hours=24 * 10, seed=7) -> pd.DataFrame:
    """Stationary (no trend) noise-dominated daily-cycle panel: passes
    the ADF-lite stationarity gate (t << -2.86); a trending / random-
    walk series correctly fails it.  Noise dominates the cycle on
    purpose: the unaugmented Dickey-Fuller regression has low power
    against strongly SEASONAL stationary series (documented in
    deseasonalize_guard), and this test pins the gate mechanism, not
    the power curve."""
    rng = np.random.default_rng(seed)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for i in range(n_ids):
        hod = np.arange(n_hours) % 24
        cyc = (30 * np.sin(2 * np.pi * hod / 24) * (i + 1)).round()
        noise = rng.integers(-200, 201, n_hours)
        c = (1000 + cyc + noise).astype(np.int64)
        rows.append(
            pd.DataFrame(
                {
                    "uid": f"u{i}",
                    "bucket": t0 + pd.to_timedelta(np.arange(n_hours), "h"),
                    "c": c,
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def test_deseasonalize_guard_gates(spark):
    pdf = _stationary_cyclic(n_ids=2, n_hours=24 * 10)
    # an intermittent series (mostly zeros → ADI high) must be gated out
    n = 24 * 10
    t0 = pd.Timestamp("2024-01-01")
    c = np.zeros(n, dtype=np.int64)
    c[::7] = 500
    inter = pd.DataFrame(
        {"uid": "sparse", "bucket": t0 + pd.to_timedelta(np.arange(n), "h"), "c": c}
    )
    df = spark.createDataFrame(pd.concat([pdf, inter], ignore_index=True))
    out = deseasonalize_guard(df, "uid", "bucket", "c", period=PERIOD).toPandas()
    ok = out.groupby("uid")["deseason_ok"].first()
    assert bool(ok["u0"]) and bool(ok["u1"])
    assert not bool(ok["sparse"])
    # gated-out series: deseasonalized == value everywhere
    sp = out[out["uid"] == "sparse"]
    np.testing.assert_allclose(sp["deseasonalized"], sp["value"])
    # gated-in series: interior rows actually deseasonalized
    u0 = out[(out["uid"] == "u0") & out["seasonal"].notna()]
    np.testing.assert_allclose(
        u0["deseasonalized"], u0["value"] - u0["seasonal"], rtol=1e-9
    )


def test_ts_features_battery(spark):
    rng = np.random.default_rng(11)
    n = 24 * 28
    t0 = pd.Timestamp("2024-01-01")
    hod = np.arange(n) % 24
    seasonal_y = 500 + 200 * np.sin(2 * np.pi * hod / 24) + rng.normal(0, 5, n)
    noise_y = rng.normal(500, 50, n)
    pdf = pd.concat(
        [
            pd.DataFrame({"uid": "seasonal", "bucket": t0 + pd.to_timedelta(np.arange(n), "h"), "v": seasonal_y}),
            pd.DataFrame({"uid": "noise", "bucket": t0 + pd.to_timedelta(np.arange(n), "h"), "v": noise_y}),
        ]
    )
    out = (
        ts_features(spark.createDataFrame(pdf), "uid", "bucket", "v", freq=24)
        .toPandas()
        .set_index("series_id")
    )
    # spectral entropy: the pure-noise series is nearly flat-spectrum
    assert out.loc["noise", "spectral_entropy"] > 0.9
    assert (
        out.loc["seasonal", "spectral_entropy"]
        < out.loc["noise", "spectral_entropy"]
    )
    # independent numpy check of the spectral entropy value
    y = seasonal_y
    ps = np.abs(np.fft.rfft(y - y.mean())) ** 2
    ps = ps[1:]
    p = ps / ps.sum()
    p = p[p > 0]
    want = -(p * np.log2(p)).sum() / np.log2(len(ps))
    np.testing.assert_allclose(
        out.loc["seasonal", "spectral_entropy"], want, rtol=1e-12
    )
    # MI lag concentration in (0, 1]; higher for the seasonal series
    for uid in ("seasonal", "noise"):
        assert 0 < out.loc[uid, "mi_top_k_lags"] <= 1
    assert out.loc["seasonal", "mi_top_k_lags"] > out.loc["noise", "mi_top_k_lags"]
    # seasonal strength m=4/13/52 present and clipped to [0, 1]
    for m in (4, 13, 52):
        col = f"seasonal_strength_m{m}"
        assert ((out[col] >= 0) & (out[col] <= 1)).all()
    # reference-formula twin for m=4 on the seasonal series
    mae1 = np.mean(np.abs(y[:-1] - y[1:]))
    mae4 = np.mean(np.abs(y[:-4] - y[4:]))
    want_s4 = float(np.clip(1 - mae4 / mae1, 0, 1))
    np.testing.assert_allclose(
        out.loc["seasonal", "seasonal_strength_m4"], want_s4, rtol=1e-12
    )
    # forecastability = PE(series)/PE(resid): seasonal < 1 is possible
    # for sinusoids; the key property is that it is finite and the noise
    # series sits near 1 (residuals look like the series itself)
    assert np.isfinite(out.loc["seasonal", "forecastability"])
    assert abs(out.loc["noise", "forecastability"] - 1) < 0.1


def test_dfa_exponent_regimes(spark):
    """DFA slope ≈ 0.5 for white noise, ≈ 1.5 for its random walk."""
    rng = np.random.default_rng(5)
    n = 2048
    wn = rng.normal(0, 1, n)
    t0 = pd.Timestamp("2024-01-01")
    pdf = pd.concat(
        [
            pd.DataFrame({"uid": "wn", "bucket": t0 + pd.to_timedelta(np.arange(n), "h"), "v": wn}),
            pd.DataFrame({"uid": "rw", "bucket": t0 + pd.to_timedelta(np.arange(n), "h"), "v": np.cumsum(wn)}),
        ]
    )
    out = (
        ts_features(spark.createDataFrame(pdf), "uid", "bucket", "v")
        .toPandas()
        .set_index("series_id")
    )
    assert abs(out.loc["wn", "hurst_dfa"] - 0.5) < 0.15
    assert abs(out.loc["rw", "hurst_dfa"] - 1.5) < 0.2


def test_kmeans_fit_recovers_clusters(spark):
    """3 well-separated direction clusters: the fit should converge to
    one centroid per cluster and cut brute-force inertia vs init."""
    from tsforge_spark.operators.similarity import assign_cells, kmeans_fit

    rng = np.random.default_rng(9)
    dirs = np.eye(3)
    rows = []
    for i in range(300):
        d = dirs[i % 3] + rng.normal(0, 0.05, 3)
        rows.append((i, [float(x) for x in d]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, iters=4)
    assert len(cents) == 3
    assigned = assign_cells(df, cents).toPandas()
    # each true cluster maps to exactly one cell
    assigned["true"] = assigned["vec_id"] % 3
    grp = assigned.groupby("true")["cell"].nunique()
    assert (grp == 1).all()
    assert assigned["cell"].nunique() == 3


def test_kmeans_sampled_fit(spark):
    from tsforge_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(13)
    rows = [
        (i, [float(x) for x in np.eye(2)[i % 2] + rng.normal(0, 0.05, 2)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=2, iters=3, sample_frac=0.5)
    assert len(cents) == 2
    # centroids should point along the two axes
    axes = sorted(int(np.argmax(np.abs(c))) for _, c in cents)
    assert axes == [0, 1]


def test_decompose_invariants_property(spark):
    """Property-based: for random integer series and periods, classical
    decomposition must satisfy (a) additive identity on interior rows,
    (b) centered seasonal (distinct phase effects sum ~ 0), (c) null
    trend/resid exactly on the half-window edges, (d) row preservation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    @settings(max_examples=5, deadline=None)
    @given(
        values=st.lists(st.integers(0, 10_000), min_size=40, max_size=150),
        period=st.sampled_from([4, 6, 12]),
    )
    def check(values, period):
        n = len(values)
        t0 = pd.Timestamp("2024-01-01")
        pdf = pd.DataFrame(
            {
                "uid": "s",
                "bucket": t0 + pd.to_timedelta(np.arange(n), "min"),
                "c": np.asarray(values, dtype=np.int64),
            }
        )
        phase = (
            (F.unix_micros(F.col("bucket")) / F.lit(60_000_000)).cast("long")
            % period
        )
        out = (
            classical_decompose(
                spark.createDataFrame(pdf), "uid", "bucket", "c",
                period=period, phase_expr=phase,
            )
            .toPandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        assert len(out) == n
        half = period // 2
        # edges: exactly the first/last `half` rows lack trend
        assert out["trend"].head(half).isna().all()
        assert out["trend"].tail(half).isna().all()
        interior = out["trend"].notna()
        assert interior.sum() == max(n - 2 * half, 0)
        recon = out.loc[interior, ["trend", "seasonal", "resid"]].sum(axis=1)
        np.testing.assert_allclose(
            recon, out.loc[interior, "value"], rtol=1e-9, atol=1e-9
        )
        seas = out.loc[out["seasonal"].notna()]
        if len(seas):
            per_phase = seas.groupby(
                seas["bucket"].astype("int64") // 60_000_000_000 % period
            )["seasonal"].first()
            assert abs(per_phase.mean()) < 1e-9

    check()


def test_asof_tolerance(spark):
    """As-of join tolerance: matches older than the lookback become
    NULL (pd.merge_asof tolerance semantics), same shuffle count."""
    from tsforge_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "a"],
             "t": [pd.Timestamp("2024-01-01 10:00"), pd.Timestamp("2024-01-01 13:00")]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a"], "t": [pd.Timestamp("2024-01-01 09:30")], "v": [1.0]}
        )
    )
    out = (
        asof_join(left, right, "k", "t", ["v"], tolerance="2 hours")
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    assert out["v_asof"].iloc[0] == 1.0          # 30 min back: in window
    assert pd.isna(out["v_asof"].iloc[1])        # 3.5 h back: too old
    # without tolerance both match
    out2 = asof_join(left, right, "k", "t", ["v"]).toPandas()
    assert out2["v_asof"].notna().all()
    # the cogroup/merge_asof twin agrees on tolerance semantics
    from tsforge_spark.operators.asof import asof_join_pandas

    out3 = (
        asof_join_pandas(left, right, "k", "t", ["v"], tolerance="2 hours")
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    assert out3["v_asof"].iloc[0] == 1.0 and pd.isna(out3["v_asof"].iloc[1])


def test_outliers_on_deseasonalized_series(spark):
    """A spike that hides inside raw seasonal variance is flagged once
    the cycle is removed (reference _detect_outliers_df composition)."""
    from tsforge_spark.operators.outliers import (
        flag_outliers,
        flag_outliers_deseasonalized,
    )

    rng = np.random.default_rng(23)
    n = 24 * 20
    t0 = pd.Timestamp("2024-01-01")
    hod = np.arange(n) % 24
    c = (5000 + 3000 * np.sin(2 * np.pi * hod / 24) + rng.normal(0, 30, n)).round()
    spike_at = 24 * 10 + 6
    c[spike_at] += 1200  # ~0.4 sigma of the RAW series, 40 sigma deseasonalized
    pdf = pd.DataFrame(
        {"uid": "s", "bucket": t0 + pd.to_timedelta(np.arange(n), "h"),
         "c": c.astype(np.int64)}
    )
    df = spark.createDataFrame(pdf)
    raw = flag_outliers(
        df.withColumn("y", F.col("c").cast("double")), "y", "uid", "zscore", 3.0
    ).toPandas().sort_values("bucket").reset_index(drop=True)
    assert raw["is_outlier"].iloc[spike_at] == 0  # invisible in raw space
    des = (
        flag_outliers_deseasonalized(df, "uid", "bucket", "c", "zscore", 3.0)
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert bool(des["deseason_ok"].iloc[0])
    assert des["is_outlier"].iloc[spike_at] == 1  # visible deseasonalized
    assert des["is_outlier"].sum() <= 5           # and not noisy


def _np_red_flags(y: np.ndarray, horizon: int = 30) -> dict:
    """Independent numpy replica of the reference check_red_flags
    (eda/check_red_flags.py:22-50) + score_mase seasonal strengths
    (ts_features_extension.py:160-170)."""
    flags = {}
    if len(y) > 2 and y.std() > 0:
        z = (y - y.mean()) / y.std()
        flags["outliers"] = (np.abs(z) > 3).mean() * 100 > 2
    else:
        flags["outliers"] = False
    flags["intermittent"] = (y == 0).mean() * 100 > 30
    if len(y) > 20:
        first, second = y[: len(y) // 2], y[len(y) // 2:]
        flags["structural_break"] = bool(
            first.mean() > 0
            and abs(second.mean() - first.mean()) / first.mean() > 0.5
        )
    else:
        flags["structural_break"] = False
    flags["short_history"] = len(y) < 2 * horizon
    flags["constant"] = y.std() < 1e-6
    mae1 = np.mean(np.abs(np.diff(y))) if len(y) > 1 else np.nan
    for m in (4, 13, 52):
        if len(y) > m and np.isfinite(mae1) and mae1 > 0:
            mae_m = np.mean(np.abs(y[m:] - y[:-m]))
            flags[f"strength_m{m}"] = float(np.clip(1 - mae_m / mae1, 0, 1))
        else:
            flags[f"strength_m{m}"] = None
    return flags


def test_red_flags_battery_matches_reference_formulas(spark):
    from tsforge_spark.operators.diagnostics import red_flags_battery

    rng = np.random.default_rng(11)
    t0 = pd.Timestamp("2024-01-01")
    series = {
        # constant (and therefore zero-mae1 -> null strengths)
        "const": np.full(100, 500, dtype=np.int64),
        # >30% zeros -> intermittent
        "sparse": np.where(rng.random(120) < 0.6, 0, 100).astype(np.int64),
        # level shift x3 halfway -> structural break
        "brk": np.r_[np.full(60, 100), np.full(60, 400)].astype(np.int64)
        + rng.integers(-5, 6, 120),
        # a few huge spikes -> >2% |z|>3 outliers
        "spiky": np.where(
            rng.random(200) < 0.04, 50_000, rng.integers(90, 110, 200)
        ).astype(np.int64),
        # short history
        "short": rng.integers(0, 50, 12).astype(np.int64),
        # strong period-4 cycle -> high strength_m4
        "cyc4": (1000 + 500 * np.sin(2 * np.pi * np.arange(208) / 4))
        .round()
        .astype(np.int64),
    }
    rows = []
    for uid, y in series.items():
        rows.append(
            pd.DataFrame(
                {
                    "uid": uid,
                    "bucket": t0 + pd.to_timedelta(np.arange(len(y)), "h"),
                    "c": y,
                }
            )
        )
    pdf = pd.concat(rows, ignore_index=True)
    out = (
        red_flags_battery(
            spark.createDataFrame(pdf), "uid", "bucket", "c", horizon=30
        )
        .toPandas()
        .set_index("uid")
    )
    for uid, y in series.items():
        exp = _np_red_flags(y.astype(np.float64))
        got = out.loc[uid]
        for k in (
            "outliers",
            "intermittent",
            "structural_break",
            "short_history",
            "constant",
        ):
            assert bool(got[f"flag_{k}"]) == exp[k], (uid, k)
        for m in (4, 13, 52):
            e = exp[f"strength_m{m}"]
            g = got[f"seasonal_strength_m{m}"]
            if e is None:
                assert pd.isna(g), (uid, m, g)
            else:
                assert abs(g - e) < 1e-12, (uid, m, g, e)
    # planted expectations actually exercise every flag=1 path
    assert bool(out.loc["const", "flag_constant"])
    assert bool(out.loc["sparse", "flag_intermittent"])
    assert bool(out.loc["brk", "flag_structural_break"])
    assert bool(out.loc["spiky", "flag_outliers"])
    assert bool(out.loc["short", "flag_short_history"])
    assert out.loc["cyc4", "seasonal_strength_m4"] > 0.9


def test_ts_battery_sql_strengths_match_kernel(spark):
    """The oracle-checked SQL strengths and the applyInPandas battery's
    strengths are the same numbers (ties the EXACT driver row to the
    pytest-pinned kernel)."""
    from tsforge_spark.operators.diagnostics import red_flags_battery

    pdf = _hourly_cents(n_ids=3, n_hours=24 * 9)
    sdf = spark.createDataFrame(pdf)
    sql_out = (
        red_flags_battery(sdf, "uid", "bucket", "c")
        .toPandas()
        .set_index("uid")
    )
    kern_out = (
        ts_features(sdf, "uid", "bucket", "c", freq=24)
        .toPandas()
        .set_index("series_id")
    )
    for uid in sql_out.index:
        for m in (4, 13, 52):
            a = sql_out.loc[uid, f"seasonal_strength_m{m}"]
            b = kern_out.loc[uid, f"seasonal_strength_m{m}"]
            if pd.isna(b):
                assert pd.isna(a)
            else:
                assert abs(a - b) < 1e-9, (uid, m, a, b)
        assert int(sql_out.loc[uid, "n"]) == int(kern_out.loc[uid, "n"])


def test_asof_tolerance_per_column_null_gating(spark):
    """A null in ONE right value column must not let an older,
    beyond-tolerance value pass the gate for that column while the other
    column still matches (ADVICE r2: per-value-column matched ts)."""
    from tsforge_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "t": [pd.Timestamp("2024-01-01 10:00")]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "t": [
                    pd.Timestamp("2024-01-01 06:00"),  # too old for 2h
                    pd.Timestamp("2024-01-01 09:30"),  # in window
                ],
                "u": [7.0, 2.0],
                "v": [5.0, None],  # newest in-window row is null in v
            }
        )
    )
    out = asof_join(
        left, right, "k", "t", ["u", "v"], tolerance="2 hours"
    ).toPandas()
    assert out["u_asof"].iloc[0] == 2.0  # newest in-window non-null u
    # v's only non-null source row is 4h old -> gated out, NOT 5.0
    assert pd.isna(out["v_asof"].iloc[0])


def _np_df_tstat(y: np.ndarray) -> float:
    """Independent numpy Dickey–Fuller regression (constant, no
    augmentation): Δy_t = a + g·y_{t−1}; returns the t-stat of g via
    lstsq (different primitives than the engine's closed-form sums)."""
    x = y[:-1]
    d = np.diff(y)
    X = np.c_[np.ones(len(x)), x]
    beta, *_ = np.linalg.lstsq(X, d, rcond=None)
    resid = d - X @ beta
    s2 = (resid @ resid) / (len(d) - 2)
    cov = s2 * np.linalg.inv(X.T @ X)
    return float(beta[1] / np.sqrt(cov[1, 1]))


def test_adf_lite_gate_stationary_vs_random_walk(spark):
    """The ADF-lite stationarity gate (reference nixtla_demo.py:418-424)
    passes mean-reverting series and rejects random walks; the engine's
    closed-form t-stat agrees with a numpy lstsq oracle."""
    from tsforge_spark.operators.decompose import deseasonalize_guard

    rng = np.random.default_rng(5)
    n = 24 * 12
    t0 = pd.Timestamp("2024-01-01")
    hod = np.arange(n) % 24
    series = {
        # mean-reverting noise around a mild cycle -> stationary
        "stat": (1000 + 50 * np.sin(2 * np.pi * hod / 24)
                 + rng.integers(-200, 201, n)).round().astype(np.int64),
        # random walk with drift -> non-stationary, must be gated out
        "walk": (2000 + np.cumsum(rng.integers(-5, 8, n))).astype(np.int64),
    }
    pdf = pd.concat(
        [
            pd.DataFrame(
                {"uid": k,
                 "bucket": t0 + pd.to_timedelta(np.arange(n), "h"),
                 "c": v}
            )
            for k, v in series.items()
        ],
        ignore_index=True,
    )
    out = (
        deseasonalize_guard(
            spark.createDataFrame(pdf), "uid", "bucket", "c", period=24
        )
        .toPandas()
        .groupby("uid")["deseason_ok"]
        .first()
    )
    for k, y in series.items():
        t = _np_df_tstat(y.astype(np.float64))
        assert bool(out[k]) == (t < -2.86), (k, t, out[k])
    assert bool(out["stat"]) and not bool(out["walk"])


def test_ann_ivf_with_fitted_centroids_recall(spark):
    """VERDICT r2 #7: the IVF path wired to kmeans_fit (fit on a
    deterministic hash-sample, assign/search the full set) — recall@10
    vs exact brute force on the synthetic embeddings."""
    from tsforge_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_fit,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    rest = e.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in brute_force_topk(rest, q, 10).collect()}
    cents = kmeans_fit(e, k=16, iters=5, sample_frac=0.5)
    approx = {
        r["vec_id"] for r in ivf_topk(rest, cents, q, 10, n_probe=2).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.7, recall  # measured 0.9 on this data
