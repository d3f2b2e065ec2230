"""LOESS STL kernel: loess exactness/consistency properties + STL
recovery on synthetic series + the Spark grouped-kernel surface."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tsforge_spark.operators.stl_loess import loess_smooth, stl_loess


def naive_loess(y, span):
    """Independent per-point reference: explicit neighbour search +
    np.polyfit weighted linear fit (checks the vectorized closed form)."""
    n = len(y)
    q = min(max(span, 2), n)
    out = np.empty(n)
    x = np.arange(n, dtype=float)
    for i in range(n):
        s = int(np.clip(i - (q - 1) // 2, 0, n - q))
        xs, ys = x[s : s + q], np.asarray(y[s : s + q], dtype=float)
        d = np.abs(xs - i)
        dmax = d.max()
        u = d / dmax if dmax > 0 else d * 0
        w = np.clip(1 - u**3, 0, None) ** 3
        if w.sum() <= 0:
            w = np.ones_like(w)
        W = np.diag(w)
        A = np.stack([np.ones_like(xs), xs - i], axis=1)
        beta, *_ = np.linalg.lstsq(A.T @ W @ A, A.T @ W @ ys, rcond=None)
        out[i] = beta[0]
    return out


def test_loess_reproduces_affine_exactly():
    # a degree-1 weighted fit is exact on affine data for ANY weights
    y = 3.5 * np.arange(100) - 7.25
    for span in (5, 23, 99):
        sm = loess_smooth(y, span)
        assert np.allclose(sm, y, atol=1e-8)


def test_loess_matches_naive_reference():
    rng = np.random.default_rng(7)
    y = np.cumsum(rng.normal(size=80))
    for span in (7, 15, 41):
        assert np.allclose(
            loess_smooth(y, span), naive_loess(y, span), atol=1e-9
        ), span


def test_loess_njump_affine_exact():
    # linear interpolation between exact affine fits is still affine
    y = 3.0 * np.arange(50) + 2.0
    for j in (2, 3, 5, 11, 49):
        assert np.allclose(loess_smooth(y, 13, n_jump=j), y, atol=1e-9), j


def test_loess_njump_close_to_dense():
    rng = np.random.default_rng(11)
    y = np.cumsum(rng.normal(size=200))
    dense = loess_smooth(y, 31)
    for j in (2, 4, 8):
        sk = loess_smooth(y, 31, n_jump=j)
        # fitted points are identical; interpolated ones close
        assert np.allclose(sk[::j], dense[::j], atol=1e-12)
        assert np.abs(sk - dense).max() < 0.25 * np.std(y), j


def test_loess_batch_matches_rows():
    # 2-D input: row r == the 1-D call on y[r], bit-for-bit
    rng = np.random.default_rng(5)
    Y = rng.normal(size=(6, 37))
    Rho = rng.uniform(0.2, 1.0, size=(6, 37))
    for span, rho in ((7, None), (15, Rho), (37, Rho)):
        got = loess_smooth(Y, span, rho)
        for r in range(Y.shape[0]):
            want = loess_smooth(Y[r], span, None if rho is None else rho[r])
            # 1-ulp slack: numpy's pairwise-sum blocking may differ
            # between the 2-D and 1-D reduce paths
            assert np.allclose(got[r], want, atol=1e-12), (span, r)


def test_stl_jump_close_to_dense():
    rng = np.random.default_rng(13)
    n, p = 24 * 20, 24
    t = np.arange(n)
    y = 0.05 * t + 3 * np.sin(2 * np.pi * t / p) + rng.normal(0, 0.3, n)
    Td, Sd, _ = stl_loess(y, p, seasonal=7)
    for j in (2, 4):
        Tj, Sj, Rj = stl_loess(y, p, seasonal=7, jump=j)
        assert np.allclose(Tj + Sj + Rj, y, atol=1e-12)  # exact closure
        # statsmodels-style tolerance: the skipped fit tracks the dense
        # one to well under the noise scale
        assert np.abs(Tj - Td).max() < 0.15, j
        assert np.abs(Sj - Sd).max() < 0.15, j


def test_loess_robustness_weights_downweight_outlier():
    y = np.zeros(60)
    y[30] = 100.0
    rho = np.ones(60)
    rho[30] = 0.0
    sm = loess_smooth(y, 15, rho)
    assert np.abs(sm).max() < 1e-9  # outlier fully ignored


def test_stl_recovers_trend_plus_seasonal():
    rng = np.random.default_rng(42)
    n, p = 24 * 14, 24
    t = np.arange(n)
    trend_true = 0.05 * t + 10
    seas_true = 3.0 * np.sin(2 * np.pi * t / p)
    y = trend_true + seas_true + rng.normal(scale=0.05, size=n)
    T, S, R = stl_loess(y, p, seasonal=7)
    # exact closure by construction
    assert np.allclose(T + S + R, y, atol=1e-12)
    # interior recovery (edges are loess-extrapolated)
    sl = slice(2 * p, n - 2 * p)
    assert np.abs(T[sl] - trend_true[sl]).mean() < 0.2
    assert np.abs(S[sl] - seas_true[sl]).mean() < 0.2
    assert np.abs(R[sl]).mean() < 0.2
    # seasonal is centered: cycle means near zero
    assert np.abs(S[sl].reshape(-1, p).mean()) < 0.05


def test_stl_robust_damps_spike():
    rng = np.random.default_rng(3)
    n, p = 24 * 10, 24
    t = np.arange(n)
    y = 2.0 * np.sin(2 * np.pi * t / p) + rng.normal(scale=0.05, size=n)
    y_spiked = y.copy()
    y_spiked[n // 2] += 50.0
    T0, S0, _ = stl_loess(y_spiked, p, outer=0)
    T2, S2, _ = stl_loess(y_spiked, p, outer=2)
    sl = slice(2 * p, n - 2 * p)
    # robustness iterations pull trend+seasonal back toward the clean fit
    Tc, Sc, _ = stl_loess(y, p, outer=0)
    err0 = np.abs((T0 + S0)[sl] - (Tc + Sc)[sl]).mean()
    err2 = np.abs((T2 + S2)[sl] - (Tc + Sc)[sl]).mean()
    assert err2 < err0


def test_stl_short_series_raises():
    with pytest.raises(ValueError):
        stl_loess(np.zeros(30), 24)


def test_stl_spark_surface(spark):
    from tsforge_spark.operators.stl_loess import stl_decompose_loess

    n, p = 24 * 10, 24
    t = np.arange(n)
    rows = []
    for uid in ("a", "b"):
        scale = 1.0 if uid == "a" else 4.0
        y = scale * np.sin(2 * np.pi * t / p) + 0.01 * t
        ts = pd.date_range("2025-01-01", periods=n, freq="h")
        rows.append(
            pd.DataFrame({"uid": uid, "ts": ts, "y": y})
        )
    pdf = pd.concat(rows)
    df = spark.createDataFrame(pdf)
    out = stl_decompose_loess(df, "uid", "ts", "y", period=p).toPandas()
    assert len(out) == 2 * n
    for uid, g in out.groupby("uid"):
        g = g.sort_values("ts")
        assert np.allclose(
            g["trend"] + g["seasonal"] + g["resid"], g["value"], atol=1e-12
        )
        # and the kernel agrees with the numpy function exactly
        T, S, R = stl_loess(
            g["value"].to_numpy(), p, seasonal=7
        )
        assert np.allclose(g["trend"].to_numpy(), T, atol=1e-12)


def test_decomposition_precompute_consumer_path(spark):
    """The plot-facing consumer: top-k select → zero-filled regular
    grid → loess STL → long component frame.  Mirrors how the
    reference feeds STL into its decomposition chart
    (plots/charts/plot_decomposition.py:23-97)."""
    from pyspark.sql import functions as F

    from tsforge_spark.operators.stl_loess import decomposition_precompute

    n, p = 24 * 8, 24
    t = np.arange(n)
    ts = pd.date_range("2025-03-01", periods=n, freq="h")
    rows = []
    # three users with distinct magnitudes; "small" must NOT survive
    # the top-2 cut
    for uid, scale in (("big", 100.0), ("mid", 10.0), ("small", 1.0)):
        y = scale * (2 + np.sin(2 * np.pi * t / p))
        rows.append(pd.DataFrame({"user_id": uid, "ts": ts, "value": y}))
    df = spark.createDataFrame(pd.concat(rows))
    out = decomposition_precompute(
        df, "user_id", "ts", "value", freq="1h", period=p, top_k=2
    ).toPandas()

    assert set(out["user_id"]) == {"big", "mid"}
    assert set(out["component"]) == {"value", "trend", "seasonal", "resid"}
    # 4 components per (id, bucket) grid point
    assert len(out) == 2 * n * 4
    wide = out.pivot_table(
        index=["user_id", "bucket"], columns="component", values="y"
    ).reset_index()
    ok = wide.dropna()
    assert len(ok) > 0
    assert np.allclose(
        ok["trend"] + ok["seasonal"] + ok["resid"], ok["value"], atol=1e-9
    )


def test_precompute_default_is_dense_and_plot_jump_is_explicit():
    """r6 ADVICE: decomposition_precompute silently defaulted to a
    plot-grade skip.  Pin the fix: the default is the exact dense
    jump=1 fit (statsmodels' *_jump defaults, what the reference's
    plot_decomposition.py gets), and the Cleveland n_t//10 skip is an
    explicit opt-in via plot_grade_jump."""
    import inspect

    from tsforge_spark.operators.stl_loess import (
        decomposition_precompute, plot_grade_jump,
    )

    sig = inspect.signature(decomposition_precompute)
    assert sig.parameters["jump"].default == 1
    # n_s=7 → n_t=47 → 47//10 = 4 at the daily-period chart default
    assert plot_grade_jump(24, 7) == 4
    assert plot_grade_jump(4, 7) >= 1
