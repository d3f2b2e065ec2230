"""LOESS-based STL decomposition (Cleveland et al. 1990) — the full
seasonal-trend-loess procedure the reference delegates to statsmodels
(``/root/reference/src/tsforge/plots/charts/plot_decomposition.py:23-97``).

statsmodels is absent in this environment, so the procedure is
implemented here from the published algorithm: cycle-subseries loess
smoothing → low-pass (p-MA × 2, 3-MA, loess) → seasonal; loess trend of
the deseasonalized series; optional outer robustness iterations with
bisquare weights.  ``classical_decompose`` (operators/decompose.py)
remains the oracle-checkable relational variant; this module is the
per-series kernel for users who need loess smoothing specifically.

Execution model: loess is sequential per series by nature, so the Spark
surface is a grouped ``applyInPandas`` kernel — one Arrow batch per
series group, whole-series numpy inside (no per-row Python).  The loess
itself is vectorized: on the regular integer grid every neighborhood is
a contiguous window, so all point fits happen in one batched
closed-form weighted-linear-regression pass over strided windows.

Deviations from statsmodels' STL (documented, deliberate):
- evaluation grid is the regular sample index (STL's original setting;
  our tier grids are regular by construction — gapfill first);
- low-pass loess span = smallest odd ≥ period (the paper's n_l).

Jump/skip (Cleveland §3.3's n_jump speedup) IS implemented: pass
``n_jump > 1`` to fit every k-th grid point and linearly interpolate
between fits — identical to statsmodels' ``seasonal_jump`` /
``trend_jump`` / ``low_pass_jump``.  Defaults are 1 (exact dense fit,
the tested-exact path); ``stl_loess(..., jump=k)`` applies the skip to
the long-series smoothers (trend + low-pass) where the work lives,
leaving the short cycle-subseries fits dense.
"""

from __future__ import annotations

import numpy as np


def _odd_at_least(n: int) -> int:
    n = max(int(n), 3)
    return n if n % 2 == 1 else n + 1


def loess_smooth(
    y: np.ndarray,
    span: int,
    rho: np.ndarray | None = None,
    n_jump: int = 1,
) -> np.ndarray:
    """Degree-1 loess over the regular grid x = 0..n-1, evaluated at
    every grid point.

    ``span`` = q nearest neighbours (clamped to n).  On a regular grid
    the q-neighbourhood of point i is the contiguous window starting at
    ``clip(i - q//2, 0, n - q)``, so every local weighted linear fit is
    solved in closed form over strided windows — one vectorized pass,
    no per-point Python loop.  ``rho``: optional robustness weights
    (multiplied into the tricube weights).

    ``n_jump`` > 1 fits only every n_jump-th grid point (plus the last)
    and linearly interpolates between fits — Cleveland 1990 §3.3's
    standard speedup, the same knob statsmodels exposes as
    ``*_jump``.  n_jump=1 is the exact dense fit.

    ``y`` may be 2-D ``(k, n)``: k independent same-length series
    smoothed in ONE vectorized pass (the cycle-subseries batcher in
    ``stl_loess`` relies on this — p separate calls on ~n/p-point
    subseries are pure numpy-dispatch overhead).  ``rho`` then has the
    same shape.  Row r of the output equals ``loess_smooth(y[r], span,
    rho[r])`` exactly (every reduction is per-row along the last axis).

    Exactness property used by tests: a degree-1 weighted fit
    reproduces any affine series exactly, independent of the weights
    (and linear interpolation preserves affinity, so this holds for
    every n_jump).
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[-1]
    if n == 0:
        return y.copy()
    q = min(max(int(span), 2), n)
    if n_jump > 1 and n > 2:
        pts = np.arange(0, n, int(n_jump))
        if pts[-1] != n - 1:
            pts = np.append(pts, n - 1)
    else:
        pts = np.arange(n)
    starts = np.clip(pts - (q - 1) // 2, 0, n - q)
    # windowed views: rows i -> y[starts[i] : starts[i]+q]
    idx = starts[:, None] + np.arange(q)[None, :]
    yw = y[..., idx]
    xw = idx.astype(np.float64)
    x0 = pts.astype(np.float64)[:, None]
    d = np.abs(xw - x0)
    dmax = d.max(axis=1, keepdims=True)
    # tricube over distance/dmax; dmax==0 only when q covers one point
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.where(dmax > 0, d / dmax, 0.0)
    w = np.clip(1.0 - u**3, 0.0, None) ** 3
    # the farthest point gets weight 0; guard the all-zero row (q=2)
    if rho is not None:
        w = w * np.asarray(rho, dtype=np.float64)[..., idx]
    elif y.ndim > 1:
        w = np.broadcast_to(w, yw.shape)
    wsum = w.sum(axis=-1)
    degenerate = wsum <= 0
    if degenerate.any():
        w = np.array(w)
        w[degenerate] = 1.0
        wsum = w.sum(axis=-1)
    # closed-form weighted linear fit per row, evaluated at x0
    xc = xw - x0  # center at the eval point: prediction = intercept
    s0 = wsum
    s1 = (w * xc).sum(axis=-1)
    s2 = (w * xc * xc).sum(axis=-1)
    sy = (w * yw).sum(axis=-1)
    sxy = (w * xc * yw).sum(axis=-1)
    det = s0 * s2 - s1 * s1
    # fall back to weighted mean where the design is singular
    with np.errstate(divide="ignore", invalid="ignore"):
        beta0 = np.where(
            np.abs(det) > 1e-12 * np.maximum(s0 * s2, 1e-300),
            (s2 * sy - s1 * sxy) / det,
            sy / s0,
        )
    if len(pts) != n:
        grid = np.arange(n, dtype=np.float64)
        if beta0.ndim == 1:
            return np.interp(grid, pts, beta0)
        return np.stack([np.interp(grid, pts, row) for row in beta0])
    return beta0


def _ma(y: np.ndarray, k: int) -> np.ndarray:
    """Centered moving average of window k; output length len(y)-k+1."""
    c = np.cumsum(np.concatenate(([0.0], y)))
    return (c[k:] - c[:-k]) / k


def stl_loess(
    y: np.ndarray,
    period: int,
    seasonal: int = 7,
    trend: int | None = None,
    inner: int = 2,
    outer: int = 0,
    jump: int = 1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full STL: returns (trend, seasonal, resid) with
    y == trend + seasonal + resid exactly (resid is the closure).

    ``seasonal``: loess span for the cycle-subseries smoother (n_s,
    odd; the paper's recommended ≥ 7).  ``trend``: n_t, default the
    paper's smallest odd ≥ 1.5·p / (1 − 1.5/n_s).  ``outer`` > 0 adds
    robustness iterations with bisquare weights.  ``jump`` > 1 applies
    Cleveland's n_jump skip to the two length-n smoothers (trend +
    low-pass): fit every jump-th point, interpolate between — the
    cycle-subseries fits stay dense (length n/p, nothing to save)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    p = int(period)
    if n < 2 * p:
        raise ValueError("series shorter than two periods")
    n_s = _odd_at_least(seasonal)
    n_t = _odd_at_least(
        trend if trend is not None else int(np.ceil(1.5 * p / (1 - 1.5 / n_s)))
    )
    n_l = _odd_at_least(p)

    T = np.zeros(n)
    S = np.zeros(n)
    rho = np.ones(n)
    # cycle-subseries layout: detr[k::p] for k in 0..p-1 are the p
    # subseries; pad to a full (rows, p) matrix and transpose so ALL
    # of them smooth in one (or two) batched loess_smooth calls — the
    # p-call loop was pure numpy-dispatch overhead (the subseries are
    # ~n/p points each).  rem subseries have nshort+1 points, the rest
    # nshort; the two length groups batch separately (the q-clamp and
    # window geometry depend on the length).
    nshort, rem = divmod(n, p)
    mrows = nshort + (1 if rem else 0)
    pad = mrows * p - n

    def _pad_mat(v: np.ndarray) -> np.ndarray:
        return np.pad(v, (0, pad), constant_values=np.nan).reshape(
            mrows, p
        ).T

    for _o in range(outer + 1):
        # rho changes only per OUTER iteration — reshape once per pass
        rho_mat = _pad_mat(rho)
        for _i in range(inner):
            detr = y - T
            # 1. cycle-subseries loess, extended one period each side.
            # Boundary extension: one position at each end via the edge
            # slope of the two boundary smoothed values (the standard
            # practical extension).
            sub_mat = _pad_mat(detr)  # row k = detr[k::p] (+NaN pad)
            W = nshort + (3 if rem else 2)
            E = np.full((p, W), np.nan)
            if rem:
                sm_l = loess_smooth(sub_mat[:rem], n_s, rho_mat[:rem])
                E[:rem, 0] = sm_l[:, 0] - (sm_l[:, 1] - sm_l[:, 0])
                E[:rem, 1 : mrows + 1] = sm_l
                E[:rem, mrows + 1] = sm_l[:, -1] + (
                    sm_l[:, -1] - sm_l[:, -2]
                )
            if nshort:
                sm_s = loess_smooth(
                    sub_mat[rem:, :nshort], n_s, rho_mat[rem:, :nshort]
                )
                E[rem:, 0] = sm_s[:, 0] - (sm_s[:, 1] - sm_s[:, 0])
                E[rem:, 1 : nshort + 1] = sm_s
                E[rem:, nshort + 1] = sm_s[:, -1] + (
                    sm_s[:, -1] - sm_s[:, -2]
                )
            # write back: C[j*p + k] = E[k, j]
            C = E.T.ravel()[: n + 2 * p]
            # 2. low-pass: MA(p) x2 then MA(3) then loess(n_l)
            L = _ma(_ma(_ma(C, p), p), 3)
            L = loess_smooth(L, n_l, n_jump=jump)
            # lengths: C: n+2p -> MA(p): n+p+1 -> MA(p): n+2 -> MA(3): n
            S = C[p : n + p] - L
            # 3. trend loess of the deseasonalized series
            T = loess_smooth(y - S, n_t, rho, n_jump=jump)
        R = y - T - S
        if _o < outer:
            # bisquare robustness weights from |R|
            h = 6.0 * np.median(np.abs(R))
            if h <= 0:
                rho = np.ones(n)
            else:
                u = np.clip(np.abs(R) / h, 0.0, 1.0)
                rho = (1.0 - u**2) ** 2
    return T, S, y - T - S


def stl_decompose_loess(
    df,
    id_col: str,
    ts_col: str,
    value_col: str,
    period: int = 24,
    seasonal: int = 7,
    trend: int | None = None,
    outer: int = 0,
    jump: int = 1,
):
    """Spark surface: grouped ``applyInPandas`` STL per series.

    Input must be on a regular grid per series (gapfill first — the
    engine's gapfill operators produce exactly that).  Returns the
    input grain + (trend, seasonal, resid).  One Arrow batch per
    series; the kernel is whole-series numpy (loess windows batched —
    no per-row Python)."""
    import pandas as pd
    from pyspark.sql import types as T_

    out_schema = T_.StructType(
        [
            T_.StructField(id_col, df.schema[id_col].dataType, False),
            T_.StructField(ts_col, df.schema[ts_col].dataType, False),
            T_.StructField("value", T_.DoubleType(), True),
            T_.StructField("trend", T_.DoubleType(), True),
            T_.StructField("seasonal", T_.DoubleType(), True),
            T_.StructField("resid", T_.DoubleType(), True),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        yv = pdf[value_col].to_numpy(dtype=np.float64)
        if len(yv) < 2 * period:
            t = s = r = np.full(len(yv), np.nan)
        else:
            t, s, r = stl_loess(
                yv, period, seasonal=seasonal, trend=trend, outer=outer,
                jump=jump,
            )
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                ts_col: pdf[ts_col].to_numpy(),
                "value": yv,
                "trend": t,
                "seasonal": s,
                "resid": r,
            }
        )

    sdf = df.select(id_col, ts_col, value_col)
    # Explicit partitioning for the kernel stage: AQE coalesces
    # shuffles by BYTES, which is the wrong objective for a CPU-bound
    # per-group Python kernel — on a small-bytes input it folds ALL
    # series into ONE task and the whole decomposition runs serially
    # (measured: 12s for 1000 series vs ~0.5s parallel).  A plain
    # kernel_repartition (operators/partitioning.py) pins the kernel
    # stage's parallelism against both the static planner's redundant-
    # repartition removal and AQE's bytes-based coalescing.
    from tsforge_spark.operators.partitioning import kernel_repartition

    return (
        kernel_repartition(sdf, id_col)
        .groupBy(id_col)
        .applyInPandas(kernel, schema=out_schema)
    )


def plot_grade_jump(period: int, seasonal: int = 7) -> int:
    """Cleveland §3.3's plot-grade loess skip: n_t (the trend span,
    derived from ``period``/``seasonal`` exactly as stl_loess does)
    // 10.  Pass the result as ``jump=`` to
    :func:`decomposition_precompute` when approximated (linearly
    interpolated between anchor fits) trend/seasonal is acceptable —
    e.g. chart pre-compute — for ~n_t/10× fewer kernel fits."""
    n_s = _odd_at_least(seasonal)
    n_t = _odd_at_least(int(np.ceil(1.5 * period / (1 - 1.5 / n_s))))
    return max(1, n_t // 10)


def decomposition_precompute(
    df,
    id_col: str,
    ts_col: str,
    value_col: str,
    freq: str = "1h",
    period: int = 24,
    top_k: int = 3,
    seasonal: int = 7,
    outer: int = 0,
    jump: int = 1,
):
    """Loess-decomposition plot pre-compute — the consumer path that
    mirrors how the reference feeds its STL into the decomposition
    chart (plots/charts/plot_decomposition.py:23-97): pick the top_k
    series by total value, zero-fill each onto its regular ``freq``
    grid, run the full Cleveland-1990 loess STL per series, and return
    the long component frame a faceted plot consumes: (id, bucket,
    component ∈ {value, trend, seasonal, resid}, y).

    Scale shape: the top-k id set broadcasts (k rows); the bucket
    rollup and the grouped STL kernel are the only shuffles (both on
    ``id_col``); ``stack`` multiplies rows map-side, after the kernel,
    so no component-wise re-shuffle.

    ``jump`` defaults to 1 — the exact dense fit, matching
    statsmodels' STL whose ``*_jump`` defaults are all 1 (which is
    what the reference's plot_decomposition.py gets).  Pass
    ``jump=plot_grade_jump(period, seasonal)`` (Cleveland §3.3's
    n_t//10 skip) explicitly when plot-grade output is enough and you
    want the ~10× kernel speedup; callers must opt in so exact and
    approximated outputs are never silently swapped."""
    from pyspark.sql import functions as F

    from tsforge_spark.operators.gapfill import complete_grid
    from tsforge_spark.operators.rollup import bucket_expr

    bucketed = df.groupBy(
        F.col(id_col), bucket_expr(ts_col, freq).alias("bucket")
    ).agg(F.sum(value_col).alias("_v"))
    totals = bucketed.groupBy(id_col).agg(F.sum("_v").alias("_tot"))
    top = totals.orderBy(F.desc("_tot"), F.asc(id_col)).limit(top_k)
    sel = bucketed.join(F.broadcast(top.select(id_col)), id_col)
    grid = complete_grid(sel, id_col, "bucket", freq)
    filled = grid.join(sel, [id_col, "bucket"], "left").select(
        id_col, "bucket", F.coalesce("_v", F.lit(0.0)).alias("value")
    )
    comp = stl_decompose_loess(
        filled, id_col, "bucket", "value",
        period=period, seasonal=seasonal, outer=outer, jump=jump,
    )
    return comp.select(
        F.col(id_col),
        "bucket",
        F.expr(
            "stack(4, 'value', value, 'trend', trend, "
            "'seasonal', seasonal, 'resid', resid) AS (component, y)"
        ),
    )
