"""Seasonal decomposition + deseasonalize guard.

Reference surface: STL decomposition
(``/root/reference/src/tsforge/plots/charts/plot_decomposition.py:23-97``)
and the deseasonalize-if-ok guard
(``/root/reference/src/tsforge/workflows/nixtla_demo.py:410-433``).

statsmodels is not available in this environment, and STL's inner-loop
loess is inherently sequential per series anyway.  The engine therefore
implements **classical additive decomposition** (centered moving-average
trend → seasonal means of the detrended series → residual), which is the
textbook deterministic special case STL generalizes:

- trend: 2×period centered MA (for even ``period`` the standard
  half-weighted ends), defined only where the full ±period/2 window
  exists;
- seasonal: per-phase mean of the detrended series, centered to sum to
  zero over one cycle;
- resid = value − trend − seasonal on interior rows.

Everything is column expressions over integer-cents partials, so results
are bit-identical across engines and parallelism (SURVEY §7.4.1):
with ``d48 = 48·c − (2·Σ_{−(p/2−1)..(p/2−1)} c + c_{−p/2} + c_{+p/2})``
all trend/detrended quantities stay integral until one final double
division.  The per-series phase-mean centering sums the (at most
``period``) phase means in a deterministic phase order via an ordered
array fold — the one place a float sum happens, in a fixed order on both
engines.

Deviations from the reference (documented, deliberate):
- THIS module is classical decomposition (deterministic +
  oracle-checkable, pure column expressions); the full loess-based STL
  the reference delegates to statsmodels is implemented from the
  Cleveland et al. 1990 algorithm in ``operators/stl_loess.py`` as a
  grouped vectorized-numpy kernel (loess is sequential per series, so
  applyInPandas is the right execution shape) — use that when loess
  smoothing specifically is needed;
- the guard's ADF stationarity test is the closed-form ADF-lite below
  (no statsmodels) alongside the length / ADI / CV gates of
  ``_deseasonalize_if_ok``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classical_decompose(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    cents_col: str,
    period: int = 24,
    phase_expr=None,
) -> DataFrame:
    """Classical additive decomposition of an integer-cents series.

    ``phase_expr``: expression for the seasonal phase of a row (default
    ``hour(ts)`` for period=24 hourly data).  Returns the input grain
    with ``value`` (dollars), ``trend``, ``seasonal``, ``resid`` —
    trend/resid null on the ``period/2`` edge rows, seasonal null for
    series too short to have any interior row.
    """
    half = period // 2
    if phase_expr is None:
        phase_expr = F.hour(F.col(ts_col))
    w = Window.partitionBy(id_col).orderBy(ts_col)
    c = F.col(cents_col)
    s_inner = F.sum(cents_col).over(w.rowsBetween(-(half - 1), half - 1))
    n_full = F.count(F.lit(1)).over(w.rowsBetween(-half, half))
    c_lo = F.lag(cents_col, half).over(w)
    c_hi = F.lead(cents_col, half).over(w)
    # 2×period MA ×(2·period): stays integral
    trend_x2p = F.when(
        n_full == 2 * half + 1, 2 * s_inner + c_lo + c_hi
    )
    d_scaled = F.when(trend_x2p.isNotNull(), 2 * period * c - trend_x2p)
    base = df.select(
        F.col(id_col),
        F.col(ts_col),
        c.alias("_c"),
        phase_expr.alias("_phase"),
        trend_x2p.alias("_trend_sc"),
        d_scaled.alias("_d_sc"),
    )
    scale = float(2 * period * 100)  # scaled-cents → dollars

    # per-(id, phase) detrended means from integer partials
    ph = (
        base.filter(F.col("_d_sc").isNotNull())
        .groupBy(id_col, "_phase")
        .agg(F.sum("_d_sc").alias("_sd"), F.count(F.lit(1)).alias("_n"))
        .withColumn("_m", (F.col("_sd") / F.col("_n")) / F.lit(scale))
    )
    # center phase means to zero mean, folding in deterministic phase
    # order (the single ordered float sum — identical on both engines)
    cent = ph.groupBy(id_col).agg(
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_phase", "_m"))),
                    lambda x: x["_m"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count(F.lit(1))
        ).alias("_mbar")
    )
    seasonal = ph.join(cent, id_col).select(
        F.col(id_col),
        F.col("_phase"),
        (F.col("_m") - F.col("_mbar")).alias("seasonal"),
    )
    out = base.join(seasonal, [id_col, "_phase"], "left")
    return out.select(
        F.col(id_col),
        F.col(ts_col),
        (F.col("_c") / 100.0).alias("value"),
        (F.col("_trend_sc") / F.lit(scale)).alias("trend"),
        F.col("seasonal"),
        F.when(
            F.col("_d_sc").isNotNull(),
            F.col("_d_sc") / F.lit(scale) - F.col("seasonal"),
        ).alias("resid"),
    )


def seasonal_strength(decomposed: DataFrame, id_col: str) -> DataFrame:
    """Per-series STL-style seasonal strength
    ``max(0, 1 − var(resid)/var(seasonal+resid))`` (Hyndman & Athanasopoulos
    FPP3 §4.3) from a ``classical_decompose`` result.  Variances use the
    same deterministic partial-sums form as the rest of the engine —
    but over doubles, so this is reproducible (fixed plan) rather than
    bitwise-portable; the catalog exposes it via a pandas-oracle test."""
    r, s = F.col("resid"), F.col("resid") + F.col("seasonal")
    agg = decomposed.filter(r.isNotNull()).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r).alias("sr"),
        F.sum(r * r).alias("srr"),
        F.sum(s).alias("ss"),
        F.sum(s * s).alias("sss"),
    )
    n = F.col("n")
    var_r = (F.col("srr") - F.col("sr") * F.col("sr") / n) / n
    var_s = (F.col("sss") - F.col("ss") * F.col("ss") / n) / n
    return agg.select(
        F.col(id_col),
        "n",
        F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_s).alias(
            "seasonal_strength"
        ),
    )


def deseasonalize_guard(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    cents_col: str,
    period: int = 24,
    adf_crit: float = -2.86,
) -> DataFrame:
    """Gated deseasonalization (``nixtla_demo.py:410-433``): subtract the
    seasonal component only for series that pass the guards —
    ``n ≥ 2·period``, ADI < 1.3, stationarity, CV < 1.5.

    The stationarity gate is an ADF-LITE: the reference calls
    ``adfuller(x, autolag='AIC')`` (``nixtla_demo.py:418-424``);
    statsmodels is absent here, so we run the Dickey–Fuller regression
    Δy_t = α + γ·y_{t−1} + ε in CLOSED FORM from windowed sums (one lag
    pass + the same groupBy — no UDF, no extra shuffle) and compare the
    t-statistic of γ against the 5% τ_μ critical value ≈ −2.86
    (Fuller 1976, constant-only, large n; −2.89 at n=100 — the fixed
    asymptotic value is the documented deviation from autolag AIC,
    alongside the absent augmentation lags).  Degenerate regressions
    (constant series, < 8 usable diffs) fail the gate, matching the
    reference's except→p=1.0 path.

    Known power caveat (shared, in milder form, by the reference's
    short-maxlag adfuller): the UNAUGMENTED regression has low power
    against strongly seasonal stationary series — a dominant
    deterministic cycle leaves serial structure in Δy that the single
    regressor can't absorb, pushing t toward 0 and gating such series
    out conservatively (they keep their raw values; nothing is
    corrupted).  Noise-dominated stationary series reject decisively
    (t ≪ −2.86 in the pytest fixtures).

    Returns the input grain + ``deseasonalized`` (== value where gated
    out) and a per-series ``deseason_ok`` flag."""
    from pyspark.sql import Window

    c = F.col(cents_col)
    w = Window.partitionBy(id_col).orderBy(ts_col)
    lagged = df.withColumn("_x", F.lag(cents_col).over(w)).withColumn(
        "_dy", c - F.col("_x")
    )
    x, dy = F.col("_x"), F.col("_dy")
    gates = lagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum((c > 0).cast("long")).alias("_nz"),
        F.sum(c).alias("_s"),
        F.sum(c * c).alias("_ss"),
        # Dickey–Fuller regression sums over rows with a defined diff
        F.count(dy).alias("_m"),
        F.sum(F.when(dy.isNotNull(), x)).alias("_sx"),
        F.sum(F.when(dy.isNotNull(), x * x)).alias("_sxx"),
        F.sum(dy).alias("_sd"),
        F.sum(dy * dy).alias("_sdd"),
        F.sum(x * dy).alias("_sxd"),
    )
    n, nz = F.col("_n"), F.col("_nz")
    mu = F.col("_s") / n
    sd = F.sqrt((F.col("_ss") - F.col("_s") * F.col("_s") / n) / n)
    adi = F.when(nz > 0, n / nz).otherwise(F.lit(float("inf")))
    cv = F.when(mu != 0, sd / mu).otherwise(F.lit(float("inf")))
    m = F.col("_m").cast("double")
    sxx_c = F.col("_sxx") - F.col("_sx") * F.col("_sx") / m
    sxd_c = F.col("_sxd") - F.col("_sx") * F.col("_sd") / m
    sdd_c = F.col("_sdd") - F.col("_sd") * F.col("_sd") / m
    gamma = sxd_c / sxx_c
    sse = sdd_c - sxd_c * sxd_c / sxx_c
    se = F.sqrt(sse / (m - 2) / sxx_c)
    t_stat = gamma / se
    stationary = (
        (F.col("_m") >= 8) & (sxx_c > 0) & (sse > 0)
        & (t_stat < F.lit(adf_crit))
    )
    ok = (n >= 2 * period) & (adi < 1.3) & stationary & (cv < 1.5)
    gates = gates.select(F.col(id_col), ok.alias("deseason_ok"))
    dec = classical_decompose(df, id_col, ts_col, cents_col, period)
    out = dec.join(gates, id_col)
    return out.withColumn(
        "deseasonalized",
        F.when(
            F.col("deseason_ok") & F.col("seasonal").isNotNull(),
            F.col("value") - F.col("seasonal"),
        ).otherwise(F.col("value")),
    )
