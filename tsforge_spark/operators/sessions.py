"""Sessionization + per-series statistical features.

- ``sessionize``: gap-based session islands (new session when the gap to
  the previous event exceeds a threshold) — the batch twin of streaming
  session windows (SURVEY §2.10), and the natural conversation-boundary
  operator for transcript analytics.  Pure window expressions: lag → gap
  flag → running sum = session id.
- ``acf_exact``: autocorrelation at small fixed lags computed from
  *integer* partial sums (Σc, Σc², Σ c_t·c_{t+k}, head/tail sums) so the
  result is deterministic across engines and parallelism (SURVEY §2.9
  ACF; the FFT path in the reference is a per-series UDF, ours is one
  aggregation pass).
- ``permutation_entropy_m3``: ordinal-pattern entropy over consecutive
  triples (ts-features battery, ``eda/ts_features_extension.py``) — CASE
  classification of the 6 patterns + Shannon entropy, all relational.
- ``ts_features``: the per-series UDF battery for features that are
  genuinely non-relational (Hurst/DFA, longest-streak already covered
  natively) — vectorized numpy per series via applyInPandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(
    df: DataFrame, id_col: str, ts_col: str, gap: str = "30 minutes",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign ``session_id`` (0-based per id) via gap islands."""
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(id_col).orderBy(*order_cols)
    prev = F.lag(ts_col).over(w)
    new_sess = (
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"interval {gap}"))
    ).cast("long")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_id", F.sum(new_sess).over(wc) - 1)


def acf_exact(
    df: DataFrame, id_col: str, ts_col: str, value_col: str, lags: list[int]
) -> DataFrame:
    """ACF_k = Σ(c_t−m)(c_{t+k}−m) / Σ(c_t−m)² with every Σ taken over
    integer columns:

      num_k = S_cross_k − m·(S_head_k + S_tail_k) + (n−k)·m²
      den   = S_sq − n·m²        (m = S/n)

    ``value_col`` must be integral (cents).  One aggregation pass after a
    single per-id window for the leads."""
    w = Window.partitionBy(id_col).orderBy(ts_col)
    c = F.col(value_col)
    with_leads = df
    for k in lags:
        with_leads = with_leads.withColumn(f"_lead{k}", F.lead(value_col, k).over(w))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s"),
        F.sum(c * c).alias("ss"),
    ]
    for k in lags:
        lead = F.col(f"_lead{k}")
        aggs += [
            F.sum(c * lead).alias(f"cross{k}"),
            F.sum(F.when(lead.isNotNull(), c)).alias(f"head{k}"),
            F.sum(lead).alias(f"tail{k}"),
        ]
    a = with_leads.groupBy(id_col).agg(*aggs)
    m = F.col("s") / F.col("n")
    den = F.col("ss") - F.col("n") * m * m
    out_cols = [F.col(id_col), F.col("n")]
    for k in lags:
        num = (
            F.col(f"cross{k}")
            - m * (F.col(f"head{k}") + F.col(f"tail{k}"))
            + (F.col("n") - k) * m * m
        )
        out_cols.append((num / den).alias(f"acf_{k}"))
    return a.select(*out_cols)


def permutation_entropy_m3(
    df: DataFrame, id_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Ordinal-pattern (m=3) permutation entropy, rounded to 9 (ln is
    libm).  Ties broken by position (earlier index ranks lower), matching
    argsort on the window."""
    w = Window.partitionBy(id_col).orderBy(ts_col)
    df = df.withColumn(
        "_b", F.lead(value_col, 1).over(w).cast("double")
    ).withColumn("_c2", F.lead(value_col, 2).over(w).cast("double"))
    a = F.col(value_col).cast("double")
    b = F.col("_b")
    c = F.col("_c2")
    # stable ordinal pattern of (a,b,c): ties rank the earlier position
    # lower, so for a pair (x earlier, y later): x<y' iff x<=y, y<x' iff y<x.
    # The six patterns below are mutually exclusive and exhaustive.
    pattern = (
        F.when((a <= b) & (b <= c), 0)          # a b c
        .when((a <= c) & (c < b), 1)            # a c b
        .when((b < a) & (a <= c), 2)            # b a c
        .when((b <= c) & (c < a), 3)            # b c a
        .when((c < a) & (a <= b), 4)            # c a b
        .otherwise(5)                            # c b a
    )
    # m=3 → exactly 6 patterns, so the whole entropy folds into ONE
    # aggregation with conditional counts (vs the generic per-(id,
    # pattern) rollup + total window + re-aggregate: two fewer plan
    # stages, same result).  Zero-count patterns contribute 0 (the
    # p·ln p limit), matching the generic version where they simply
    # had no row.
    pats = df.withColumn("_p", pattern).filter(c.isNotNull())
    g = pats.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_tot"),
        *[
            F.count(F.when(F.col("_p") == k, 1)).alias(f"_c{k}")
            for k in range(6)
        ],
    )

    def term(k: int):
        p = F.col(f"_c{k}") / F.col("_tot")
        return F.when(F.col(f"_c{k}") > 0, -p * F.log(p)).otherwise(0.0)

    ent = term(0) + term(1) + term(2) + term(3) + term(4) + term(5)
    return g.select(
        id_col, F.round(ent, 9).alias("perm_entropy")
    )


_TSFEAT_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("hurst_rs", T.DoubleType(), True),
        T.StructField("overdispersion", T.DoubleType(), True),
        T.StructField("lyap_proxy", T.DoubleType(), True),
        T.StructField("spectral_entropy", T.DoubleType(), True),
        T.StructField("hurst_dfa", T.DoubleType(), True),
        T.StructField("mi_top_k_lags", T.DoubleType(), True),
        T.StructField("seasonal_strength_m4", T.DoubleType(), True),
        T.StructField("seasonal_strength_m13", T.DoubleType(), True),
        T.StructField("seasonal_strength_m52", T.DoubleType(), True),
        T.StructField("forecastability", T.DoubleType(), True),
    ]
)


def ts_features(
    df: DataFrame, id_col: str, ts_col: str, value_col: str, freq: int = 24
) -> DataFrame:
    """Per-series non-relational feature battery (applyInPandas whole-
    series numpy; reference: eda/ts_features_extension.py:26-195):
    R/S Hurst, overdispersion, Lyapunov proxy, spectral entropy,
    DFA exponent, MI top-k lag concentration, seasonal strength at
    m ∈ {4, 13, 52} (MASE ratios), and Hyndman forecastability
    (perm-entropy(series) / perm-entropy(decomposition residuals))."""

    # All kernel helpers are defined INSIDE this function on purpose:
    # cloudpickle serializes nested functions BY VALUE, so the grouped-map
    # kernel runs on executors that cannot import tsforge_spark (e.g. a
    # harness SparkSession without the package on the worker sys.path).

    def _perm_entropy3(y: np.ndarray) -> float:
        """Ordinal-pattern (m=3) entropy in bits, argsort tiebreak —
        the numpy twin of antropy.perm_entropy(order=3)."""
        if len(y) < 3:
            return np.nan
        win = np.lib.stride_tricks.sliding_window_view(y, 3)
        pats = np.argsort(win, axis=1, kind="stable")
        codes = pats[:, 0] * 9 + pats[:, 1] * 3 + pats[:, 2]
        _, cnt = np.unique(codes, return_counts=True)
        p = cnt / cnt.sum()
        return float(-(p * np.log2(p)).sum())


    def _score_mase(y: np.ndarray, season: int) -> float:
        """mean |y_t − y_{t−season}| (reference score_mase,
        ts_features_extension.py:160-163)."""
        if len(y) <= season:
            return np.nan
        return float(np.mean(np.abs(y[:-season] - y[season:])))


    def _seasonal_strength(mae_seasonal: float, mae_naive: float) -> float:
        """clip(1 − mae_m/mae_1, 0, 1); nan on zero/non-finite naive MAE
        (reference _seasonal_strength, ts_features_extension.py:166-170)."""
        if not np.isfinite(mae_naive) or mae_naive == 0 or not np.isfinite(mae_seasonal):
            return np.nan
        return float(np.clip(1.0 - mae_seasonal / mae_naive, 0.0, 1.0))


    def _spectral_entropy(y: np.ndarray) -> float:
        """Normalized Shannon entropy of the periodogram (numpy twin of
        antropy.spectral_entropy(method='fft', normalize=True),
        reference hyndman-style forecastability inputs)."""
        if len(y) < 8 or np.allclose(y, y[0]):
            return np.nan
        ps = np.abs(np.fft.rfft(y - y.mean())) ** 2
        ps = ps[1:]  # drop DC (zero after de-meaning)
        tot = ps.sum()
        if tot <= 0:
            return np.nan
        p = ps / tot
        p = p[p > 0]
        return float(-(p * np.log2(p)).sum() / np.log2(len(ps)))


    def _dfa(y: np.ndarray) -> float:
        """Detrended fluctuation analysis exponent: slope of
        log F(w) vs log w with order-1 detrending over log-spaced window
        sizes (numpy stand-in for nolds.dfa — reference hurst_exp_dfa,
        ts_features_extension.py:36-37)."""
        n = len(y)
        if n < 32:
            return np.nan
        profile = np.cumsum(y - y.mean())
        sizes = np.unique(
            np.floor(np.exp(np.linspace(np.log(4), np.log(n // 4), 12))).astype(int)
        )
        flucts = []
        for w in sizes:
            m = n // w
            seg = profile[: m * w].reshape(m, w)
            t = np.arange(w, dtype=np.float64)
            tm = t - t.mean()
            denom = (tm * tm).sum()
            slope = (seg * tm).sum(axis=1) / denom
            inter = seg.mean(axis=1)
            resid = seg - (inter[:, None] + slope[:, None] * tm)
            flucts.append(np.sqrt((resid**2).mean()))
        logs = np.log(sizes)
        logf = np.log(np.asarray(flucts))
        good = np.isfinite(logf)
        if good.sum() < 4:
            return np.nan
        return float(np.polyfit(logs[good], logf[good], 1)[0])


    def _hist_mi(x: np.ndarray, ylag: np.ndarray, bins: int = 8) -> float:
        """Histogram mutual information (quantile bins) — a deterministic
        numpy stand-in for sklearn mutual_info_regression (unavailable in
        this environment; reference MI_top_k_lags,
        ts_features_extension.py:75-96)."""
        qs = np.linspace(0, 1, bins + 1)[1:-1]
        bx = np.searchsorted(np.quantile(x, qs), x)
        by = np.searchsorted(np.quantile(ylag, qs), ylag)
        joint = np.zeros((bins, bins))
        np.add.at(joint, (bx, by), 1.0)
        joint /= joint.sum()
        px = joint.sum(axis=1, keepdims=True)
        py = joint.sum(axis=0, keepdims=True)
        nz = joint > 0
        return float((joint[nz] * np.log(joint[nz] / (px @ py)[nz])).sum())


    def _mi_top_k_lags(y: np.ndarray, freq: int = 24, k: int = 5) -> float:
        """Σ(top-k lag MI) / Σ(all lag MI) over lags 1..min(freq, n−1)
        (reference MI_top_k_lags semantics with the histogram estimator)."""
        max_lag = min(freq, len(y) - 1)
        if max_lag < 1 or len(y) - max_lag < 16:
            return np.nan
        target = y[max_lag:]
        scores = np.array(
            [
                _hist_mi(y[max_lag - lag: len(y) - lag], target)
                for lag in range(1, max_lag + 1)
            ]
        )
        tot = scores.sum()
        if tot <= 0:
            return np.nan
        top = np.sort(scores)[::-1][: min(k, len(scores))]
        return float(top.sum() / tot)


    def _classical_resid(y: np.ndarray, period: int = 24) -> np.ndarray:
        """Interior residuals of a classical additive decomposition (numpy
        twin of operators/decompose.classical_decompose) for the
        forecastability ratio."""
        n = len(y)
        half = period // 2
        if n < 2 * period + 1:
            return np.array([])
        kern = np.full(period + 1, 1.0 / period)
        kern[0] = kern[-1] = 0.5 / period
        trend = np.convolve(y, kern, mode="valid")  # length n - period
        interior = slice(half, n - half)
        detr = y[interior] - trend
        phase = (np.arange(n) % period)[interior]
        means = np.full(period, np.nan)
        for p in range(period):
            sel = phase == p
            if sel.any():
                means[p] = detr[sel].mean()
        means -= np.nanmean(means)
        return detr - means[phase]

    def feats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        y = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(y)
        mean = y.mean() if n else np.nan
        var = y.var() if n else np.nan
        over = var / mean if mean else np.nan
        hurst = np.nan
        if n >= 16:
            z = y - mean
            cum = np.cumsum(z)
            r = cum.max() - cum.min()
            s = y.std()
            if s > 0 and r > 0:
                hurst = np.log(r / s) / np.log(n)
        lyap = np.nan
        if n >= 3:
            d = np.abs(np.diff(y))
            nz = d[d > 0]
            lyap = float(np.log(nz).mean()) if len(nz) else np.nan
        mae1 = _score_mase(y, 1)
        strengths = [
            _seasonal_strength(_score_mase(y, m), mae1) for m in (4, 13, 52)
        ]
        resid = _classical_resid(y, freq)
        pe_y = _perm_entropy3(y)
        pe_r = _perm_entropy3(resid) if len(resid) >= 3 else np.nan
        fc = pe_y / pe_r if pe_r and np.isfinite(pe_r) else np.nan
        return pd.DataFrame(
            [
                (
                    pdf[id_col].iat[0], n, hurst, over, lyap,
                    _spectral_entropy(y), _dfa(y),
                    _mi_top_k_lags(y, freq), *strengths, fc,
                )
            ],
            columns=[f.name for f in _TSFEAT_SCHEMA.fields],
        )

    from tsforge_spark.operators.partitioning import kernel_repartition

    # pin kernel-stage parallelism (see operators/partitioning.py —
    # AQE's bytes-based coalescing serializes small-bytes kernel fleets)
    return (
        kernel_repartition(df, id_col)
        .groupBy(id_col)
        .applyInPandas(feats, schema=_TSFEAT_SCHEMA)
    )


def hierarchical_ts_features(
    df: DataFrame,
    level_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "1h",
    freq: int = 24,
) -> DataFrame:
    """Per-level ts-feature battery (reference hierarchical_tsfeatures,
    eda/diagnostics.py:82-130): for each hierarchy level, aggregate the
    target to (level value, time bucket) series, run ``ts_features``,
    and union the results tagged with the level name.  One aggregate +
    one grouped-map kernel per level — each level's series table is far
    smaller than the base data, so the lattice costs less than one extra
    base scan."""
    from tsforge_spark.operators.rollup import bucket_expr

    out = None
    for level in level_cols:
        series = df.groupBy(
            F.col(level).cast("string").alias("_series_id"),
            bucket_expr(ts_col, bucket).alias("_bucket"),
        ).agg(F.sum(value_col).alias("_v"))
        feats = ts_features(series, "_series_id", "_bucket", "_v", freq=freq)
        feats = feats.withColumnRenamed("series_id", "hier_id").withColumn(
            "level", F.lit(level)
        )
        out = feats if out is None else out.unionByName(feats)
    return out
