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
    pats = df.withColumn("_p", pattern).filter(c.isNotNull())
    counts = pats.groupBy(id_col, "_p").agg(F.count(F.lit(1)).alias("cnt"))
    tot = Window.partitionBy(id_col)
    p = F.col("cnt") / F.sum("cnt").over(tot)
    ent = counts.withColumn("_term", -p * F.log(p))
    return ent.groupBy(id_col).agg(
        F.round(F.sum("_term"), 9).alias("perm_entropy")
    )


_TSFEAT_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("hurst_rs", T.DoubleType(), True),
        T.StructField("overdispersion", T.DoubleType(), True),
        T.StructField("lyap_proxy", T.DoubleType(), True),
    ]
)


def ts_features(df: DataFrame, id_col: str, ts_col: str, value_col: str) -> DataFrame:
    """Per-series non-relational feature battery (applyInPandas whole-
    series numpy; reference: eda/ts_features_extension.py:26-195)."""

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
        return pd.DataFrame(
            [(pdf[id_col].iat[0], n, hurst, over, lyap)],
            columns=["series_id", "n", "hurst_rs", "overdispersion", "lyap_proxy"],
        )

    return df.groupBy(id_col).applyInPandas(feats, schema=_TSFEAT_SCHEMA)
