"""Per-series diagnostics (SURVEY.md §2.4) — the reference's
``datetime_diagnostics`` / panel checks as single-pass aggregations.

Reference: ``src/tsforge/eda/diagnostics.py:163-265`` (span stats, delta
stats, gap counts, seasonal-period classification, peak month argmax),
``eda/check_panel.py:30-38`` (dup / missing-date checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsforge_spark.operators.features import ts_delta


def series_diagnostics(
    df: DataFrame, id_col: str, ts_col: str, freq_seconds: int | None = None
) -> DataFrame:
    """Per-series: start/end/n_obs (+ delta stats; + expected/missing obs
    when ``freq_seconds`` given — ``diagnostics.py:163-223``)."""
    delta = ts_delta(df, ts_col, id_col, [ts_col])
    with_d = df.withColumn("_delta_s", delta)
    aggs = [
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.count(F.lit(1)).alias("n_obs"),
        F.avg("_delta_s").alias("delta_mean_s"),
        F.expr("percentile(_delta_s, 0.5)").alias("delta_median_s"),
        F.stddev_samp("_delta_s").alias("delta_std_s"),
    ]
    out = with_d.groupBy(id_col).agg(*aggs)
    if freq_seconds:
        span_s = (
            F.unix_micros(F.col("end_ts")) - F.unix_micros(F.col("start_ts"))
        ) / 1e6
        expected = (span_s / freq_seconds).cast("long") + 1
        out = out.withColumn("expected_obs", expected).withColumn(
            "missing_obs", expected - F.col("n_obs")
        )
    return out


def detect_covariates(
    df: DataFrame, id_col: str, exclude: list[str] | None = None
) -> tuple[list[str], list[str]]:
    """Static vs dynamic covariate auto-detection
    (``eda/check_model_readiness.py:97-105``): a column is static when
    every id has ≤1 distinct value (nulls count as a value, matching the
    reference's ``nunique(dropna=False)``).  ONE aggregation pass for
    all candidate columns — per-id distinct counts, then a global max."""
    exclude = set(exclude or [])
    cands = [c for c in df.columns if c != id_col and c not in exclude]
    if not cands:
        return [], []
    per_id = df.groupBy(id_col).agg(
        *[
            F.count_distinct(F.coalesce(F.col(c).cast("string"), F.lit("\0null")))
            .alias(c)
            for c in cands
        ]
    )
    row = per_id.agg(*[F.max(c).alias(c) for c in cands]).collect()[0]
    static = [c for c in cands if (row[c] or 0) <= 1]
    dynamic = [c for c in cands if c not in static]
    return static, dynamic


def check_panel(
    df: DataFrame, id_col: str, ts_col: str, freq: str = "1d"
) -> dict:
    """Panel readiness triage (``eda/check_panel.py:3-56``): duplicate
    (id, ts) rows, continuity gaps vs each series' own dense grid,
    series/row counts, and the same warning strings — two aggregation
    jobs total."""
    from tsforge_spark.operators.gapfill import complete_grid

    dups = int(
        duplicate_keys(df, [id_col, ts_col])
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)))
        .collect()[0][0]
    )
    grid = complete_grid(df.select(id_col, ts_col), id_col, ts_col, freq)
    stats = (
        grid.join(df.select(id_col, ts_col).distinct(), [id_col, ts_col], "left_anti")
        .agg(F.count(F.lit(1)).alias("gaps"))
        .collect()[0]
    )
    meta = df.agg(
        F.count_distinct(id_col).alias("n_series"),
        F.count(F.lit(1)).alias("n_obs"),
    ).collect()[0]
    report = {
        "duplicate_rows": dups,
        "continuity_gaps": int(stats["gaps"]),
        "n_series": int(meta["n_series"]),
        "n_obs": int(meta["n_obs"]),
        "date_dtype": df.schema[ts_col].dataType.simpleString(),
        "warnings": [],
    }
    if report["duplicate_rows"]:
        report["warnings"].append(
            f"found {report['duplicate_rows']} duplicate id+date rows"
        )
    if report["continuity_gaps"]:
        report["warnings"].append(
            f"found {report['continuity_gaps']} missing dates across series"
        )
    if not report["date_dtype"].startswith("timestamp") and report[
        "date_dtype"
    ] != "date":
        report["warnings"].append("date column is not a time type")
    return report


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Duplicate (id, ts) detection (``check_panel.py:30-31``)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def peak_period(
    df: DataFrame, id_col: str, ts_col: str, value_col: str, unit: str = "month"
) -> DataFrame:
    """Peak month/quarter per series: mean by (id, unit) → argmax via
    row_number (``diagnostics.py:250-265``).  Deterministic tiebreak on
    the unit value."""
    unit_fn = {"month": F.month, "quarter": F.quarter, "hour": F.hour}[unit]
    per = (
        df.withColumn("_u", unit_fn(F.col(ts_col)))
        .groupBy(id_col, "_u")
        .agg(F.avg(value_col).alias("_avg"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_avg"), F.asc("_u"))
    return (
        per.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("_u").alias(f"peak_{unit}"),
            F.col("_avg").alias(f"peak_{unit}_avg"),
        )
    )


def missing_buckets(
    df: DataFrame, id_col: str, ts_col: str, freq: str
) -> DataFrame:
    """Expected − observed buckets via grid anti-join
    (``check_panel.py:35-38`` → SURVEY.md §2.7 except/difference)."""
    from tsforge_spark.operators.gapfill import complete_grid

    observed = df.select(id_col, ts_col).distinct()
    grid = complete_grid(observed, id_col, ts_col, freq)
    return grid.join(observed, [id_col, ts_col], "left_anti")


def red_flags_battery(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    value_col: str,
    ms: tuple[int, ...] = (4, 13, 52),
    horizon: int = 30,
) -> DataFrame:
    """SQL-expressible ts-feature battery: seasonal strengths at lag m
    (MASE ratios — reference ``eda/ts_features_extension.py:160-170``)
    plus the red-flag checks (reference ``eda/check_red_flags.py:22-50``:
    %|z|>3 outliers > 2%, pct_zeros > 30%, first-half vs second-half
    mean shift > 50%, short history < 2*horizon, constant variance).

    Expects an integer-valued, densely-gridded ``value_col`` so every
    partial aggregates exactly as BIGINT (the DuckDB oracle in
    catalog_ts mirrors the double chains op-for-op).  One ordered window
    pass + one groupBy on the same key = a single shuffle; window state
    is bounded by series length, not data volume, so the plan holds at
    100 TB (per-series rows stay co-partitioned end-to-end)."""
    w = Window.partitionBy(id_col).orderBy(ts_col)
    wall = Window.partitionBy(id_col)
    c = F.col(value_col)
    n_tot = F.count(F.lit(1)).over(wall)
    s_tot = F.sum(value_col).over(wall)
    ss_tot = F.sum(c * c).over(wall)
    mean = s_tot / n_tot
    var = ss_tot / n_tot - mean * mean
    is_out = (
        (n_tot > 2) & (var > 0) & (F.abs(c - mean) > F.lit(3.0) * F.sqrt(var))
    )
    pos = F.row_number().over(w)
    first_half = pos <= (n_tot / F.lit(2)).cast("long")
    lags = (1, *ms)
    rowed = df.select(
        id_col,
        c.alias("_c"),
        *[
            F.abs(c - F.lag(value_col, m).over(w)).alias(f"_d{m}")
            for m in lags
        ],
        F.when(is_out, 1).otherwise(0).alias("_is_out"),
        F.when(first_half, c).alias("_c_first"),
    )
    cc = F.col("_c")
    agg = rowed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"_d{m}").alias(f"_s{m}") for m in lags],
        *[F.count(f"_d{m}").alias(f"_k{m}") for m in lags],
        F.sum("_is_out").alias("_n_out"),
        F.sum(F.when(cc == 0, 1).otherwise(0)).alias("_n_zero"),
        F.sum("_c_first").alias("_s_first"),
        F.count("_c_first").alias("_k_first"),
        F.sum("_c").alias("_s_all"),
        F.sum(cc * cc).alias("_ss_all"),
    )
    mae1 = F.col("_s1") / F.col("_k1")
    mean_a = F.col("_s_all") / F.col("n")
    var_a = F.col("_ss_all") / F.col("n") - mean_a * mean_a
    m_first = F.col("_s_first") / F.col("_k_first")
    m_second = (F.col("_s_all") - F.col("_s_first")) / (
        F.col("n") - F.col("_k_first")
    )

    def strength(m: int):
        mae_m = F.col(f"_s{m}") / F.col(f"_k{m}")
        raw = F.lit(1.0) - mae_m / mae1
        return F.when(
            (F.col(f"_k{m}") > 0) & (F.col("_k1") > 0) & (F.col("_s1") > 0),
            F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0)) + 0.0,
        ).alias(f"seasonal_strength_m{m}")

    return agg.select(
        id_col,
        "n",
        *[strength(m) for m in ms],
        F.when(
            (F.col("n") > 2) & (F.col("_n_out") * 100.0 / F.col("n") > 2.0), 1
        ).otherwise(0).alias("flag_outliers"),
        F.when(F.col("_n_zero") * 100.0 / F.col("n") > 30.0, 1)
        .otherwise(0)
        .alias("flag_intermittent"),
        F.when(
            (F.col("n") > 20)
            & (m_first > 0)
            & (F.abs(m_second - m_first) / m_first > 0.5),
            1,
        ).otherwise(0).alias("flag_structural_break"),
        F.when(F.col("n") < 2 * horizon, 1).otherwise(0).alias(
            "flag_short_history"
        ),
        F.when(var_a < F.lit(1e-12), 1).otherwise(0).alias("flag_constant"),
    )
