"""Query catalog: every implemented operator as a (Spark callable,
DuckDB oracle SQL) pair over the driver testdata tables
(``__spark_entry__.py`` contract).

Exactness discipline — results must hash-match DuckDB bit-for-bit and be
stable across parallelism levels (SURVEY.md §7.4.1), so:

- money-like doubles are aggregated as **integer cents** (``BIGINT``
  sums are order-independent; 2-decimal inputs ×100 land on exact
  integers);
- means are derived ``sum_cents / 100.0 / n`` (one deterministic double
  op chain), never engine ``avg`` over doubles;
- variances come from integer partials ``(Σx² − (Σx)²/n)/(n−1)`` written
  identically on both sides (engine ``stddev`` implementations are
  order-dependent at the ulp);
- `sqrt` is IEEE-correctly-rounded (safe); `sin/cos` are not → rounded
  to 6 decimals on both sides;
- per-series window order is always ``(ts, event_id)`` — a total order.

The events table is the series source: ``user_id`` = series id,
1m/1h/1d tiers of ``(n_events, sum_cents)`` mirror the transcript tiers
(``turns``/``tool_calls``) — same operators, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsforge_spark.operators.gapfill import complete_grid, locf
from tsforge_spark.operators.rollup import bucket_expr

# ---------------------------------------------------------------- helpers

def _cents():
    """value → integer cents (lazy: Column exprs need an active context)."""
    return F.round(F.col("value") * 100).cast("long")

SQL_HOURLY = """
    SELECT user_id, date_trunc('hour', ts) AS bucket,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           min(value) AS vmin, max(value) AS vmax
    FROM events GROUP BY 1, 2
"""


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events scan, hash-spread on user_id when the file layout scans
    too few splits to occupy the cores (round 8: the sf1.0 events file
    is one row group → 4 splits, serializing every consumer's partial
    aggregate; ``spread_scan`` is a no-op on real many-file inputs).
    user_id is the clustering key every consumer groups or windows by,
    so the inserted exchange replaces — not adds to — the consumer's
    own shuffle.  All consumer aggregates are integer-cents partials
    (order-invariant), so values are unchanged."""
    from tsforge_spark.operators.partitioning import spread_scan

    return spread_scan(_read(spark, sf_dir, "events"), "user_id")


def _hourly(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    """The event 1h tier with algebraic partials (engine tier shape).
    ``spread=False`` opts a consumer out of the scan spread (right when
    its terminal aggregate has no partial reduction, e.g. percentile —
    see q_distribution_stats)."""
    src = (
        _events_spread(spark, sf_dir)
        if spread
        else _read(spark, sf_dir, "events")
    )
    return (
        src
        .groupBy("user_id", bucket_expr("ts", "1h").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents()).alias("sum_cents"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )


def _minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events_spread(spark, sf_dir)
        .groupBy("user_id", bucket_expr("ts", "1m").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents()).alias("sum_cents"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )


# ---------------------------------------------------------------- queries


def q_rollup_minute(spark, sf_dir):
    """Tumbling 1m tier rollup (SURVEY §2.4 summarize_by_time)."""
    return _minutely(spark, sf_dir).select(
        "user_id", "bucket", "n_events", "sum_cents"
    )


def q_tier_folds(spark, sf_dir):
    """1m → 1h → 1d continuous-aggregate fold chain from algebraic
    partials (SURVEY §2.9), both coarse tiers in one result (``tier``
    tag); the 1d tier is a fold-of-fold.  The oracle computes each grain
    directly from raw rows — proving fold exactness transitively."""
    m = _minutely(spark, sf_dir)
    h = m.groupBy("user_id", bucket_expr("bucket", "1h").alias("bucket")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )
    d = h.groupBy("user_id", bucket_expr("bucket", "1d").alias("bucket")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )
    return h.withColumn("tier", F.lit("1h")).unionByName(
        d.withColumn("tier", F.lit("1d"))
    )


def q_gapfill_hour(spark, sf_dir):
    """Dense hourly grid per user with BOTH fill modes in one pass:
    locf on the cents column and linear interpolation (clamp mode) on
    the value column — the per-id window shuffle is shared
    (SURVEY §2.5/§2.9 fill_gaps)."""
    from tsforge_spark.operators.gapfill import _interp_exprs

    # unspread tier: this consumer's cost is the grid join + fill
    # windows, not the partial aggregate — the spread exchange only
    # added a raw shuffle (round-8 sweep: 0.60s vs 0.66s at
    # sf1.0-scale, 0.41s vs 0.45s at sf0.1).
    h = _hourly(spark, sf_dir, spread=False).select(
        "user_id", "bucket", "sum_cents",
        (F.col("sum_cents") / 100.0).alias("vh"),
    )
    grid = complete_grid(
        h.select("user_id", "bucket"), "user_id", "bucket", "1h",
        spread=False,
    )
    joined = grid.join(h, ["user_id", "bucket"], "left")
    out = locf(joined, ["sum_cents"], "user_id", "bucket")
    out = _interp_exprs(out, "vh", "user_id", "bucket", "clamp")
    return out.select(
        "user_id", "bucket",
        F.col("sum_cents").alias("filled_cents"),
        F.col("vh").alias("vh_filled"),
    )


def q_rolling_hour_features(spark, sf_dir):
    """Rolling / expanding / lag-diff window features (SURVEY §2.5)."""
    h = _hourly(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("bucket")
    w7 = w.rowsBetween(-6, 0)
    wx = w.rowsBetween(Window.unboundedPreceding, 0)
    return h.select(
        "user_id",
        "bucket",
        F.sum("sum_cents").over(w7).alias("roll_sum7"),
        F.max("sum_cents").over(w7).alias("roll_max7"),
        F.count(F.lit(1)).over(w7).alias("roll_n7"),
        (
            F.sum("sum_cents").over(w7) / 100.0 / F.count(F.lit(1)).over(w7)
        ).alias("roll_mean7"),
        (F.col("sum_cents") - F.lag("sum_cents", 1).over(w)).alias("diff_1"),
        F.sum("sum_cents").over(wx).alias("expanding_sum"),
    )


def q_series_diagnostics(spark, sf_dir):
    """Per-series span/delta/gap diagnostics + seasonal-period band
    classifier (SURVEY §2.4, eda/diagnostics.py:163-244: obs_per_year =
    n/span_days·365.25 → np.select bands {365, 52, 12, 4, 1})."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731  (ts is NTZ in testdata parquet)
    d_us = us(F.col("ts")) - us(F.lag("ts").over(w))
    with_d = ev.withColumn("_d", d_us)
    out = with_d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        (F.sum("_d") / F.count("_d") / 1e6).alias("delta_mean_s"),
        (F.expr("percentile(_d, 0.5)") / 1e6).alias("delta_median_s"),
    )
    span_us = (
        F.unix_micros(F.col("end_ts").cast("timestamp"))
        - F.unix_micros(F.col("start_ts").cast("timestamp"))
    )
    expected = (span_us / F.lit(3600e6)).cast("long") + 1
    span_days = span_us / F.lit(86400e6)
    opy = F.when(span_days > 0, F.col("n_obs") / span_days * 365.25)
    period = (
        F.when((opy >= 360) & (opy <= 370), 365.0)
        .when((opy >= 50) & (opy <= 54), 52.0)
        .when((opy >= 11) & (opy <= 13), 12.0)
        .when((opy >= 3) & (opy <= 5), 4.0)
        .when(opy.isNotNull(), 1.0)
    )
    return (
        out.withColumn("expected_hours", expected)
        .withColumn("span_days", span_days)
        .withColumn("obs_per_year", opy)
        .withColumn("seasonal_period", period)
    )


def q_intermittency_sbc(spark, sf_dir):
    """Intermittency stats + Syntetos-Boylan class on the zero-filled
    hourly series (SURVEY §2.4, plot_intermittancy.py:110-155)."""
    # grid + broadcast join zero-fill over the UNSPREAD tier: the
    # round-8 sweep showed the gap-explode variant and the scan spread
    # both lose for this single-window consumer (sweep at sf1.0-scale:
    # 0.60s this shape vs 0.78s gap-explode/spread; same order at
    # sf0.1) — only perm_entropy's lag-triple chain prefers the
    # gap-explode build (see catalog_ts._zero_filled_hourly).
    h = _hourly(spark, sf_dir, spread=False).select(
        "user_id", "bucket", "sum_cents"
    )
    grid = complete_grid(h, "user_id", "bucket", "1h", spread=False)
    y = grid.join(h, ["user_id", "bucket"], "left").select(
        "user_id", "bucket", F.coalesce("sum_cents", F.lit(0)).alias("c")
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    pos = y.withColumn("_pos", F.row_number().over(w))
    c = F.col("c")
    agg = pos.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.when(c == 0, 1).otherwise(0)).alias("n_zero"),
        F.sum(F.when(c > 0, c)).alias("nz_sum"),
        F.sum(F.when(c > 0, c * c)).alias("nz_sumsq"),
        F.count(F.when(c > 0, 1)).alias("nz_n"),
        F.min(F.when(c > 0, F.col("_pos"))).alias("first_pos"),
        F.max(F.when(c > 0, F.col("_pos"))).alias("last_pos"),
    )
    nz_n = F.col("nz_n")
    mean = F.col("nz_sum") / nz_n
    var = (F.col("nz_sumsq") - F.col("nz_sum") * F.col("nz_sum") / nz_n) / (nz_n - 1)
    cv2 = var / (mean * mean)
    adi = (F.col("last_pos") - F.col("first_pos")) / (nz_n - F.lit(1.0))
    out = agg.select(
        "user_id",
        "n_obs",
        (F.col("n_zero") * 100.0 / F.col("n_obs")).alias("pct_zero"),
        (mean / 100.0).alias("nonzero_mean"),
        cv2.alias("cv2"),
        adi.alias("adi"),
    )
    return out.withColumn(
        "sbc_class",
        F.when((F.col("adi") < 1.32) & (F.col("cv2") < 0.49), "smooth")
        .when((F.col("adi") >= 1.32) & (F.col("cv2") < 0.49), "intermittent")
        .when((F.col("adi") < 1.32) & (F.col("cv2") >= 0.49), "erratic")
        .otherwise("lumpy"),
    )


def q_outlier_zscore(spark, sf_dir):
    """Per-series z-score outlier flags with deterministic moment
    arithmetic (SURVEY §2.4, preprocessing/outliers.py:33-53)."""
    h = _hourly(spark, sf_dir).select("user_id", "sum_cents")
    agg = h.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sum_cents").alias("s"),
        F.sum(F.col("sum_cents") * F.col("sum_cents")).alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    sd = F.sqrt(var)
    bounds = agg.select(
        "user_id", "n",
        (mean - 3 * sd).alias("lo_c"), (mean + 3 * sd).alias("hi_c"),
    )
    flagged = h.join(bounds, "user_id").withColumn(
        "_out",
        ((F.col("sum_cents") < F.col("lo_c")) | (F.col("sum_cents") > F.col("hi_c"))).cast("int"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("_out").alias("n_outliers"),
        F.count(F.lit(1)).alias("n_obs"),
        (F.min("lo_c") / 100.0).alias("lo_bound"),
        (F.min("hi_c") / 100.0).alias("hi_bound"),
    )


def q_peak_hour(spark, sf_dir):
    """Peak hour-of-day per user (argmax via row_number, SURVEY §2.4
    eda/diagnostics.py:250-265)."""
    ev = _events_spread(spark, sf_dir)
    per = ev.groupBy("user_id", F.hour("ts").alias("hod")).agg(
        F.sum(_cents()).alias("s"), F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc(F.col("s") / F.col("n")), F.asc("hod")
    )
    return (
        per.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("hod").alias("peak_hour"),
            (F.col("s") / 100.0 / F.col("n")).alias("peak_avg"),
        )
    )


def q_seasonal_profile_dow(spark, sf_dir):
    """Day-of-week seasonal profile (SURVEY §2.4,
    plots/charts/plot_seasonal.py:102-118)."""
    # NOT spread: this groups to 10 cohorts × 7 dows, so the partial
    # aggregate collapses the scan to 70 rows — a pre-agg raw-row
    # shuffle only adds cost here (A/B'd: 0.39s as-is vs 0.90s spread).
    ev = _read(spark, sf_dir, "events")
    dow = (F.dayofweek("ts") + 5) % 7
    g = ev.groupBy((F.col("user_id") % 10).alias("cohort"), dow.alias("dow")).agg(
        F.sum(_cents()).alias("s"), F.count(F.lit(1)).alias("n_events")
    )
    return g.select(
        "cohort", "dow", "n_events", (F.col("s") / 100.0 / F.col("n_events")).alias("avg_value")
    )


def q_calendar_features(spark, sf_dir):
    """Calendar battery over order dates (SURVEY §2.8,
    feature_engineering/time_features.py:26-41)."""
    d = _read(spark, sf_dir, "orders").select("o_orderdate").distinct()
    ts = F.col("o_orderdate")
    dow = (F.dayofweek(ts) + 5) % 7
    return d.select(
        ts.alias("d"),
        F.year(ts).alias("year"),
        F.quarter(ts).alias("quarter"),
        F.month(ts).alias("month"),
        F.weekofyear(ts).alias("week"),
        F.dayofmonth(ts).alias("day"),
        dow.alias("dayofweek"),
        F.dayofyear(ts).alias("dayofyear"),
        dow.isin(5, 6).cast("int").alias("is_weekend"),
        (F.dayofmonth(ts) == 1).cast("int").alias("is_month_start"),
        (ts.cast("date") == F.last_day(ts)).cast("int").alias("is_month_end"),
    )


def q_cyclical_encoding(spark, sf_dir):
    """Cyclical sin/cos time encodings (SURVEY §2.8,
    time_features.py:47-50); rounded (libm sin/cos is not bit-portable)."""
    import math

    d = _read(spark, sf_dir, "orders").select("o_orderdate").distinct()
    ts = F.col("o_orderdate")
    dow = (F.dayofweek(ts) + 5) % 7
    two_pi = 2 * math.pi
    # `+ 0.0` normalizes IEEE negative zero: DuckDB round(sin(2π·12/12), 6)
    # yields -0.0 (bit 0x800...), Spark yields 0.0 — value-equal but the
    # driver's bitwise hash differs. x + 0.0 maps -0.0 → 0.0 on both engines.
    return d.select(
        ts.alias("d"),
        (F.round(F.sin(dow * two_pi / 7), 6) + 0.0).alias("dow_sin"),
        (F.round(F.cos(dow * two_pi / 7), 6) + 0.0).alias("dow_cos"),
        (F.round(F.sin(F.month(ts) * two_pi / 12), 6) + 0.0).alias("month_sin"),
        (F.round(F.cos(F.month(ts) * two_pi / 12), 6) + 0.0).alias("month_cos"),
    )


def q_metrics_naive(spark, sf_dir):
    """Forecast metric suite on a naive lag-1 forecast (SURVEY §2.9,
    evaluation/metrics.py:6-177) — integer-exact mae/rmse/wape/bias."""
    ev = _read(spark, sf_dir, "events").withColumn("c", _cents())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.withColumn("chat", F.lag("c").over(w)).filter(F.col("chat").isNotNull())
    d = F.col("chat") - F.col("c")
    ad = F.abs(d)
    smape_term = 2.0 * (ad / 100.0) / (F.col("c") / 100.0 + F.col("chat") / 100.0 + F.lit(1e-12))
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(ad) / 100.0 / F.count(F.lit(1))).alias("mae"),
        F.sqrt(F.sum(d * d) / 10000.0 / F.count(F.lit(1))).alias("rmse"),
        (F.sum(ad) * 100.0 / F.sum(F.abs(F.col("c")))).alias("wape"),
        (F.sum(d) / 100.0 / F.count(F.lit(1))).alias("bias"),
        F.round(F.avg(smape_term) * 100.0, 6).alias("smape"),
    )


def q_cv_folds(spark, sf_dir):
    """Rolling-origin CV fold windows (SURVEY §2.9, nixtla_demo
    CVPlan): 3 cutoffs, 5-day step/horizon, per-fold row count + sum."""
    import datetime as dt

    ev = _read(spark, sf_dir, "events")
    last = ev.agg(F.max("ts")).collect()[0][0]
    step = dt.timedelta(days=5)
    ts_type = ev.schema["ts"].dataType.simpleString()

    def wall(dt):
        # python-datetime literals are interpreted with the DRIVER's
        # timezone while NTZ casts use the session timezone — routing
        # through a string keeps the comparison wall-clock under any
        # session timezone
        return F.lit(dt.strftime("%Y-%m-%d %H:%M:%S.%f")).cast(ts_type)

    folds = None
    for i in range(3):
        co = last - step * (3 - i)
        lo, hi = wall(co), wall(co + step)
        f = (
            ev.filter((F.col("ts") > lo) & (F.col("ts") <= hi))
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum(_cents()).alias("sum_cents"))
            .withColumn("fold", F.lit(i))
        )
        folds = f if folds is None else folds.unionByName(f)
    return folds.select("fold", "n_rows", "sum_cents")


def q_ensemble_combine(spark, sf_dir):
    """Ensemble combine (mean/median/weighted) of two baseline models +
    integer-exact MAE of each (SURVEY §2.4 ensemble,
    workflows/manager.py:577-614)."""
    h = _hourly(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("bucket")
    w3 = w.rowsBetween(-3, -1)
    p = (
        h.withColumn("m1", F.lag("sum_cents", 1).over(w).cast("double"))
        .withColumn(
            "m2", F.sum("sum_cents").over(w3) / F.count(F.lit(1)).over(w3)
        )
        .filter(F.col("m1").isNotNull() & F.col("m2").isNotNull())
    )
    comb_mean = (F.col("m1") + F.col("m2")) / 2.0
    comb_w = F.col("m1") * 0.7 + F.col("m2") * 0.3
    y = F.col("sum_cents").cast("double")
    ae = lambda c: F.sum(F.round(F.abs(y - c) * 1e4).cast("long"))  # noqa: E731
    return p.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        (ae(F.col("m1")) / 1e6 / F.count(F.lit(1))).alias("mae_m1"),
        (ae(F.col("m2")) / 1e6 / F.count(F.lit(1))).alias("mae_m2"),
        (ae(comb_mean) / 1e6 / F.count(F.lit(1))).alias("mae_mean"),
        (ae(comb_w) / 1e6 / F.count(F.lit(1))).alias("mae_weighted"),
    )


def q_target_mean_encoding(spark, sf_dir):
    """Smoothed target-mean encoding (SURVEY §2.4,
    encode_features.py:416-451): w·group_mean + (1−w)·global_mean."""
    ev = _read(spark, sf_dir, "events").withColumn("c", _cents())
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
    )
    tot = ev.groupBy().agg(
        F.count(F.lit(1)).alias("tn"), F.sum("c").alias("ts_")
    )
    j = g.crossJoin(F.broadcast(tot))
    wgt = F.col("n") / (F.col("n") + F.lit(10.0))
    gmean = F.col("s") / 100.0 / F.col("n")
    glob = F.col("ts_") / 100.0 / F.col("tn")
    return j.select(
        "event_type", "n", (wgt * gmean + (1 - wgt) * glob).alias("encoded")
    )


def q_freq_hash_encoding(spark, sf_dir):
    """Frequency + ordinal-by-frequency + md5-hash encodings
    (SURVEY §2.8, encode_features.py:604-728)."""
    ev = _read(spark, sf_dir, "events")
    freq = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.desc("freq"), F.asc("event_type"))
    h = F.conv(F.substring(F.md5(F.col("event_type")), 1, 8), 16, 10)
    return freq.select(
        "event_type",
        "freq",
        (F.row_number().over(w) - 1).alias("ordinal"),
        (h.cast("long") % 16).cast("int").alias("hash_bin"),
    )


def q_tpch_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary (relational agg coverage)."""
    li = _read(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    charge_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100
    ).cast("long")
    return (
        li.filter(
            F.col("l_shipdate")
            <= F.lit("1998-09-02 00:00:00").cast(
                li.schema["l_shipdate"].dataType.simpleString()
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price_c).alias("sum_base_price_cents"),
            F.sum(charge_c).alias("sum_charge_cents"),
            (F.sum(disc_c) / 100.0 / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_revenue_by_nation(spark, sf_dir):
    """Star join orders⋈customer⋈nation with broadcast dims
    (SURVEY §2.3)."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_nationkey")),
        o["o_custkey"] == c["c_custkey"],
    ).join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
    return j.groupBy("n_name").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "revenue_cents"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_top_users(spark, sf_dir):
    """Top-5 users by total value (SURVEY §2.6 top-k)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.sum(_cents()).alias("total_cents"), F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("total_cents"), F.asc("user_id"))
        .limit(5)
    )


def q_missing_hours(spark, sf_dir):
    """Grid anti-join: expected − observed hourly buckets per user
    (SURVEY §2.7 except/difference)."""
    h = _hourly(spark, sf_dir).select("user_id", "bucket")
    grid = complete_grid(h, "user_id", "bucket", "1h")
    missing = grid.join(h, ["user_id", "bucket"], "left_anti")
    return missing.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_missing"))


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (training-data op: exact
    deduplication)."""
    d = _read(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )


# ---------------------------------------------------------------- oracles

ORACLES: dict[str, str] = {}

ORACLES["rollup_minute"] = """
    SELECT user_id, date_trunc('minute', ts) AS bucket,
           count(*) AS n_events,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1, 2
"""

ORACLES["tier_folds"] = """
    SELECT user_id, date_trunc('hour', ts) AS bucket,
           count(*) AS n_events,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
           min(value) AS vmin, max(value) AS vmax,
           '1h' AS tier
    FROM events GROUP BY 1, 2
    UNION ALL
    SELECT user_id, date_trunc('day', ts) AS bucket,
           count(*) AS n_events,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
           min(value) AS vmin, max(value) AS vmax,
           '1d' AS tier
    FROM events GROUP BY 1, 2
"""

ORACLES["gapfill_hour"] = f"""
    WITH h AS ({SQL_HOURLY}),
    s AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
    g AS (SELECT user_id,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM s),
    j AS (SELECT g.user_id, g.bucket, h.sum_cents,
                 h.sum_cents / 100.0 AS vh
          FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.bucket = h.bucket),
    k AS (SELECT user_id, bucket, sum_cents, vh,
                 epoch_us(bucket) AS t,
                 last_value(sum_cents IGNORE NULLS) OVER wb AS filled_cents,
                 last_value(vh IGNORE NULLS) OVER wb AS prev_v,
                 last_value(CASE WHEN vh IS NOT NULL THEN epoch_us(bucket) END IGNORE NULLS) OVER wb AS prev_t,
                 first_value(vh IGNORE NULLS) OVER wf AS next_v,
                 first_value(CASE WHEN vh IS NOT NULL THEN epoch_us(bucket) END IGNORE NULLS) OVER wf AS next_t
          FROM j
          WINDOW wb AS (PARTITION BY user_id ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wf AS (PARTITION BY user_id ORDER BY bucket
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, bucket, filled_cents,
           CASE WHEN vh IS NOT NULL THEN vh
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                     THEN prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
                ELSE coalesce(prev_v, next_v) END AS vh_filled
    FROM k
"""

ORACLES["rolling_hour_features"] = f"""
    WITH h AS ({SQL_HOURLY})
    SELECT user_id, bucket,
           CAST(sum(sum_cents) OVER w7 AS BIGINT) AS roll_sum7,
           max(sum_cents) OVER w7 AS roll_max7,
           count(*) OVER w7 AS roll_n7,
           sum(sum_cents) OVER w7 / 100.0 / count(*) OVER w7 AS roll_mean7,
           sum_cents - lag(sum_cents, 1) OVER w AS diff_1,
           CAST(sum(sum_cents) OVER wx AS BIGINT) AS expanding_sum
    FROM h
    WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
           w7 AS (PARTITION BY user_id ORDER BY bucket
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
           wx AS (PARTITION BY user_id ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

ORACLES["series_diagnostics"] = """
    WITH d AS (
      SELECT user_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
      FROM events)
    , a AS (
      SELECT user_id,
             count(*) AS n_obs,
             min(ts) AS start_ts,
             max(ts) AS end_ts,
             sum(delta_us) / count(delta_us) / 1e6 AS delta_mean_s,
             quantile_cont(CAST(delta_us AS DOUBLE), 0.5) / 1e6 AS delta_median_s
      FROM d GROUP BY user_id),
    b AS (
      SELECT *,
             CAST(floor((epoch_us(end_ts) - epoch_us(start_ts)) / 3600e6)
                  AS BIGINT) + 1 AS expected_hours,
             (epoch_us(end_ts) - epoch_us(start_ts)) / 86400e6 AS span_days
      FROM a),
    c AS (
      SELECT *,
             CASE WHEN span_days > 0
                  THEN n_obs / span_days * 365.25 END AS obs_per_year
      FROM b)
    SELECT *,
           CASE WHEN obs_per_year >= 360 AND obs_per_year <= 370 THEN 365.0
                WHEN obs_per_year >= 50 AND obs_per_year <= 54 THEN 52.0
                WHEN obs_per_year >= 11 AND obs_per_year <= 13 THEN 12.0
                WHEN obs_per_year >= 3 AND obs_per_year <= 5 THEN 4.0
                WHEN obs_per_year IS NOT NULL THEN 1.0 END AS seasonal_period
    FROM c
"""

ORACLES["intermittency_sbc"] = f"""
    WITH h AS ({SQL_HOURLY}),
    s AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
    g AS (SELECT user_id,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM s),
    y AS (SELECT g.user_id, g.bucket, coalesce(h.sum_cents, 0) AS c,
                 row_number() OVER (PARTITION BY g.user_id ORDER BY g.bucket) AS pos
          FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.bucket = h.bucket),
    a AS (SELECT user_id,
                 count(*) AS n_obs,
                 sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS n_zero,
                 sum(CASE WHEN c > 0 THEN c END) AS nz_sum,
                 sum(CASE WHEN c > 0 THEN c * c END) AS nz_sumsq,
                 count(CASE WHEN c > 0 THEN 1 END) AS nz_n,
                 min(CASE WHEN c > 0 THEN pos END) AS first_pos,
                 max(CASE WHEN c > 0 THEN pos END) AS last_pos
          FROM y GROUP BY user_id),
    b AS (SELECT user_id, n_obs,
                 n_zero * 100.0 / n_obs AS pct_zero,
                 (nz_sum / nz_n) / 100.0 AS nonzero_mean,
                 ((nz_sumsq - nz_sum * nz_sum / nz_n) / (nz_n - 1))
                     / ((nz_sum / nz_n) * (nz_sum / nz_n)) AS cv2,
                 (last_pos - first_pos) / (nz_n - 1.0) AS adi
          FROM a)
    SELECT user_id, n_obs, pct_zero, nonzero_mean, cv2, adi,
           CASE WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
                WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
                WHEN adi < 1.32 AND cv2 >= 0.49 THEN 'erratic'
                ELSE 'lumpy' END AS sbc_class
    FROM b
"""

ORACLES["outlier_zscore"] = f"""
    WITH h AS ({SQL_HOURLY}),
    a AS (SELECT user_id, count(*) AS n, sum(sum_cents) AS s,
                 sum(sum_cents * sum_cents) AS ss
          FROM h GROUP BY user_id),
    b AS (SELECT user_id, n,
                 s / n - 3 * sqrt((ss - s * s / n) / (n - 1)) AS lo_c,
                 s / n + 3 * sqrt((ss - s * s / n) / (n - 1)) AS hi_c
          FROM a)
    SELECT h.user_id,
           CAST(sum(CASE WHEN h.sum_cents < b.lo_c OR h.sum_cents > b.hi_c
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           count(*) AS n_obs,
           min(b.lo_c) / 100.0 AS lo_bound,
           min(b.hi_c) / 100.0 AS hi_bound
    FROM h JOIN b ON h.user_id = b.user_id
    GROUP BY h.user_id
"""

ORACLES["peak_hour"] = """
    WITH per AS (
      SELECT user_id, extract(hour FROM ts) AS hod,
             sum(CAST(round(value*100) AS BIGINT)) AS s,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    r AS (SELECT user_id, hod, s, n,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY s / n DESC, hod ASC) AS rn
          FROM per)
    SELECT user_id, hod AS peak_hour, s / 100.0 / n AS peak_avg
    FROM r WHERE rn = 1
"""

ORACLES["seasonal_profile_dow"] = """
    SELECT user_id % 10 AS cohort,
           isodow(ts) - 1 AS dow,
           count(*) AS n_events,
           sum(CAST(round(value*100) AS BIGINT)) / 100.0 / count(*) AS avg_value
    FROM events GROUP BY 1, 2
"""

ORACLES["calendar_features"] = """
    SELECT DISTINCT o_orderdate AS d,
           extract(year FROM o_orderdate) AS year,
           extract(quarter FROM o_orderdate) AS quarter,
           extract(month FROM o_orderdate) AS month,
           extract(week FROM o_orderdate) AS week,
           extract(day FROM o_orderdate) AS day,
           isodow(o_orderdate) - 1 AS dayofweek,
           extract(doy FROM o_orderdate) AS dayofyear,
           CASE WHEN isodow(o_orderdate) - 1 IN (5, 6) THEN 1 ELSE 0 END AS is_weekend,
           CASE WHEN extract(day FROM o_orderdate) = 1 THEN 1 ELSE 0 END AS is_month_start,
           CASE WHEN CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE))
                THEN 1 ELSE 0 END AS is_month_end
    FROM orders
"""

ORACLES["cyclical_encoding"] = """
    SELECT DISTINCT o_orderdate AS d,
           round(sin((isodow(o_orderdate) - 1) * 2 * pi() / 7), 6) + 0.0 AS dow_sin,
           round(cos((isodow(o_orderdate) - 1) * 2 * pi() / 7), 6) + 0.0 AS dow_cos,
           round(sin(extract(month FROM o_orderdate) * 2 * pi() / 12), 6) + 0.0 AS month_sin,
           round(cos(extract(month FROM o_orderdate) * 2 * pi() / 12), 6) + 0.0 AS month_cos
    FROM orders
"""

ORACLES["metrics_naive"] = """
    WITH p AS (
      SELECT event_type,
             CAST(round(value*100) AS BIGINT) AS c,
             lag(CAST(round(value*100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS chat
      FROM events)
    SELECT event_type,
           count(*) AS n,
           sum(abs(chat - c)) / 100.0 / count(*) AS mae,
           sqrt(sum((chat - c) * (chat - c)) / 10000.0 / count(*)) AS rmse,
           sum(abs(chat - c)) * 100.0 / sum(abs(c)) AS wape,
           sum(chat - c) / 100.0 / count(*) AS bias,
           round(avg(2.0 * (abs(chat - c) / 100.0)
                     / (c / 100.0 + chat / 100.0 + 1e-12)) * 100.0, 6) AS smape
    FROM p WHERE chat IS NOT NULL
    GROUP BY event_type
"""

ORACLES["cv_folds"] = """
    WITH mx AS (SELECT max(ts) AS last FROM events),
    f AS (SELECT i AS fold,
                 (SELECT last FROM mx) - INTERVAL 5 DAY * (3 - i) AS co
          FROM (VALUES (0), (1), (2)) t(i))
    SELECT f.fold, count(*) AS n_rows,
           CAST(sum(CAST(round(e.value*100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM f JOIN events e
      ON e.ts > f.co AND e.ts <= f.co + INTERVAL 5 DAY
    GROUP BY f.fold
"""

ORACLES["ensemble_combine"] = f"""
    WITH h AS ({SQL_HOURLY}),
    p AS (SELECT user_id, bucket, sum_cents,
                 CAST(lag(sum_cents, 1) OVER w AS DOUBLE) AS m1,
                 sum(sum_cents) OVER w3 / CAST(count(*) OVER w3 AS DOUBLE) AS m2
          FROM h
          WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
                 w3 AS (PARTITION BY user_id ORDER BY bucket
                        ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
    SELECT count(*) AS n,
           sum(CAST(round(abs(sum_cents - m1) * 1e4) AS BIGINT)) / 1e6 / count(*) AS mae_m1,
           sum(CAST(round(abs(sum_cents - m2) * 1e4) AS BIGINT)) / 1e6 / count(*) AS mae_m2,
           sum(CAST(round(abs(sum_cents - (m1 + m2) / 2.0) * 1e4) AS BIGINT)) / 1e6 / count(*) AS mae_mean,
           sum(CAST(round(abs(sum_cents - (m1 * 0.7 + m2 * 0.3)) * 1e4) AS BIGINT)) / 1e6 / count(*) AS mae_weighted
    FROM p WHERE m1 IS NOT NULL AND m2 IS NOT NULL
"""

ORACLES["target_mean_encoding"] = """
    WITH g AS (SELECT event_type, count(*) AS n,
                      sum(CAST(round(value*100) AS BIGINT)) AS s
               FROM events GROUP BY 1),
    t AS (SELECT count(*) AS tn, sum(CAST(round(value*100) AS BIGINT)) AS ts_
          FROM events)
    SELECT g.event_type, g.n,
           (g.n / (g.n + 10.0)) * (g.s / 100.0 / g.n)
           + (1 - g.n / (g.n + 10.0)) * (t.ts_ / 100.0 / t.tn) AS encoded
    FROM g, t
"""

ORACLES["freq_hash_encoding"] = """
    WITH f AS (SELECT event_type, count(*) AS freq FROM events GROUP BY 1)
    SELECT event_type, freq,
           row_number() OVER (ORDER BY freq DESC, event_type ASC) - 1 AS ordinal,
           CAST(('0x' || substr(md5(event_type), 1, 8))::BIGINT % 16 AS INT) AS hash_bin
    FROM f
"""

ORACLES["tpch_pricing_summary"] = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                    AS BIGINT)) AS BIGINT) AS sum_charge_cents,
           sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""

ORACLES["revenue_by_nation"] = """
    SELECT n.n_name,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
"""

ORACLES["top_users"] = """
    SELECT user_id,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents,
           count(*) AS n_events
    FROM events GROUP BY 1
    ORDER BY total_cents DESC, user_id ASC LIMIT 5
"""

ORACLES["missing_hours"] = f"""
    WITH h AS ({SQL_HOURLY}),
    s AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
    g AS (SELECT user_id,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM s)
    SELECT g.user_id, count(*) AS n_missing
    FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.bucket = h.bucket
    WHERE h.user_id IS NULL
    GROUP BY g.user_id
"""

ORACLES["dedup_exact"] = """
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique_texts
    FROM documents GROUP BY source
"""


from tsforge_spark.catalog_docs import ORACLES_DOCS, QUERIES_DOCS  # noqa: E402
from tsforge_spark.catalog_ext import ORACLES_EXT, QUERIES_EXT  # noqa: E402
from tsforge_spark.catalog_ts import ORACLES_TS, QUERIES_TS  # noqa: E402

ORACLES.update(ORACLES_DOCS)
ORACLES.update(ORACLES_EXT)
ORACLES.update(ORACLES_TS)

QUERIES = {
    "rollup_minute": q_rollup_minute,
    "tier_folds": q_tier_folds,
    "gapfill_hour": q_gapfill_hour,
    "rolling_hour_features": q_rolling_hour_features,
    "series_diagnostics": q_series_diagnostics,
    "intermittency_sbc": q_intermittency_sbc,
    "outlier_zscore": q_outlier_zscore,
    "peak_hour": q_peak_hour,
    "seasonal_profile_dow": q_seasonal_profile_dow,
    "calendar_features": q_calendar_features,
    "cyclical_encoding": q_cyclical_encoding,
    "metrics_naive": q_metrics_naive,
    "cv_folds": q_cv_folds,
    "ensemble_combine": q_ensemble_combine,
    "target_mean_encoding": q_target_mean_encoding,
    "freq_hash_encoding": q_freq_hash_encoding,
    "tpch_pricing_summary": q_tpch_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "top_users": q_top_users,
    "missing_hours": q_missing_hours,
    "dedup_exact": q_dedup_exact,
    **QUERIES_DOCS,
    **QUERIES_EXT,
    **QUERIES_TS,
}
