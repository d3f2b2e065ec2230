"""Catalog batch 3: as-of join, semi/anti joins, distribution stats,
zero-run streaks, future-frame naive forecast, unpivot (wide→long
standardize), rollup lattice (grouping sets), exact distinct counts.

Completes the SURVEY §2 inventory lines not yet oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tsforge_spark.catalog import SQL_HOURLY, _cents, _hourly, _read
from tsforge_spark.operators.asof import asof_join
from tsforge_spark.operators.gapfill import complete_grid


def q_asof_join(spark, sf_dir):
    """True as-of join (union+locf form): each event gets the latest
    hourly-tier sum at-or-before its timestamp (SURVEY §2.3)."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").alias("t")
    )
    h = _hourly(spark, sf_dir).select(
        "user_id", F.col("bucket").alias("t"), "sum_cents"
    )
    out = asof_join(ev, h, "user_id", "t", ["sum_cents"])
    return out.select(
        "user_id", "event_id", F.col("sum_cents_asof").alias("hour_cents")
    )


def q_semi_anti_join(spark, sf_dir):
    """Left-semi / left-anti joins: customers with vs without orders
    (SURVEY §2.3/§2.7)."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").select("o_custkey")
    with_orders = c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
    without = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
    return (
        with_orders.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
        .join(
            without.groupBy("c_mktsegment").agg(
                F.count(F.lit(1)).alias("n_without_orders")
            ),
            "c_mktsegment",
            "full_outer",
        )
        .fillna(0, ["n_with_orders", "n_without_orders"])
    )


def q_distribution_stats(spark, sf_dir):
    """Per-series distribution stats incl. exact interpolated percentiles
    and per-id max-normalization bound (SURVEY §2.4).

    Reads the UNSPREAD hourly tier: ``percentile`` has no partial
    reduction (every cell value travels to the final aggregate
    regardless), so the scan-spread exchange only adds a raw-row
    shuffle here (A/B at sf1.0: 0.27s unspread vs 0.49s spread)."""
    h = _hourly(spark, sf_dir, spread=False)
    return h.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("sum_cents") / 100.0 / F.count(F.lit(1))).alias("mean_v"),
        (F.expr("percentile(sum_cents, 0.5)") / 100.0).alias("median_v"),
        (F.expr("percentile(sum_cents, 0.25)") / 100.0).alias("p25_v"),
        (F.expr("percentile(sum_cents, 0.75)") / 100.0).alias("p75_v"),
        (F.min("sum_cents") / 100.0).alias("min_v"),
        (F.max("sum_cents") / 100.0).alias("max_v"),
        F.round(F.log1p(F.max("sum_cents") / 100.0), 9).alias("log1p_max"),
    )


def q_zero_streaks(spark, sf_dir):
    """Longest zero-run + leading/trailing zero counts on the zero-filled
    hourly grid — run-length islands via row_number difference
    (SURVEY §2.5, ts_features_extension.py:47-74,138-147)."""
    # grid + broadcast join zero-fill over the UNSPREAD tier — the
    # round-8 sweep verdict for single-window zero-fill consumers
    # (sf1.0-scale: 0.55s this shape vs 0.78s gap-explode/spread; same
    # order at sf0.1); only perm_entropy prefers the gap-explode build
    # (see catalog_ts._zero_filled_hourly).
    h = _hourly(spark, sf_dir, spread=False).select(
        "user_id", "bucket", "sum_cents"
    )
    grid = complete_grid(h, "user_id", "bucket", "1h", spread=False)
    y = grid.join(h, ["user_id", "bucket"], "left").select(
        "user_id", "bucket", F.coalesce("sum_cents", F.lit(0)).alias("c")
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    pos = y.withColumn("pos", F.row_number().over(w))
    zeros = pos.filter(F.col("c") == 0)
    wz = Window.partitionBy("user_id").orderBy("pos")
    islands = zeros.withColumn(
        "island", F.col("pos") - F.row_number().over(wz)
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    longest = streaks.groupBy("user_id").agg(F.max("len").alias("longest_zero_run"))
    bounds = pos.groupBy("user_id").agg(
        (F.min(F.when(F.col("c") > 0, F.col("pos"))) - 1).alias("leading_zeros"),
        (
            F.max("pos") - F.max(F.when(F.col("c") > 0, F.col("pos")))
        ).alias("trailing_zeros"),
    )
    return bounds.join(longest, "user_id", "left").fillna(
        0, ["longest_zero_run"]
    )


def q_naive_forecast(spark, sf_dir):
    """Future frame + naive baseline: mean of last 7 hourly values
    broadcast over a 6-hour horizon (SURVEY §2.9, baselines.py:3-9)."""
    h = _hourly(spark, sf_dir).select("user_id", "bucket", "sum_cents")
    w = Window.partitionBy("user_id").orderBy(F.desc("bucket"))
    recent = (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 7)
        .groupBy("user_id")
        .agg(
            (F.sum("sum_cents") / 100.0 / F.count(F.lit(1))).alias("yhat"),
            F.max("bucket").alias("_last"),
        )
    )
    return recent.select(
        "user_id",
        F.explode(
            F.expr(
                "sequence(_last + interval 1 hour,"
                " _last + interval 6 hour, interval 1 hour)"
            )
        ).alias("bucket"),
        "yhat",
    )


def q_unpivot_metrics(spark, sf_dir):
    """Wide→long unpivot — the reference's standardize-preds melt
    (SURVEY §1.1, workflows/manager.py:152-168)."""
    wide = (
        _read(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "price_cents"
            ),
        )
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(2, 'qty', qty, 'price_cents', price_cents) as (measure, value)",
    )


def q_rollup_lattice(spark, sf_dir):
    """Hierarchy rollup lattice via ROLLUP grouping sets (SURVEY §2.4);
    null grouping levels labeled 'ALL'."""
    ev = _read(spark, sf_dir, "events")
    dow = ((F.dayofweek("ts") + 5) % 7).cast("int")
    return (
        ev.select(F.col("event_type"), dow.alias("dow"), _cents().alias("c"))
        .rollup("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("sum_cents"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias("dow"),
            "n",
            "sum_cents",
        )
    )


def q_distinct_daily_users(spark, sf_dir):
    """Exact distinct counting per day (SURVEY §2.4 distinct aggregates)."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("bucket")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("user_id", "event_type").alias("n_user_type_pairs"),
    )


def q_det_sample(spark, sf_dir):
    """Deterministic sample (SURVEY §2.6; reference seeds sampling with
    random_state=42, plots/plot_correlation.py:64-69): md5-hash-mod row
    selection (~2%) — reproducible across engines, partitionings, and
    runs, unlike engine-native RNG sampling."""
    ev = _read(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return ev.filter(h % 50 == 0).select(
        "event_id", "user_id", "event_type", "value"
    )


ORACLES_EXT: dict[str, str] = {}

ORACLES_EXT["det_sample"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
          % 50 = 0
"""

ORACLES_EXT["asof_join"] = f"""
    WITH h AS ({SQL_HOURLY})
    SELECT e.user_id, e.event_id, h.sum_cents AS hour_cents
    FROM events e ASOF LEFT JOIN h
      ON e.user_id = h.user_id AND e.ts >= h.bucket
"""

ORACLES_EXT["semi_anti_join"] = """
    WITH w AS (SELECT c_mktsegment, count(*) AS n_with_orders
               FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
               GROUP BY 1),
    wo AS (SELECT c_mktsegment, count(*) AS n_without_orders
           FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
           GROUP BY 1)
    SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
           coalesce(n_with_orders, 0) AS n_with_orders,
           coalesce(n_without_orders, 0) AS n_without_orders
    FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
"""

ORACLES_EXT["distribution_stats"] = f"""
    WITH h AS ({SQL_HOURLY})
    SELECT user_id, count(*) AS n,
           CAST(sum(sum_cents) AS BIGINT) / 100.0 / count(*) AS mean_v,
           quantile_cont(CAST(sum_cents AS DOUBLE), 0.5) / 100.0 AS median_v,
           quantile_cont(CAST(sum_cents AS DOUBLE), 0.25) / 100.0 AS p25_v,
           quantile_cont(CAST(sum_cents AS DOUBLE), 0.75) / 100.0 AS p75_v,
           min(sum_cents) / 100.0 AS min_v,
           max(sum_cents) / 100.0 AS max_v,
           round(ln(1 + max(sum_cents) / 100.0), 9) AS log1p_max
    FROM h GROUP BY user_id
"""

ORACLES_EXT["zero_streaks"] = f"""
    WITH h AS ({SQL_HOURLY}),
    s AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
    g AS (SELECT user_id,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM s),
    y AS (SELECT g.user_id, g.bucket, coalesce(h.sum_cents, 0) AS c,
                 row_number() OVER (PARTITION BY g.user_id ORDER BY g.bucket) AS pos
          FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.bucket = h.bucket),
    z AS (SELECT user_id, pos,
                 pos - row_number() OVER (PARTITION BY user_id ORDER BY pos)
                     AS island
          FROM y WHERE c = 0),
    st AS (SELECT user_id, island, count(*) AS len FROM z GROUP BY 1, 2),
    longest AS (SELECT user_id, max(len) AS longest_zero_run FROM st GROUP BY 1),
    bounds AS (SELECT user_id,
                      min(CASE WHEN c > 0 THEN pos END) - 1 AS leading_zeros,
                      max(pos) - max(CASE WHEN c > 0 THEN pos END) AS trailing_zeros
               FROM y GROUP BY user_id)
    SELECT b.user_id, b.leading_zeros, b.trailing_zeros,
           coalesce(l.longest_zero_run, 0) AS longest_zero_run
    FROM bounds b LEFT JOIN longest l ON b.user_id = l.user_id
"""

ORACLES_EXT["naive_forecast"] = f"""
    WITH h AS ({SQL_HOURLY}),
    r AS (SELECT user_id, bucket, sum_cents,
                 row_number() OVER (PARTITION BY user_id ORDER BY bucket DESC)
                     AS rn
          FROM h),
    recent AS (SELECT user_id,
                      CAST(sum(sum_cents) AS BIGINT) / 100.0 / count(*) AS yhat,
                      max(bucket) AS last_b
               FROM r WHERE rn <= 7 GROUP BY user_id)
    SELECT user_id,
           unnest(generate_series(last_b + INTERVAL 1 HOUR,
                                  last_b + INTERVAL 6 HOUR,
                                  INTERVAL 1 HOUR)) AS bucket,
           yhat
    FROM recent
"""

ORACLES_EXT["unpivot_metrics"] = """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS price_cents
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag, 'qty' AS measure, qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'price_cents' AS measure, price_cents AS value FROM wide
"""

ORACLES_EXT["rollup_lattice"] = """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(dow AS VARCHAR), 'ALL') AS dow,
           count(*) AS n,
           CAST(sum(c) AS BIGINT) AS sum_cents
    FROM (SELECT event_type, isodow(ts) - 1 AS dow,
                 CAST(round(value*100) AS BIGINT) AS c
          FROM events)
    GROUP BY ROLLUP (event_type, dow)
"""

ORACLES_EXT["distinct_daily_users"] = """
    SELECT date_trunc('day', ts) AS bucket,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT (user_id, event_type)) AS n_user_type_pairs
    FROM events GROUP BY 1
"""

QUERIES_EXT = {
    "asof_join": q_asof_join,
    "semi_anti_join": q_semi_anti_join,
    "distribution_stats": q_distribution_stats,
    "zero_streaks": q_zero_streaks,
    "naive_forecast": q_naive_forecast,
    "unpivot_metrics": q_unpivot_metrics,
    "rollup_lattice": q_rollup_lattice,
    "distinct_daily_users": q_distinct_daily_users,
    "det_sample": q_det_sample,
}
