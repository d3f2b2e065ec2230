"""Catalog batch 4: sessionization, exact ACF, permutation entropy,
pivot (long→wide) — the remaining SURVEY §2.9/§2.10-adjacent analytics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tsforge_spark.catalog import SQL_HOURLY, _hourly, _read
from tsforge_spark.operators.gapfill import complete_grid
from tsforge_spark.operators.sessions import (
    acf_exact,
    permutation_entropy_m3,
    sessionize,
)


def _zero_filled_hourly(spark, sf_dir):
    h = _hourly(spark, sf_dir).select("user_id", "bucket", "sum_cents")
    grid = complete_grid(h, "user_id", "bucket", "1h")
    return grid.join(h, ["user_id", "bucket"], "left").select(
        "user_id", "bucket", F.coalesce("sum_cents", F.lit(0)).alias("c")
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min) + per-user session stats."""
    ev = _read(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", "30 minutes", ["ts", "event_id"])
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max("ts").cast("timestamp"))
             - F.unix_micros(F.min("ts").cast("timestamp"))) / 1e6
        ).alias("dur_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.round(F.sum("dur_s"), 6).alias("total_session_sec"),
    )


def q_acf(spark, sf_dir):
    """Exact ACF at lags 1-3 on the zero-filled hourly series."""
    y = _zero_filled_hourly(spark, sf_dir)
    out = acf_exact(y, "user_id", "bucket", "c", [1, 2, 3])
    return out.select(
        "user_id", "n",
        F.round("acf_1", 9).alias("acf_1"),
        F.round("acf_2", 9).alias("acf_2"),
        F.round("acf_3", 9).alias("acf_3"),
    )


def q_perm_entropy(spark, sf_dir):
    """m=3 ordinal-pattern permutation entropy per series."""
    y = _zero_filled_hourly(spark, sf_dir)
    return permutation_entropy_m3(y, "user_id", "bucket", "c")


def q_pivot_event_types(spark, sf_dir):
    """Long→wide pivot: per-user event-type counts as columns
    (SURVEY §3 melt/pivot pair with unpivot_metrics)."""
    ev = _read(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .fillna(0, types)
    )


_ZF = f"""
    h AS ({SQL_HOURLY}),
    sp AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
    g AS (SELECT user_id,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM sp),
    y AS (SELECT g.user_id, g.bucket, coalesce(h.sum_cents, 0) AS c
          FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.bucket = h.bucket)
"""

ORACLES_TS: dict[str, str] = {}

ORACLES_TS["sessionize"] = """
    WITH s AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sid AS (SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                       AS session_id
            FROM s),
    per AS (SELECT user_id, session_id, count(*) AS n_events,
                   (epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6 AS dur_s
            FROM sid GROUP BY 1, 2)
    SELECT user_id, count(*) AS n_sessions,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           round(sum(dur_s), 6) AS total_session_sec
    FROM per GROUP BY user_id
"""


def _acf_sql() -> str:
    lead_cols = ",\n             ".join(
        f"lead(c, {k}) OVER (PARTITION BY user_id ORDER BY bucket) AS lead{k}"
        for k in (1, 2, 3)
    )
    agg_cols = []
    for k in (1, 2, 3):
        agg_cols.append(
            f"CAST(sum(c * lead{k}) AS BIGINT) AS cross{k},\n"
            f"           CAST(sum(CASE WHEN lead{k} IS NOT NULL THEN c END) AS BIGINT) AS head{k},\n"
            f"           CAST(sum(lead{k}) AS BIGINT) AS tail{k}"
        )
    aggs = ",\n           ".join(agg_cols)
    acfs = ",\n           ".join(
        f"round((cross{k} - (CAST(s AS DOUBLE) / n) * (head{k} + tail{k})"
        f" + (n - {k}) * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))"
        f" / (ss - n * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 9)"
        f" AS acf_{k}"
        for k in (1, 2, 3)
    )
    return f"""
    WITH {_ZF},
    l AS (SELECT user_id, bucket, c,
             {lead_cols}
          FROM y),
    a AS (SELECT user_id, count(*) AS n,
           CAST(sum(c) AS BIGINT) AS s,
           CAST(sum(c * c) AS BIGINT) AS ss,
           {aggs}
          FROM l GROUP BY user_id)
    SELECT user_id, n,
           {acfs}
    FROM a
"""


ORACLES_TS["acf"] = _acf_sql()

ORACLES_TS["perm_entropy"] = f"""
    WITH {_ZF},
    t AS (SELECT user_id,
                 c::DOUBLE AS a,
                 lead(c, 1) OVER w::DOUBLE AS b,
                 lead(c, 2) OVER w::DOUBLE AS cc
          FROM y WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
    pat AS (SELECT user_id,
                   CASE WHEN a <= b AND b <= cc THEN 0
                        WHEN a <= cc AND cc < b THEN 1
                        WHEN b < a AND a <= cc THEN 2
                        WHEN b <= cc AND cc < a THEN 3
                        WHEN cc < a AND a <= b THEN 4
                        ELSE 5 END AS p
            FROM t WHERE cc IS NOT NULL),
    cnt AS (SELECT user_id, p, count(*) AS cnt FROM pat GROUP BY 1, 2),
    pr AS (SELECT user_id,
                  cnt / CAST(sum(cnt) OVER (PARTITION BY user_id) AS DOUBLE) AS prob
           FROM cnt)
    SELECT user_id, round(sum(-prob * ln(prob)), 9) AS perm_entropy
    FROM pr GROUP BY user_id
"""

ORACLES_TS["pivot_event_types"] = """
    SELECT user_id,
           CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
"""

QUERIES_TS = {
    "sessionize": q_sessionize,
    "acf": q_acf,
    "perm_entropy": q_perm_entropy,
    "pivot_event_types": q_pivot_event_types,
}
