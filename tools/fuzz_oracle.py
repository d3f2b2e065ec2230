"""Property-fuzz the engine against the DuckDB oracle (VERDICT r6 #7).

The 50 fixed catalog queries have been bitwise-EXACT four rounds
running — the remaining correctness risk is PARAMETER space, not the
recorded points.  This script draws random parameters for a family of
operator templates (bucket grain, window length, lag k, top-n, sample
modulus, z-threshold, fold grain, value predicate), builds the engine
plan AND the equivalent ANSI SQL from the same draw, and compares them
with the driver-gate semantics (tools/check_oracle.compare: row count +
column set + bitwise values, -0.0/NaN aware).

Every template follows the repo's exactness rules (memory:
pyspark-oracle-exactness): integer-cents sums, identical variance
formulas from integer partials, date_trunc (not window) bucketing,
(dayofweek+5)%7, explicit BIGINT casts on DuckDB sums.

Usage: python tools/fuzz_oracle.py [sf_dir] [n_draws] [seed]
Defaults: /root/testdata/sf0.001, 21 draws, seed 7.
"""

from __future__ import annotations

import random
import sys
import time

import duckdb

sys.path.insert(0, ".")

from tools.check_oracle import TABLES, compare  # noqa: E402

GRAINS = ["minute", "hour", "day"]


def t_bucket_rollup(rng: random.Random):
    g = rng.choice(GRAINS)
    lo = round(rng.uniform(0.0, 40.0), 2)
    name = f"bucket_rollup(grain={g},value>{lo})"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
            F.col("value") > lo
        )
        return ev.groupBy(
            "user_id", F.date_trunc(g, "ts").alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )

    sql = f"""
        SELECT user_id, date_trunc('{g}', ts) AS bucket,
               count(*) AS n_events,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               min(value) AS vmin, max(value) AS vmax
        FROM events WHERE value > {lo} GROUP BY 1, 2
    """
    return name, spark_fn, sql


def t_fold_exactness(rng: random.Random):
    coarse = rng.choice(["hour", "day"])
    name = f"fold_exactness(minute->{coarse})"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        fine = ev.groupBy(
            "user_id", F.date_trunc("minute", "ts").alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        # fold the partials — must equal the direct coarse rollup
        return fine.groupBy(
            "user_id", F.date_trunc(coarse, "bucket").alias("bucket")
        ).agg(
            F.sum("n").alias("n_events"),
            F.sum("c").alias("sum_cents"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )

    sql = f"""
        SELECT user_id, date_trunc('{coarse}', ts) AS bucket,
               count(*) AS n_events,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY 1, 2
    """
    return name, spark_fn, sql


def t_rolling(rng: random.Random):
    k = rng.randint(2, 10)
    name = f"rolling(k={k})"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        h = ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("bucket")
        ).agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            )
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("bucket")
            .rowsBetween(-(k - 1), 0)
        )
        return h.select(
            "user_id",
            "bucket",
            F.sum("sum_cents").over(w).alias("roll_sum"),
            F.max("sum_cents").over(w).alias("roll_max"),
            F.count(F.lit(1)).over(w).alias("roll_n"),
        )

    sql = f"""
        WITH h AS (
          SELECT user_id, date_trunc('hour', ts) AS bucket,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                     AS sum_cents
          FROM events GROUP BY 1, 2)
        SELECT user_id, bucket,
               CAST(sum(sum_cents) OVER w AS BIGINT) AS roll_sum,
               max(sum_cents) OVER w AS roll_max,
               count(*) OVER w AS roll_n
        FROM h
        WINDOW w AS (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)
    """
    return name, spark_fn, sql


def t_lag_diff(rng: random.Random):
    k = rng.randint(1, 5)
    name = f"lag_diff(k={k})"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        cents = F.round(F.col("value") * 100).cast("long")
        return ev.select(
            "user_id",
            "event_id",
            (cents - F.lag(cents, k).over(w)).alias(f"diff_{k}"),
        )

    sql = f"""
        SELECT user_id, event_id,
               CAST(round(value*100) AS BIGINT)
                 - lag(CAST(round(value*100) AS BIGINT), {k}) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id)
                 AS diff_{k}
        FROM events
    """
    return name, spark_fn, sql


def t_topn(rng: random.Random):
    n = rng.randint(1, 8)
    name = f"topn(n={n})"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        w = Window.partitionBy("user_id").orderBy(
            F.desc("value"), F.asc("event_id")
        )
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
            .select("user_id", "event_id", "value", "rn")
        )

    sql = f"""
        SELECT user_id, event_id, value, rn FROM (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= {n}
    """
    return name, spark_fn, sql


def t_det_sample(rng: random.Random):
    m = rng.choice([17, 23, 31, 41, 59, 73])
    name = f"det_sample(mod={m})"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        h = F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        return ev.filter(h % m == 0).select(
            "event_id", "user_id", "event_type", "value"
        )

    sql = f"""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
              % {m} = 0
    """
    return name, spark_fn, sql


def t_zscore(rng: random.Random):
    z = rng.choice([1.5, 2.0, 2.5, 3.0])
    name = f"zscore(z={z})"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        cents = F.round(F.col("value") * 100).cast("long")
        stats = ev.agg(
            F.sum(cents).alias("s"),
            F.sum(cents * cents).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        s, s2, n = stats["s"], stats["s2"], stats["n"]
        mean = s / 100.0 / n
        var = (s2 / 10000.0 - (s / 100.0) * (s / 100.0) / n) / (n - 1)
        return (
            ev.withColumn(
                "is_outlier",
                (
                    F.abs(F.col("value") - F.lit(mean))
                    > z * F.lit(var) ** 0.5
                ).cast("int"),
            )
            .groupBy("event_type")
            .agg(
                F.sum("is_outlier").alias("n_outliers"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    # identical integer-partial formula inline on the DuckDB side
    sql = f"""
        WITH p AS (
          SELECT CAST(sum(c) AS BIGINT) AS s,
                 CAST(sum(c*c) AS BIGINT) AS s2,
                 count(*) AS n
          FROM (SELECT CAST(round(value*100) AS BIGINT) AS c FROM events)),
        m AS (SELECT s/100.0/n AS mean,
                     sqrt((s2/10000.0 - (s/100.0)*(s/100.0)/n)/(n-1)) AS sd
              FROM p)
        SELECT event_type,
               CAST(sum(CASE WHEN abs(value - m.mean) > {z} * m.sd
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               count(*) AS n
        FROM events, m GROUP BY event_type
    """
    return name, spark_fn, sql


def t_sessionize(rng: random.Random):
    gap_min = rng.choice([5, 10, 30, 60, 120])
    name = f"sessionize(gap={gap_min}m)"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from tsforge_spark.operators.sessions import sessionize

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        sess = sessionize(
            ev, "user_id", "ts", gap=f"{gap_min} minutes",
            order_cols=["ts", "event_id"],
        )
        per = sess.groupBy("user_id", "session_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                (F.unix_micros(F.max("ts").cast("timestamp"))
                 - F.unix_micros(F.min("ts").cast("timestamp"))) / 1e6
            ).alias("dur_s"),
        )
        return per.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.sum("dur_s"), 6).alias("total_session_sec"),
        )

    sql = f"""
        WITH s AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts > lag(ts) OVER w + INTERVAL {gap_min} MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sid AS (SELECT user_id, ts,
                       sum(new_sess) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - 1 AS session_id
                FROM s),
        per AS (SELECT user_id, session_id, count(*) AS n_events,
                       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6 AS dur_s
                FROM sid GROUP BY 1, 2)
        SELECT user_id, count(*) AS n_sessions,
               CAST(max(n_events) AS BIGINT) AS max_session_events,
               round(sum(dur_s), 6) AS total_session_sec
        FROM per GROUP BY user_id
    """
    return name, spark_fn, sql


def t_gapfill_locf(rng: random.Random):
    g = rng.choice(["hour", "day"])
    name = f"gapfill_locf(grain={g})"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        h = ev.groupBy(
            "user_id", F.date_trunc(g, "ts").alias("bucket")
        ).agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            )
        )
        span = h.groupBy("user_id").agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        )
        grid = span.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(lo, hi, interval 1 {g})")
            ).alias("bucket"),
        )
        j = grid.join(h, ["user_id", "bucket"], "left")
        w = (
            Window.partitionBy("user_id")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return j.select(
            "user_id",
            "bucket",
            F.last("sum_cents", ignorenulls=True).over(w).alias(
                "filled_cents"
            ),
        )

    sql = f"""
        WITH h AS (
          SELECT user_id, date_trunc('{g}', ts) AS bucket,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                     AS sum_cents
          FROM events GROUP BY 1, 2),
        s AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
              FROM h GROUP BY 1),
        g AS (SELECT user_id,
                     unnest(generate_series(lo, hi, INTERVAL 1 {g.upper()}))
                         AS bucket
              FROM s),
        j AS (SELECT g.user_id, g.bucket, h.sum_cents
              FROM g LEFT JOIN h
                ON g.user_id = h.user_id AND g.bucket = h.bucket)
        SELECT user_id, bucket,
               last_value(sum_cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled_cents
        FROM j
    """
    return name, spark_fn, sql


def t_dow_profile(rng: random.Random):
    agg_type = rng.choice(["n", "cents"])
    name = f"dow_profile(measure={agg_type})"

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        dow = ((F.dayofweek("ts") + 5) % 7).cast("int")
        base = ev.groupBy("event_type", dow.alias("dow"))
        if agg_type == "n":
            return base.agg(F.count(F.lit(1)).alias("m"))
        return base.agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("m")
        )

    measure = (
        "count(*)" if agg_type == "n"
        else "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)"
    )
    sql = f"""
        SELECT event_type, CAST(isodow(ts) - 1 AS INT) AS dow,
               {measure} AS m
        FROM events GROUP BY 1, 2
    """
    return name, spark_fn, sql


TEMPLATES = [
    t_bucket_rollup,
    t_fold_exactness,
    t_rolling,
    t_lag_diff,
    t_topn,
    t_det_sample,
    t_zscore,
    t_sessionize,
    t_gapfill_locf,
    t_dow_profile,
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_draws = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    rng = random.Random(seed)

    from tsforge_spark.session import get_spark

    spark = get_spark("fuzz-oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    failures = 0
    for i in range(n_draws):
        name, fn, sql = TEMPLATES[i % len(TEMPLATES)](rng)
        t0 = time.time()
        spark_pdf = fn(spark, sf_dir).toPandas()
        duck_pdf = con.sql(sql).df()
        res = compare(name, spark_pdf, duck_pdf)
        ok = res["status"] == "EXACT"
        if not ok:
            failures += 1
        print(
            f"draw {i:02d} {name:42s} {res['status']:20s}"
            f" rows={res['rows'][0]}/{res['rows'][1]}"
            f" {time.time() - t0:.1f}s {res.get('detail', '')}"
        )
    print(
        f"\nseed={seed} draws={n_draws} "
        f"{'ALL EXACT' if failures == 0 else f'{failures} FAILURES'}"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
