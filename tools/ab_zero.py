"""A/B the zero-fill strategies for the catalog consumers, isolated.

Usage: python tools/ab_zero.py SF_DIR
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tsforge_spark.catalog import _hourly
from tsforge_spark.operators.gapfill import complete_grid, zero_filled_series
from tsforge_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))


def zf_new(spark, sf_dir):
    h = _hourly(spark, sf_dir).select("user_id", "bucket", "sum_cents")
    return zero_filled_series(h, "user_id", "bucket", "sum_cents", "1h").select(
        "user_id", "bucket", F.col("sum_cents").alias("c"))


def zf_old(spark, sf_dir):
    h = _hourly(spark, sf_dir).select("user_id", "bucket", "sum_cents")
    grid = complete_grid(h, "user_id", "bucket", "1h")
    return grid.join(h, ["user_id", "bucket"], "left").select(
        "user_id", "bucket", F.coalesce("sum_cents", F.lit(0)).alias("c"))


def streaks(y):
    w = Window.partitionBy("user_id").orderBy("bucket")
    pos = y.withColumn("pos", F.row_number().over(w))
    runs = (
        pos.withColumn("z", (F.col("c") == 0).cast("int"))
        .withColumn("grp", F.col("pos") - F.sum("z").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return runs.groupBy("user_id").agg(F.max("pos").alias("n"))


def main():
    sf_dir = sys.argv[1]
    spark = get_spark("ab-zero", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    from tsforge_spark.session import warm_start
    warm_start(spark, tiny_parquet=f"{sf_dir}/region.parquet")
    for name, fn in [("new", zf_new), ("old", zf_old)] * 3:
        t0 = time.time()
        df = streaks(fn(spark, sf_dir))
        n = df.count()
        print(f"{name}: {time.time()-t0:.2f}s rows={n}", flush=True)
    # raw zero-fill only (count of dense rows)
    for name, fn in [("new_raw", zf_new), ("old_raw", zf_old)] * 3:
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        print(f"{name}: {time.time()-t0:.2f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
