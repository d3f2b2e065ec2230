"""Round-8 pipeline A/B harness: run RollupPipeline first-run builds
against a pre-generated store with config/kwarg variants, print stage
timings.  Usage: python tools/pipe_ab.py <store_dir> <variant> [reps]
Variants: base, ccw (maxConcurrentOutputFileWriters), sortpfx
(sort_prefix=(day,bucket_id)), ccw_sortpfx, zstd_shuffle."""
import json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _steal_begin, _steal_pct  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))


def run_once(store_dir, extra_confs, pipe_kwargs):
    from tsforge_spark.plans.pipeline import RollupPipeline
    from tsforge_spark.session import get_spark
    from tsforge_spark.sources.snapshots import SnapshotStore

    work = tempfile.mkdtemp(prefix="pipe_ab_")
    spark = get_spark(f"pipe-ab-{CPUS}", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS * 2, 16),
                      extra_confs=extra_confs or None)
    try:
        pipe = RollupPipeline(
            spark, SnapshotStore(store_dir), os.path.join(work, "out"),
            n_buckets=max(CPUS * 2, 16), unique_key_check="trust",
            **pipe_kwargs,
        )
        st0 = _steal_begin()
        res = pipe.run()
        res["steal_pct"] = _steal_pct(st0)
        return {k: res[k] for k in
                ("turns", "wall_sec", "turns_per_sec", "stage_sec",
                 "steal_pct")}
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


VARIANTS = {
    "base": ({}, {}),
    "ccw": ({"spark.sql.maxConcurrentOutputFileWriters": "48"}, {}),
    "zstd_shuffle": ({"spark.io.compression.codec": "zstd"}, {}),
    "sortpfx": ({}, {}),
    "daykey": ({}, {}),
    "ccw16": ({"spark.sql.maxConcurrentOutputFileWriters": "16"}, {}),
}


def _patch_daykey():
    """Monkeypatch salted_layout to include day in the repartition key
    (900 distinct keys over 64 partitions instead of 64-into-64 hash
    collisions) for the A/B."""
    import pyspark.sql.functions as F

    import tsforge_spark.operators.skew as skew

    def patched(df, key="conv_id", order_col="turn_idx", n_buckets=32,
                hot_threshold=100_000, block_size=50_000, hot_ids=None,
                sort_prefix=()):
        if hot_ids is None:
            hot = skew.hot_keys(df, key, hot_threshold).withColumn(
                "_hot", F.lit(1))
            out = df.join(F.broadcast(hot), key, "left")
            is_hot = F.col("_hot").isNotNull()
        else:
            out = df
            is_hot = F.col(key).isin(hot_ids) if hot_ids else F.lit(False)
        salt = F.when(
            is_hot, (F.col(order_col).cast("long") / F.lit(block_size))
            .cast("int")).otherwise(F.lit(0))
        out = out.withColumn(
            "bucket_id",
            F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int"),
        ).withColumn("salt", salt)
        if hot_ids is None:
            out = out.drop("_hot")
        return out.repartition("day", "bucket_id", "salt").sortWithinPartitions(
            *sort_prefix, F.xxhash64(key), key, "ts", order_col
        )

    skew.salted_layout = patched


def _patch_sortpfx():
    """Monkeypatch salted_layout to prefix the write's partition columns
    into the layout sort (single-sort write path) for the A/B."""
    import tsforge_spark.operators.skew as skew

    orig = skew.salted_layout

    def patched(df, **kw):
        kw.setdefault("sort_prefix", ("day", "bucket_id"))
        return orig(df, **kw)

    skew.salted_layout = patched

if __name__ == "__main__":
    store = sys.argv[1]
    variant = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    confs, kw = VARIANTS[variant]
    if variant == "sortpfx":
        _patch_sortpfx()
    if variant == "daykey":
        _patch_daykey()
    outs = []
    for i in range(reps):
        r = run_once(store, confs, kw)
        r["variant"] = variant
        print(json.dumps(r), flush=True)
        outs.append(r)
    best = max(outs, key=lambda r: r["turns_per_sec"])
    print(json.dumps({"BEST": variant, **best}), flush=True)
