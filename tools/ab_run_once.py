"""One pipeline run against a shared store, for the r4-vs-r5 A/B.

Usage:  PYTHONPATH=<version_repo_dir> python tools/ab_run_once.py \
            <store_dir> <out_dir> <cores>

Prints one JSON line with wall_sec / turns_per_sec / stage_sec so the
caller (tools/ab_pipeline.sh loop) can attribute per-stage deltas between
two code versions run back-to-back on the same box and the same input.
"""
import json
import os
import shutil
import sys

store_dir, out_dir, cores = sys.argv[1], sys.argv[2], int(sys.argv[3])

from tsforge_spark.plans.pipeline import RollupPipeline  # noqa: E402
from tsforge_spark.session import get_spark  # noqa: E402
from tsforge_spark.sources.snapshots import SnapshotStore  # noqa: E402

shutil.rmtree(out_dir, ignore_errors=True)
spark = get_spark(
    f"tsforge-ab-{cores}", master=f"local[{cores}]",
    shuffle_partitions=max(cores * 2, 16),
)
try:
    pipe = RollupPipeline(
        spark, SnapshotStore(store_dir), out_dir,
        n_buckets=max(cores * 2, 16), unique_key_check="trust",
    )
    res = pipe.run()
    print(json.dumps({
        "version": os.environ.get("PYTHONPATH", "?"),
        "turns": res.get("turns"),
        "wall_sec": round(res.get("wall_sec", 0.0), 2),
        "turns_per_sec": round(res.get("turns_per_sec", 0.0), 1),
        "stage_sec": res.get("stage_sec", {}),
    }))
finally:
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)
