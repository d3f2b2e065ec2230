"""Cluster entry point for the rollup pipeline.

Run via spark-submit (the north-rule deployment shape)::

    bash tools/package_pyfiles.sh          # builds dist/tsforge_spark.zip
    spark-submit --py-files dist/tsforge_spark.zip \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        tools/submit_rollup.py --store /path/to/snapshot-store \
        --out /path/to/engine-output [--n-buckets 256]

On a cluster the SparkSession comes from spark-submit's conf (master,
executors); locally this falls back to ``local[*]``.  The job is
incremental + resumable: re-submitting after failure or new snapshots
continues from the checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local-mode convenience: when run as a plain script, python puts tools/
# on sys.path, not the repo root; on a cluster --py-files handles this
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True, help="snapshot store directory")
    p.add_argument("--out", required=True, help="engine output directory")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument(
        "--retention", default=None,
        help="per-tier max age in days after the rollup, e.g. "
             "'1m=30,1h=180' (omitted tiers are kept forever)",
    )
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from tsforge_spark.plans.pipeline import RollupPipeline
    from tsforge_spark.session import ENGINE_CONFS
    from tsforge_spark.sources.snapshots import SnapshotStore

    builder = SparkSession.builder.appName("tsforge-rollup")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    pipe = RollupPipeline(
        spark, SnapshotStore(args.store), args.out, n_buckets=args.n_buckets
    )
    result = pipe.run()
    if args.retention:
        policy = {
            k: int(v)
            for k, v in (kv.split("=") for kv in args.retention.split(","))
        }
        result["retention"] = pipe.enforce_retention(policy)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
