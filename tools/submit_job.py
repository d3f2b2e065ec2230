"""spark-submit entry point for the rollup pipeline (north rule: "runs
via spark-submit --py-files on multi-executor clusters").

The engine package arrives on the executors via ``--py-files
tsforge_spark.zip`` (see tools/submit_example.sh) — this script never
touches sys.path; it imports the package exactly the way a cluster job
would, and the pandas-UDF closures it ships resolve on executor python
workers from the submitted zip.

Usage (any Spark master — YARN / k8s / standalone / local-cluster):

    spark-submit --master <master> --py-files tsforge_spark.zip \
        tools/submit_job.py <store_dir> <out_dir> [n_convs]

With an existing SnapshotStore at <store_dir> it runs the pipeline
incrementally; with an empty/missing store it first generates a small
deterministic transcript snapshot (n_convs, default 500) so the example
is self-contained.  Prints one JSON line with the run result.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import SparkSession

from tsforge_spark.plans.pipeline import RollupPipeline
from tsforge_spark.sources.snapshots import SnapshotStore


def main() -> None:
    store_dir = sys.argv[1]
    out_dir = sys.argv[2]
    n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    # spark-submit owns master/deploy-mode/confs; the app only names
    # itself and sets engine-required SQL confs (a cluster submit passes
    # the rest via --conf, see tools/submit_example.sh)
    spark = SparkSession.builder.appName("tsforge-rollup").getOrCreate()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    store = SnapshotStore(store_dir)
    if store.last_snapshot_id() == 0:
        from tsforge_spark.fixtures import make_transcripts, transcripts_to_spark

        store.append(
            transcripts_to_spark(spark, make_transcripts(n_convs, seed=42))
        )

    pipe = RollupPipeline(spark, store, out_dir)
    result = pipe.run()
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
