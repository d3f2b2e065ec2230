"""Round-8 profiling harness (bench.py is FROZEN for measurement; this
file exists so optimization work can time individual catalog queries at
any SF with the same methodology, capture plans, and isolate compute
with the noop sink — guide §1.1/§1.4/§1.5).

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 [--queries a,b,c]
      [--passes 2] [--explain plans/r08] [--suffix _before] [--noop]

Prints one JSON line: {"queries": {name: best_sec}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write instead of count()")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from bench import _steal_begin, _steal_pct, _warm_jvm
    from tsforge_spark.catalog import QUERIES
    from tsforge_spark.session import get_spark

    names = [q for q in args.queries.split(",") if q] or list(QUERIES)
    spark = get_spark("tsforge-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    timings: dict[str, float] = {}
    st0 = _steal_begin()
    try:
        if not args.no_warm:
            _warm_jvm(spark, args.sf)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            for name in names:
                df = QUERIES[name](spark, args.sf)
                with open(os.path.join(
                        args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        for _ in range(args.passes):
            for name in names:
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                df = QUERIES[name](spark, args.sf)
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                dt = round(time.time() - t0, 3)
                if name not in timings or dt < timings[name]:
                    timings[name] = dt
                spark.sparkContext.setJobDescription(None)
                gc.collect()
    finally:
        steal = _steal_pct(st0)
        spark.stop()
    print(json.dumps({"queries": timings, "sf_dir": args.sf,
                      "sum_sec": round(sum(timings.values()), 2),
                      "noop": bool(args.noop), "steal_pct": steal}))


if __name__ == "__main__":
    main()
