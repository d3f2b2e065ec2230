"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same parquet, compare row count + column set + order-insensitive
values.  Floats are compared bitwise first (the goal), then with 1e-9
relative tolerance (to show how far off a near-miss is).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_object_dtype(s):
            # decimal.Decimal from DuckDB → float64
            try:
                df[c] = s.astype("float64")
            except (ValueError, TypeError):
                df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict:
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    res = {"name": name, "rows": (len(a), len(b)), "cols_match": list(a.columns) == list(b.columns)}
    if not res["cols_match"]:
        res["detail"] = f"cols spark={list(a.columns)} duck={list(b.columns)}"
        res["status"] = "SCHEMA-FAIL"
        return res
    if len(a) != len(b):
        res["status"] = "ROWCOUNT-FAIL"
        return res
    exact = True
    fuzzy = True
    worst = 0.0
    worst_col = None
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            an, bn = av.to_numpy(), bv.to_numpy(dtype="float64")
            # bitwise like the driver's hash: -0.0 != +0.0
            same = (
                (an == bn)
                & (np.signbit(an) == np.signbit(bn))
            ) | (np.isnan(an) & np.isnan(bn))
            if not same.all():
                exact = False
                with np.errstate(all="ignore"):
                    rel = np.abs(an - bn) / np.maximum(np.abs(bn), 1e-30)
                rel = np.where(same, 0, rel)
                m = np.nanmax(rel)
                if m > worst:
                    worst, worst_col = m, c
                if m > 1e-9:
                    fuzzy = False
        else:
            if not av.equals(bv):
                exact = fuzzy = False
                worst_col = c
                worst = float("inf")
    if exact:
        res["status"] = "EXACT"
    elif fuzzy:
        res["status"] = f"FUZZY({worst_col}:{worst:.2e})"
    else:
        res["status"] = f"VALUE-FAIL({worst_col}:{worst:.2e})"
    return res


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from tsforge_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:38s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:38s} rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:38s} DUCK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        res = compare(name, spark_pdf, duck_pdf)
        ok = res["status"] == "EXACT"
        if not ok:
            failures += 1
        print(
            f"{name:38s} {res['status']:24s} rows={res['rows'][0]}/{res['rows'][1]}"
            f" {time.time()-t0:.1f}s {res.get('detail','')}"
        )
    print(f"\n{'ALL EXACT' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
