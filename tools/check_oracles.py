"""Local replica of the driver's correctness check: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.9g}"
    return str(val)


def main():
    import __spark_entry__ as entry_mod
    from graph_embeddings_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sys.argv[1:] or list(qs)
    failures = []
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sset = sorted(
                tuple(canon(r[c]) for c in scols) for r in srows
            )
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}", flush=True)
            continue
        spark_sec = time.monotonic() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{spark_sec:.2f}s]", flush=True)
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        dcols = sorted(ddf.columns)
        dset = sorted(
            tuple(canon(v) for v in row)
            for row in ddf[dcols].itertuples(index=False, name=None)
        )
        if scols != dcols:
            failures.append(name)
            print(f"FAIL  {name}: cols spark={scols} duckdb={dcols}")
        elif len(sset) != len(dset):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(sset)} duckdb={len(dset)}")
        elif sset != dset:
            failures.append(name)
            bad = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch at {bad}")
            for i in bad:
                print(f"      spark  {sset[i]}")
                print(f"      duckdb {dset[i]}")
        else:
            total_sec = time.monotonic() - t0
            print(
                f"OK    {name}: {len(sset)} rows"
                f" [spark {spark_sec:.2f}s, +oracle {total_sec - spark_sec:.2f}s]",
                flush=True,
            )
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracles match")


if __name__ == "__main__":
    main()
