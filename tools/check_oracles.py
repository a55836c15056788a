"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, compares row count, column names, and an
order-insensitive canonical value rendering. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].map(lambda x: "NULL" if pd.isna(x) else repr(float(x)))
        else:
            df[c] = df[c].map(lambda x: "NULL" if pd.isna(x) else str(x))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as E
    from metis_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    t_all = time.monotonic()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        status = "?"
        t_q = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
            if sql is None:
                print(f"{name:28s} ROWS-ONLY rows={len(got)} "
                      f"[{time.monotonic() - t_q:.1f}s]")
                continue
            exp = con.sql(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                status = f"SCHEMA-MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            elif len(g) != len(e):
                status = f"ROWCOUNT spark={len(g)} duck={len(e)}"
            elif not g.equals(e):
                diff = (g != e).any(axis=1)
                idx = diff[diff].index[:3]
                status = "VALUES differ, e.g.\n" + "\n".join(
                    f"  spark={g.loc[i].to_dict()}\n   duck={e.loc[i].to_dict()}" for i in idx
                )
            else:
                status = f"OK rows={len(g)}"
        except Exception as ex:  # noqa: BLE001
            status = f"ERROR {type(ex).__name__}: {str(ex)[:300]}"
        print(f"{name:28s} {status} [{time.monotonic() - t_q:.1f}s]")
        if not status.startswith("OK"):
            failures.append(name)
    print(f"\nTOTAL WALL: {time.monotonic() - t_all:.1f}s")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
