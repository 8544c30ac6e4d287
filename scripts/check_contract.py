"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 and compare against
oracle_sql() via DuckDB — row count, schema width, and
order-insensitive exact values (columns sorted by name).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from workstealing_spatial_join_spark.session import get_spark  # noqa: E402
from workstealing_spatial_join_spark.sources.tables import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()

    print(f"entry() smoke: {E.entry(spark).count()} rows")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        got = fn(spark, sf).toPandas()
        dt = time.time() - t0
        if name not in oracles:
            print(f"  {name:32s} rows-only: {len(got)} rows  ({dt:.1f}s)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        g, w = normalize(got), normalize(want)
        ok_rows = len(g) == len(w)
        ok_cols = list(g.columns) == [c.lower() for c in map(str, w.columns)] or \
            list(map(str.lower, g.columns)) == list(map(str.lower, map(str, w.columns)))
        ok_vals = False
        if ok_rows and ok_cols:
            w.columns = g.columns
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[:6]
                print(f"  {name:32s} VALUE MISMATCH ({dt:.1f}s)")
                for line in msg:
                    print("      ", line)
        status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
            if not ok_rows:
                print(f"  {name:32s} ROWS {len(g)} vs {len(w)}")
            elif not ok_cols:
                print(f"  {name:32s} COLS {list(g.columns)} vs {list(w.columns)}")
        else:
            print(f"  {name:32s} OK   {len(g)} rows  ({dt:.1f}s)")
    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
