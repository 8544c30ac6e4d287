"""DRIVER-STRICT local correctness gate (r05 verdict item 2): the
round-5 judge proved scripts/check_contract.py is weaker than the
driver's hash — it only stringified object columns and compared with
check_dtype=False, so an int64 engine column silently matched a
float64 oracle column (events_time_rollup escaped).

This replica stringifies EVERY column on BOTH sides (integers never
round-trip through float; floats go through Python repr of the exact
double) and compares the sorted row multisets — the same discipline a
stringifying hasher applies.  A dtype-family mismatch (int vs float)
therefore fails here exactly as it fails at the driver.

Usage: python scripts/strict_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from workstealing_spatial_join_spark.session import get_spark  # noqa: E402
from workstealing_spatial_join_spark.sources.tables import TABLES  # noqa: E402


def stringify(df: pd.DataFrame) -> pd.DataFrame:
    """Every column to its canonical string form: the way a
    stringifying hasher sees the frame.  int64 stays integer-formatted,
    float64 goes through Python float repr (so 118131.0 != 118131),
    bytes hex-encode, None/NaN become a fixed token."""
    out = {}
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.map(
                lambda v: "NULL" if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_integer_dtype(col):
            out[c] = col.map(lambda v: "NULL" if pd.isna(v) else str(int(v)))
        elif pd.api.types.is_bool_dtype(col):
            out[c] = col.map(lambda v: "NULL" if pd.isna(v) else str(bool(v)))
        else:
            def conv(v):
                if v is None or (np.isscalar(v) and pd.isna(v)):
                    return "NULL"
                if isinstance(v, (bytes, bytearray)):
                    return bytes(v).hex()
                if isinstance(v, float):
                    return repr(v)
                if isinstance(v, (list, np.ndarray)):
                    return "[" + ",".join(conv(x) for x in v) + "]"
                return str(v)
            out[c] = col.map(conv)
    res = pd.DataFrame(out)
    res = res[sorted(res.columns)]
    return res.sort_values(by=list(res.columns)).reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("strict-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
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
        want.columns = [str(c).lower() for c in want.columns]
        got.columns = [str(c).lower() for c in got.columns]
        # dtype-FAMILY check: int engine column must meet int oracle
        # column (driver hash stringifies, so 1 vs 1.0 is a fail)
        fam_bad = []
        for c in sorted(set(got.columns) & set(want.columns)):
            gi = pd.api.types.is_integer_dtype(got[c])
            gf = pd.api.types.is_float_dtype(got[c])
            wi = pd.api.types.is_integer_dtype(want[c])
            wf = pd.api.types.is_float_dtype(want[c])
            if (gi and wf) or (gf and wi):
                fam_bad.append(c)
        g, w = stringify(got), stringify(want)
        ok = (
            len(g) == len(w)
            and list(g.columns) == list(w.columns)
            and not fam_bad
            and g.equals(w)
        )
        if ok:
            print(f"  {name:32s} OK   {len(g)} rows  ({dt:.1f}s)")
        else:
            failures.append(name)
            why = []
            if len(g) != len(w):
                why.append(f"rows {len(g)} vs {len(w)}")
            if list(g.columns) != list(w.columns):
                why.append(f"cols {list(g.columns)} vs {list(w.columns)}")
            if fam_bad:
                why.append(f"dtype family {fam_bad}")
            if not why:
                neq = (g != w).any(axis=0)
                why.append(f"values differ in {list(g.columns[neq])}")
                for c in list(g.columns[neq])[:2]:
                    d = g[c] != w[c]
                    i = int(np.argmax(d.to_numpy()))
                    why.append(f"  {c}[{i}]: {g[c][i]!r} vs {w[c][i]!r}")
            print(f"  {name:32s} FAIL {'; '.join(why)}")
    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
