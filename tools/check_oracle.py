#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For every query dir under <verifyOutDir>: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables = the
<sfDir> parquet files), sort columns by name and rows by all columns, and
compare values + dtypes. Mirrors the driver contract: aliased column names
must match, hash is order-insensitive only via explicit sorting.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # array-valued cells (e.g. a dumped histogram column) arrive as numpy
    # arrays, which are unhashable/unsortable — normalize to tuples so the
    # row sort and the elementwise compare both work
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob, os
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            failures += 1
            continue
        got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        if name not in oracle:
            print(f"ok   {name}: rows-only ({len(got)} rows, no oracle)")
            continue
        try:
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            failures += 1
            continue
        mismatch = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if str(a.dtype) != str(b.dtype):
                    mismatch.append(f"{c}: dtype {a.dtype} != {b.dtype}")
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    mismatch.append(f"{c}: row {i}: {a[i]!r} != {b[i]!r}")
            except Exception as e:
                mismatch.append(f"{c}: compare error {e}")
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch[:4]))
            failures += 1
        else:
            print(f"ok   {name}: {len(got)} rows match")
    print(f"\n{len(names) - failures}/{len(names)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
