#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB oracle gate.

NOT part of the engine (the Scala library has no Python dependency) —
this mirrors what the driver does with Verify's output so oracle
mismatches are caught before a round ends:
  1. register each testdata parquet as a view named after the table,
  2. run every SQL in <outDir>/oracle_sql.json,
  3. compare to the Spark result parquet at <outDir>/<name>/ with
     columns sorted by name and rows sorted by all columns, exact match.

Usage: oracle_check.py [sfDir] [outDir]
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships flat files; Spark-written corpora
        # (e.g. the synthetic sf1 tree) are part-file directories
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    failed_names = set()
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no Spark output")
            failures += 1
            failed_names.add(name)
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df())
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            failed_names.add(name)
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            failed_names.add(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            failed_names.add(name)
            continue
        # Dtype-strict: the driver hashes typed values, so int64 vs
        # float64 (e.g. DuckDB HUGEINT from SUM(BIGINT) → pandas float)
        # is a failure even when Python == says the values are equal.
        badtype = [(c, str(got[c].dtype), str(want[c].dtype))
                   for c in got.columns if got[c].dtype != want[c].dtype]
        if badtype:
            c, g, w = badtype[0]
            print(f"FAIL {name}: dtype col={c} spark={g} oracle={w}")
            failures += 1
            failed_names.add(name)
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                same = (x == y) or (
                    isinstance(x, float) and isinstance(y, float)
                    and math.isnan(x) and math.isnan(y)) or (
                    x is None and y is None) or (
                    # NaT / None / nan across object+datetime cols:
                    # pandas NaT != NaT, so compare NA-ness explicitly
                    not isinstance(x, (list, tuple))
                    and not isinstance(y, (list, tuple))
                    and pd.isna(x) is True and pd.isna(y) is True)
                if not same:
                    mismatch = (c, i, x, y)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col={c} row={i} spark={x!r} oracle={y!r}")
            failures += 1
            failed_names.add(name)
        else:
            print(f"OK   {name}: {len(got)} rows")
    # surface Verify's machine-readable failure markers — a rows-only
    # query (no oracle entry) that failed its enforced self-verdict
    # leaves <name>._ERROR, which the oracle loop above never visits.
    # A failed ORACLE query usually also leaves a marker; skip it only
    # if the loop above ACTUALLY counted that query as a failure — a
    # marker whose query compared green means the output dir held
    # stale parquet from a previous run (Verify died before its
    # overwrite), and silently discarding it would be a false green.
    marker_failures = 0
    for marker in sorted(glob.glob(f"{outdir}/*._ERROR")):
        name = os.path.basename(marker)[:-len("._ERROR")]
        if name in failed_names:
            continue
        with open(marker) as fh:
            print(f"FAIL {name}: {fh.read().strip()}")
        marker_failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries match")
    failures += marker_failures
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
