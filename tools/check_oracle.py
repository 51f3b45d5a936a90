#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against views over the sfDir
parquet tables, loads the Spark parquet output from <verifyOutDir>/<name>,
and compares schema (column names), row count, and values exactly.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    return df[cols]


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a == b:
            return True
    except Exception:
        pass
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # Driver test data is one file per table; ScaleUp output is a
        # directory of part files — glob in that case.
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    # Resume support: CHECK_ORACLE_SKIP_LOG=<prior log> skips queries
    # that already printed PASS there (long 10x-gate runs survive
    # interruptions / twin-SQL fixes without redoing green queries).
    done = set()
    skip_log = os.environ.get("CHECK_ORACLE_SKIP_LOG")
    if skip_log and os.path.exists(skip_log):
        with open(skip_log) as f:
            for line in f:
                if line.startswith("PASS "):
                    done.add(line.split()[1])
        print(f"[resume] skipping {len(done)} already-passed queries")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name in done:
            n_pass += 1
            continue
        sql = oracle[name]
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        want_c, got_c = canon(want), canon(got)
        # The driver hashes rendered values, so an integral Spark column
        # vs a float64 oracle column (e.g. DuckDB SUM(BIGINT)->HUGEINT
        # ->float64 at the pandas boundary) hash-mismatches even when
        # the values compare equal. Mirror that strictness here.
        kind_bad = None
        for c in want_c.columns:
            wk, gk = want_c[c].dtype.kind, got_c[c].dtype.kind
            if {wk, gk} <= {"i", "u", "f"} and ("f" in (wk, gk)) != (wk == gk == "f"):
                kind_bad = (c, want_c[c].dtype, got_c[c].dtype)
                break
        if kind_bad:
            c, w, g = kind_bad
            print(f"FAIL {name}: dtype kind mismatch col={c} oracle={w} spark={g}")
            n_fail += 1
            continue
        bad = None
        for ci, c in enumerate(want_c.columns):
            wv, gv = want_c[c].tolist(), got_c[c].tolist()
            for ri in range(len(wv)):
                if not cell_eq(wv[ri], gv[ri]):
                    bad = (c, ri, wv[ri], gv[ri])
                    break
            if bad:
                break
        if bad:
            c, ri, w, g = bad
            print(f"FAIL {name}: value mismatch col={c} row={ri} oracle={w!r} spark={g!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
