#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet (Spark result), runs <out>/oracle_sql.json's
SQL in DuckDB over the sf_dir parquet tables, sorts columns by name, and
compares row counts, dtypes, and values.
"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)].reset_index(drop=True)
        want = want[sorted(want.columns)].reset_index(drop=True)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype) != str(b.dtype):
                bad = f"dtype[{c}] {a.dtype} vs {b.dtype}"; break
            if a.dtype.kind == "f":
                # BITWISE float compare, mirroring the driver's raw-bit hash.
                # A 1e-9 (or even exact ==) value compare treats -0.0 == +0.0
                # and let a signed-zero red survive rounds 6 AND 7 behind a
                # locally-green gate. NULL -> NaN has one canonical bit
                # pattern from both parquet readers, so NaN==NaN for free.
                u = np.uint64 if a.dtype.itemsize == 8 else np.uint32
                av, bv = a.to_numpy().view(u), b.to_numpy().view(u)
                ok = np.array_equal(av, bv)
                if not ok:
                    i = int(np.nonzero(av != bv)[0][0])
                    bad = (f"bits[{c}] row {i}: {a.iloc[i]!r} ({av[i]:#018x}) "
                           f"vs {b.iloc[i]!r} ({bv[i]:#018x})")
                    break
            else:
                ok = a.fillna("\0").equals(b.fillna("\0")) if a.dtype == object else a.equals(b)
                if not ok:
                    diff = (a != b) if a.dtype != object else (a.fillna("\0") != b.fillna("\0"))
                    i = diff.idxmax()
                    bad = f"value[{c}] row {i}: {a[i]!r} vs {b[i]!r}"; break
        if bad:
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
