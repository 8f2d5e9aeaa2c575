#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet (Spark result), runs <out>/oracle_sql.json's
SQL in DuckDB over the sf_dir parquet tables, sorts columns by name, and
compares row counts, dtypes, and values.
"""
import json, sys, glob, os, time
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
    # Local-gate accelerator (see ops.Dedup.preludeSetup): materialize the
    # MinHash chain once per scale as temp tables, then exact-text-rewrite
    # each consuming oracle to read them. Both sides of every rewrite rule
    # come from the same Scala constants, so the replace is safe; outputs
    # are bitwise-identical (the temp table holds exactly the CTE's rows).
    # GRAFT_NO_PRELUDE=1 disables the rewrite (the driver-equivalent slow
    # path) for spot-checking that both paths agree.
    rewrites = []
    prelude_path = os.path.join(out_dir, "oracle_prelude.json")
    if os.path.exists(prelude_path) and not os.environ.get("GRAFT_NO_PRELUDE"):
        pre = json.load(open(prelude_path))
        rewrites = pre["rewrites"]
        # Build the temp tables only if some checked oracle actually
        # contains a rewritable chain (an only=q45 run shouldn't pay it).
        if any(f in sql for sql in oracle.values() for f, _ in rewrites):
            t0 = time.time()
            for tname, tsql in pre["setup"]:
                con.execute(f"CREATE TEMP TABLE {tname} AS {tsql}")
            print(f"prelude: {len(pre['setup'])} chain tables "
                  f"materialized in {time.time()-t0:.1f}s")
        else:
            rewrites = []
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if rewrites:
            # Driver-equivalence lint: the driver runs the RAW
            # self-contained SQL, so parse+bind it here too even when the
            # accelerated path executes rewritten text. con.sql() binds
            # lazily (no execution), which catches exactly the failure
            # class the prelude used to mask — e.g. a consumer CTE name
            # colliding with the inlined chain's (r10: e9_bfs "Duplicate
            # CTE name f1", e9_link_pred "cand").
            try:
                con.sql(sql)
            except Exception as e:
                print(f"FAIL {name}: raw-sql lint: {e}"); n_fail += 1
                continue
        for f, t in rewrites:
            sql = sql.replace(f, t)
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
                # locally-green gate. NULL/NaN are compared as an isna MASK
                # first (pandas maps both to NaN in a float column, so the
                # mask is the only comparable signal), then every masked
                # cell's payload is canonicalized to +0.0 before viewing the
                # bits — a non-canonical NaN payload from either engine can
                # no longer produce a confusing bits-mismatch message.
                an, bn = a.isna().to_numpy(), b.isna().to_numpy()
                if not np.array_equal(an, bn):
                    i = int(np.nonzero(an != bn)[0][0])
                    bad = f"null[{c}] row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"
                    break
                u = np.uint64 if a.dtype.itemsize == 8 else np.uint32
                af = np.array(a.to_numpy(), copy=True)
                bf = np.array(b.to_numpy(), copy=True)
                af[an] = 0.0
                bf[bn] = 0.0
                av, bv = af.view(u), bf.view(u)
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
