#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name>/ spark-parquet result, runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s
tables, and compares (columns sorted by name, rows sorted, exact values).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append(("f", repr(v)))
            else:
                rr.append((type(v).__name__, str(v)))
        out.append(tuple(rr))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_df()
        if name not in oracle:
            print(f"[skip] {name}: rows-only ({len(got)} rows)"
                  + ("  !! EMPTY" if len(got) == 0 else ""))
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        # The driver's comparator lexsorts the frame; array-typed cells crash
        # it ("unhashable type: numpy.ndarray"). Fail loudly here so the gap
        # between this selfcheck and the driver can't reopen (round-4 lesson).
        import numpy as _np
        arr_cols = [c for c in got.columns
                    if got[c].map(lambda v: isinstance(v, _np.ndarray)).any()]
        if arr_cols:
            print(f"[FAIL] {name}: array-typed columns {arr_cols} would "
                  f"crash the driver comparator — render as strings/rows")
            n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        g = norm(got.itertuples(index=False, name=None))
        e = norm(exp.itertuples(index=False, name=None))
        if len(g) != len(e):
            print(f"[FAIL] {name}: rowcount {len(g)} vs {len(e)}"); n_fail += 1
            continue
        if g != e:
            bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"[FAIL] {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"    spark : {g[i]}")
                print(f"    oracle: {e[i]}")
            n_fail += 1; continue
        print(f"[ ok ] {name}: {len(g)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
