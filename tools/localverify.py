#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry over the same parquet tables
and compares with the Spark result parquet written by graft.Verify
(sorted columns by name, sorted rows, exact value match — mirrors the
driver's hash compare).

Usage: python3 tools/localverify.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Dev-tool only: the shipped Scala library has no python dependency.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return duckdb.query(f"SELECT * FROM read_parquet({files!r})").df()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sdf = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        s, o = canon(sdf), canon(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}"); n_bad += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_bad += 1; continue
        # dtype gate first: the driver hashes serialized values, so
        # int64 vs float64/object (e.g. DuckDB HUGEINT sums) hash-differs
        # even when numerically equal — a bare `a == b` would mask that.
        dt_bad = [(c, str(s[c].dtype), str(o[c].dtype))
                  for c in s.columns if s[c].dtype != o[c].dtype]
        if dt_bad:
            c, sd, od = dt_bad[0]
            print(f"FAIL {name}: dtype col {c} spark={sd} oracle={od}")
            n_bad += 1; continue
        # exact compare (driver hashes values); report first mismatch
        mismatch = None
        for c in s.columns:
            a, b = s[c], o[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                mismatch = (c, a[i], b[i]); break
        if mismatch:
            print(f"FAIL {name}: col {mismatch[0]} spark={mismatch[1]!r} oracle={mismatch[2]!r}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(s)} rows")
            n_ok += 1
    # queries without oracle: rows-only check
    for d in sorted(os.listdir(outdir)):
        if d not in oracle and os.path.isdir(os.path.join(outdir, d)):
            sdf = load_spark(outdir, d)
            n = 0 if sdf is None else len(sdf)
            print(f"INFO {d}: no oracle, {n} rows")
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
