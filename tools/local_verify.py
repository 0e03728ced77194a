#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/local_verify.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or runs it
with --run). Reads each <outDir>/<name> parquet (Spark result), executes
<outDir>/oracle_sql.json's SQL in DuckDB over views named after the testdata
tables, and compares: column sets, dtypes, row counts, and a hash of the
value matrix with columns sorted by name and rows sorted by all columns.
"""
import json, sys, subprocess, glob, os
import duckdb
import pandas as pd
import hashlib

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # pyarrow reads Spark parquet as ns, DuckDB returns us; values are
        # micros everywhere and str() renders both the same, so the driver's
        # hash treats them as equal — normalize so dtype compare agrees.
        if df[c].dtype.kind == 'M':
            # tz-aware (INT64 adjusted-to-UTC parquet) -> naive UTC first:
            # astype refuses the aware->naive conversion outright
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype('datetime64[us]')
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def table_hash(df: pd.DataFrame) -> str:
    parts = []
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == 'f':
            vals = ["%.9g" % v if pd.notna(v) else "NULL" for v in s]
        else:
            vals = [str(v) if pd.notna(v) else "NULL" for v in s]
        parts.append(col + ":" + "|".join(vals))
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:16]

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
                       cwd="/root/repo", check=True, capture_output=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/q*"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = pd.read_parquet(files[0])
        if name not in oracle:
            print(f"---- {name}: no oracle ({len(spark_df)} rows)"); continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        dt_mismatch = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                       if s[c].dtype != d[c].dtype]
        if dt_mismatch:
            # The driver's hash renders int64 `123` vs float64 `123.0`
            # differently, so any dtype drift that survives to the driver is a
            # hash-fail there even when %.9g hides it here (r6: q104-q106).
            print(f"FAIL {name}: dtype drift {dt_mismatch}")
            n_fail += 1; continue
        hs, hd = table_hash(s), table_hash(d)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(s)} rows)"
                  + (f" dtypes {dt_mismatch}" if dt_mismatch else ""))
            diff_cols = [c for c in s.columns if not s[c].astype(str).equals(d[c].astype(str))]
            print(f"     differing cols: {diff_cols}")
            for c in diff_cols[:2]:
                neq = s[c].astype(str) != d[c].astype(str)
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"       [{i}] {c}: spark={s[c][i]} duck={d[c][i]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
