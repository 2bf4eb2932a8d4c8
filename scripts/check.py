#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>, and
compares: columns sorted by name, rows sorted by all columns, doubles
rounded to 9 significant digits.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
import os
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = p.split("/")[-1].removesuffix(".parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p  # ScaleData writes dirs
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def close(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b or str(a) == str(b)

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
    s, o = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(o.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}"); n_fail += 1; continue
    if len(s) != len(o):
        print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_fail += 1; continue
    bad = None
    for i in range(len(s)):
        for c in s.columns:
            if not close(s[c].iloc[i], o[c].iloc[i]):
                bad = (i, c, s[c].iloc[i], o[c].iloc[i]); break
        if bad: break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
        n_fail += 1
    else:
        # exact-hash style check: dtypes should agree too (schema match)
        dt_s = [str(t) for t in s.dtypes]; dt_o = [str(t) for t in o.dtypes]
        tag = "" if dt_s == dt_o else f"  [dtype diff: {dt_s} vs {dt_o}]"
        print(f"PASS {name} ({len(s)} rows){tag}")
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
