#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: reads each
query's parquet dump from Verify.scala, runs the matching oracle SQL in
DuckDB over the same testdata, sorts columns by name / rows by value, and
compares row counts, schemas, and value hashes. Dev-only tool (the engine
itself is pure Scala)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver testdata is one file per table; Spark-written scale probes
    # (tools/ScaleProbe) are directories of part files — glob those
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    import datetime
    def norm(v):
        # one string form for date / datetime / Timestamp regardless of
        # which physical type each engine's pandas bridge picked
        # (can't use to_datetime: the 3000-01-01 SCD2 sentinel overflows ns)
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(v, datetime.date):
            return f"{v} 00:00:00"
        return v
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S")
        elif df[c].dtype == object:
            df[c] = df[c].map(norm)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    if only and name not in only:
        continue
    spark_df = pd.read_parquet(d)
    if name not in oracle:
        print(f"{name:28s} rows={len(spark_df)} (no oracle)")
        continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE ERROR: {e}")
        fails.append(name)
        continue
    s, o = canon(spark_df), canon(odf)
    rows = len(s) == len(o)
    schema = list(s.columns) == list(o.columns)
    match = False
    if rows and schema:
        try:
            sv = s.astype(str).values.tolist()
            ov = o.astype(str).values.tolist()
            match = sv == ov
        except Exception as e:
            print(f"{name}: compare error {e}")
    status = "OK" if (rows and schema and match) else "FAIL"
    print(f"{name:28s} {status} rows {len(s)}/{len(o)} schema={schema} hash={match}")
    if status == "FAIL":
        fails.append(name)
        if not schema:
            print(f"   spark cols: {list(s.columns)}\n   oracle cols: {list(o.columns)}")
        elif rows:
            diff = (s.astype(str).values != o.astype(str).values)
            import numpy as np
            idx = np.argwhere(diff)
            for r, c in idx[:5]:
                print(f"   row {r} col {s.columns[c]}: spark={s.iloc[r, c]} oracle={o.iloc[r, c]}")
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
