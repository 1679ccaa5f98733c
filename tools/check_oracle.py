#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
Compares each dumped Spark parquet against its oracle SQL run in DuckDB over
the same sf tables; prints per-query PASS/FAIL (rows/schema/hash).
"""
import sys, json, glob, hashlib
import duckdb, pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    fs = glob.glob(f"{sf}/{t}.parquet")
    if fs:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fs[0]}')")

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    try:
        spark_df = canon(pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{out}/{name}/*.parquet"))]))
        odf = canon(con.execute(oracle[name]).df())
        rows = len(spark_df) == len(odf)
        schema = list(spark_df.columns) == list(odf.columns)
        def h(df):
            return hashlib.md5(
                "\n".join(",".join(str(v) for v in r) for r in df.itertuples(index=False))
                .encode()).hexdigest()
        hh = h(spark_df) == h(odf)
        ok = rows and schema and hh
        fails += 0 if ok else 1
        print(f"{name}: {'PASS' if ok else 'FAIL'} rows={len(spark_df)}/{len(odf)} "
              f"schema={schema} hash={hh}")
        if not ok and len(spark_df) < 20:
            print("  spark:", spark_df.to_dict('records')[:5])
            print("  oracle:", odf.to_dict('records')[:5])
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
sys.exit(1 if fails else 0)
