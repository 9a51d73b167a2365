import json, glob, sys
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['documents','embeddings','lineitem','orders','customer','part','supplier','nation','region','events']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR: {e}')
        fails.append(name); continue
    try:
        got = duckdb.connect().execute(f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')").df()
    except Exception as e:
        print(f'{name}: SPARK OUTPUT READ ERROR: {e}')
        fails.append(name); continue
    # driver-style compare: sort columns by name, then sort rows, hash values
    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == 'float64':
                df[c] = df[c].round(6)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    e2, g2 = norm(exp), norm(got)
    schema_match = list(e2.columns) == list(g2.columns)
    rows_match = len(e2) == len(g2)
    try:
        eq = schema_match and rows_match and e2.astype(str).equals(g2.astype(str))
    except Exception:
        eq = False
    status = 'OK' if eq else 'MISMATCH'
    print(f'{name}: {status} (rows spark={len(g2)} oracle={len(e2)}, cols spark={list(g2.columns)} oracle={list(e2.columns)})')
    if not eq:
        fails.append(name)
        merged = e2.merge(g2, how='outer', indicator=True)
        diff = merged[merged['_merge'] != 'both']
        print(diff.head(10).to_string())
print('FAILS:', fails if fails else 'none')
