"""Compare a subset of queries against their DuckDB oracles.

Usage: python3 scripts/check_one.py q1 q2 ...  (after running graft.Verify
with SPARK_GRAFT_ONLY=q1,q2 so /tmp/verify_out/<name>.parquet exists).
Same canonicalization as check_oracle.py / the driver: sort columns by
name, sort rows, numeric-tolerant compare.
"""
import duckdb, json, glob, sys, os
import pandas as pd, numpy as np

sf = os.environ.get('CHECK_SF', '/root/testdata/sf0.01')
out = os.environ.get('CHECK_OUT', '/tmp/verify_out')
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name in sys.argv[1:]:
    if name not in oracle:
        print(f'{name}: NO ORACLE (rows-only gate)')
        continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
        sdf = pd.concat([pd.read_parquet(p) for p in
                         glob.glob(f'{out}/{name}.parquet/*.parquet')],
                        ignore_index=True)
        o, s = canon(odf), canon(sdf)
        schema_ok = list(o.columns) == list(s.columns)
        rows_ok = len(o) == len(s)
        ok = schema_ok and rows_ok
        if ok:
            for c in o.columns:
                if np.issubdtype(o[c].dtype, np.number):
                    if not np.allclose(o[c].astype(float), s[c].astype(float),
                                       rtol=1e-9, atol=1e-9, equal_nan=True):
                        ok = False; break
                else:
                    if not (o[c].astype(str).values == s[c].astype(str).values).all():
                        ok = False; break
        print(f'{name}: {"OK" if ok else "FAIL"} schema={schema_ok} '
              f'rows={len(o)}vs{len(s)} cols_o={list(o.columns)} cols_s={list(s.columns)}')
        if not ok:
            fails.append(name)
            if schema_ok and rows_ok:
                for c in o.columns:
                    m = (o[c].astype(str).values != s[c].astype(str).values)
                    if m.any():
                        i = int(np.argmax(m))
                        print(f'  col {c} row {i}: oracle={o[c].iloc[i]} spark={s[c].iloc[i]}')
    except Exception as e:
        fails.append(name)
        print(f'{name}: ERROR {e}')
sys.exit(1 if fails else 0)
