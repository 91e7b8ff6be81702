import duckdb, json, glob, sys
import pyarrow.parquet as pq
import pandas as pd, numpy as np, hashlib

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    s = df.to_csv(index=False, float_format='%.6g')
    return hashlib.md5(s.encode()).hexdigest()

fails = []
for name, sql in sorted(oracle.items()):
    if name.endswith('.parquet'):
        continue  # doubled driver-lookup key; same SQL as the bare name
    try:
        dumps = glob.glob(f'{out}/{name}.parquet/*.parquet')
        if not dumps:
            continue  # sampled Verify run (SPARK_GRAFT_ONLY): no dump, not a failure
        odf = con.execute(sql).fetchdf()
        sdf = pd.concat([pd.read_parquet(p) for p in dumps], ignore_index=True)
        o, s = canon(odf), canon(sdf)
        schema_ok = list(o.columns) == list(s.columns)
        rows_ok = len(o) == len(s)
        hash_ok = schema_ok and rows_ok and h(o.astype(str)) == h(s.astype(str))
        if not hash_ok and schema_ok and rows_ok:
            # numeric-tolerant compare
            ok = True
            for c in o.columns:
                if np.issubdtype(o[c].dtype, np.number):
                    if not np.allclose(o[c].astype(float), s[c].astype(float), rtol=1e-9, atol=1e-9, equal_nan=True): ok=False; break
                else:
                    if not (o[c].astype(str).values == s[c].astype(str).values).all(): ok=False; break
            hash_ok = ok
        status = 'OK' if hash_ok else 'FAIL'
        if not hash_ok:
            fails.append(name)
            print(f'{name}: {status} schema={schema_ok} rows={len(o)}vs{len(s)}')
            if schema_ok and rows_ok:
                for c in o.columns:
                    if not (o[c].astype(str).values == s[c].astype(str).values).all():
                        m = (o[c].astype(str).values != s[c].astype(str).values)
                        i = np.argmax(m)
                        print(f'  col {c}: first mismatch at row {i}: oracle={o[c].iloc[i]} spark={s[c].iloc[i]}')
        else:
            print(f'{name}: OK rows={len(o)}')
    except Exception as e:
        fails.append(name)
        print(f'{name}: ERROR {e}')
print('FAILS:', fails)
