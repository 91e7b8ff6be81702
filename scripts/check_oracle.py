import duckdb, json, glob, sys, os, subprocess, threading, time
import pyarrow.parquet as pq
import pandas as pd, numpy as np, hashlib

# Usage: check_oracle.py [sf_dir] [verify_out_dir]
# Env:
#   SPARK_GRAFT_ONLY=q1,q2   - the Verify run was sampled to these queries;
#                              other queries are SKIPPED (reported, not failed).
#                              A *selected* query with no dump is an ERROR.
#   ORACLE_TIMEOUT_SEC=N     - per-query DuckDB timeout (0/unset = none).
#                              A timed-out query is reported TIMEOUT and failed.
#   ORACLE_JSON_OUT=path     - also write a machine-readable summary JSON.

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
# Resource discipline for big-SF sweeps (the DuckDB analog of the bench's
# SPARK_GRAFT_SHUFFLE/SPARK_DRIVER_MEM knobs): unset -> DuckDB defaults.
if os.environ.get('ORACLE_MEMORY_LIMIT'):
    con.execute(f"SET memory_limit='{os.environ['ORACLE_MEMORY_LIMIT']}'")
if os.environ.get('ORACLE_THREADS'):
    con.execute(f"SET threads={int(os.environ['ORACLE_THREADS'])}")
# per-process spill dir: the default '.tmp' in cwd is SHARED, so two
# concurrent sweeps delete each other's spill blocks on connection close
# (seen as "Cannot open file .tmp/duckdb_temp_block-...: No such file")
import tempfile
con.execute(f"SET temp_directory='{tempfile.mkdtemp(prefix='duckdb_spill_')}'")
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    # partial dirs (the decorr ladder data ships documents+embeddings
    # only) still verify the gates whose tables exist
    if os.path.exists(f'{sf}/{t}.parquet'):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))

only_env = os.environ.get('SPARK_GRAFT_ONLY', '').strip()
only = set(x.strip() for x in only_env.split(',') if x.strip()) if only_env else None
timeout_sec = float(os.environ.get('ORACLE_TIMEOUT_SEC', '0') or '0')

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    s = df.to_csv(index=False, float_format='%.6g')
    return hashlib.md5(s.encode()).hexdigest()

class OracleTimeout(Exception):
    pass

def run_oracle(sql):
    """Execute oracle SQL, optionally bounded by ORACLE_TIMEOUT_SEC via con.interrupt()."""
    if timeout_sec <= 0:
        return con.execute(sql).fetchdf()
    done = threading.Event()
    def watchdog():
        if not done.wait(timeout_sec):
            con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    t0 = time.time()
    try:
        return con.execute(sql).fetchdf()
    except Exception as e:
        if time.time() - t0 >= timeout_sec - 0.5:
            raise OracleTimeout(f'oracle exceeded {timeout_sec}s') from e
        raise
    finally:
        done.set()

# Above this many rows the pandas path (materialize -> sort -> astype(str)
# -> md5) dominates wall-clock by ORDERS of magnitude over the oracle SQL
# itself (measured at 10x bench scale: m_interpolate's 45.9M-row oracle
# computes in 1 s; fetchdf + pandas canon ran past a 600 s timeout). Big
# results compare inside DuckDB instead: count(*) plus a commutative
# multiset hash (sum of per-row hash(struct(cols))) over BOTH the oracle
# subquery and the spark parquet dump, with oracle columns cast to the
# dump's physical types. Order-independent, zero materialization.
BIG_ROWS = int(os.environ.get('ORACLE_BIG_ROWS', '2000000'))

# Sequentially-defined gates whose SQL oracle is intractable above a scale:
# the DuckDB simulation of agg_greedy_avg's multi-stream anchor cascade is a
# recursive CTE whose accumulator rescans per fold step (exponential-ish in
# replay depth — times out somewhere between sf0.1 and sf1). Above
# `above_rows` input rows (or whenever the SQL oracle times out) such a gate
# routes to an INDEPENDENT replay verifier — a first-class OK/FAIL line, not
# an asterisk. The replay (scripts/greedy_replay.py) is a direct Python
# transcription of the reference semantics (lib/protobuf.cc:49-85) with the
# engine's exact decimal accumulation, compared bit-exact against the dump;
# at every SQL-tractable scale BOTH verifiers run green on the same dump
# (sf0.01/sf0.1), which is what certifies the replay to stand in above them.
REPLAY = {
    'agg_greedy_avg': {
        'script': os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'greedy_replay.py'),
        'input_rows_sql': 'SELECT count(*) FROM events WHERE value IS NOT NULL',
        'above_rows': int(os.environ.get('ORACLE_REPLAY_ABOVE_ROWS', '500000')),
        # Scales at which SQL oracle and replay both ran green on the SAME
        # dump — the evidence that certifies the replay to stand in above
        # them. Recorded in the JSON artifact so a replay-verified gate is
        # self-describing about what its verifier was itself verified
        # against; update when the spot-check (r13 ADVICE) re-runs at a
        # larger scale with an extended ORACLE_TIMEOUT_SEC. The replay's
        # failure path is negative-tested by scripts/test_replay_negative.py.
        'certified_at': 'sf0.01,sf0.1 (sql+replay agree on same dump, bit-exact)',
    },
    # e_dup_groups' SQL oracle is the pair replay (tractable — e_lsh_pairs
    # runs the identical shape green at decorr-sf10) + a recursive `reach`
    # closure whose working table is O(nodes x component size) and
    # un-spillable: at 200k decorr-sf10 vectors DuckDB requests a single
    # 32 GiB allocation and dies even alone on the box. Above `above_rows`
    # embeddings the gate routes to scripts/dup_groups_replay.py: the SAME
    # committed SQL cut at the edge set + an independent Python union-find
    # for the closure, integer-exact against the dump.
    'e_dup_groups': {
        'script': os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'dup_groups_replay.py'),
        'input_rows_sql': 'SELECT count(*) FROM embeddings',
        'above_rows': int(os.environ.get('ORACLE_DUPG_ABOVE_ROWS', '100000')),
        'certified_at': 'sf0.01,sf0.1,decorr-sf1 '
                        '(sql+replay agree on same dump, bit-exact)',
    },
}


def run_replay(name):
    """Run a gate's replay verifier; returns (ok, detail)."""
    spec = REPLAY[name]
    r = subprocess.run([sys.executable, spec['script'], sf, out],
                       capture_output=True, text=True)
    detail = (r.stdout + r.stderr).strip().replace('\n', ' | ')
    return r.returncode == 0, detail


def multiset_compare(name, sql, dumps):
    files = ', '.join(f"'{p}'" for p in dumps)
    dump_rel = f"read_parquet([{files}])"
    desc = con.execute(f"DESCRIBE SELECT * FROM {dump_rel}").fetchall()
    types = {r[0]: r[1] for r in desc}
    cols = sorted(types)
    pack = ', '.join(f'"{c}" := "{c}"' for c in cols)
    agg = f"count(*) AS n, sum(hash(struct_pack({pack}))) AS h"
    cast_sel = ', '.join(f'CAST("{c}" AS {types[c]}) AS "{c}"' for c in cols)
    t0 = time.time()
    on_, oh = run_oracle(
        f"SELECT {agg} FROM (SELECT {cast_sel} FROM ({sql}))").values[0]
    oracle_s = time.time() - t0
    sn, sh = run_oracle(f"SELECT {agg} FROM {dump_rel}").values[0]
    if int(on_) == int(sn) and oh == sh:
        print(f'{name}: OK rows={int(on_)} oracle_s={oracle_s:.1f} '
              f'(multiset-hash)')
        return True
    print(f'{name}: FAIL rows={int(on_)}vs{int(sn)} multiset-hash '
          f'{"match" if oh == sh else "differs"}')
    sel = ', '.join(f'"{c}"' for c in cols)
    diff = run_oracle(
        f"SELECT {cast_sel} FROM ({sql}) "
        f"EXCEPT ALL SELECT {sel} FROM {dump_rel} LIMIT 3").values
    for row in diff:
        print(f'  oracle-only row: {row}')
    return False


fails, skipped, results, verifiers = [], [], {}, {}
for name, sql in sorted(oracle.items()):
    if name.endswith('.parquet'):
        continue  # doubled driver-lookup key; same SQL as the bare name
    try:
        dumps = glob.glob(f'{out}/{name}.parquet/*.parquet')
        if not dumps:
            # Only a sampled run (SPARK_GRAFT_ONLY set, query not selected) may
            # legitimately lack a dump. Anything else is a real failure: the
            # query crashed or never wrote output.
            if only is not None and name not in only:
                skipped.append(name)
                print(f'{name}: SKIPPED (not in SPARK_GRAFT_ONLY)')
                results[name] = 'skipped'
                continue
            fails.append(name)
            print(f'{name}: ERROR no dump at {out}/{name}.parquet (query selected for this run)')
            results[name] = 'missing_dump'
            continue
        n_dump = sum(pq.ParquetFile(p).metadata.num_rows for p in dumps)
        if name in REPLAY:
            in_rows = int(con.execute(
                REPLAY[name]['input_rows_sql']).fetchone()[0])
            if in_rows > REPLAY[name]['above_rows']:
                ok, detail = run_replay(name)
                verifiers[name] = 'replay'
                if ok:
                    results[name] = 'ok'
                    print(f'{name}: OK [verifier=replay, '
                          f'input_rows={in_rows}] {detail}')
                else:
                    fails.append(name)
                    results[name] = 'fail'
                    print(f'{name}: FAIL [verifier=replay] {detail}')
                continue
        if n_dump > BIG_ROWS:
            verifiers[name] = 'sql-multiset'
            if multiset_compare(name, sql, dumps):
                results[name] = 'ok'
            else:
                fails.append(name)
                results[name] = 'fail'
            continue
        verifiers[name] = 'sql'
        t0 = time.time()
        odf = run_oracle(sql)
        oracle_s = time.time() - t0
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
            results[name] = 'fail'
            print(f'{name}: {status} schema={schema_ok} rows={len(o)}vs{len(s)}')
            if schema_ok and rows_ok:
                for c in o.columns:
                    if not (o[c].astype(str).values == s[c].astype(str).values).all():
                        m = (o[c].astype(str).values != s[c].astype(str).values)
                        i = np.argmax(m)
                        print(f'  col {c}: first mismatch at row {i}: oracle={o[c].iloc[i]} spark={s[c].iloc[i]}')
        else:
            results[name] = 'ok'
            print(f'{name}: OK rows={len(o)} oracle_s={oracle_s:.1f}')
    except OracleTimeout as e:
        if name in REPLAY:
            # SQL oracle hit its wall below the row threshold — the
            # replay verifier is still authoritative for this gate
            ok, detail = run_replay(name)
            verifiers[name] = 'replay'
            if ok:
                results[name] = 'ok'
                print(f'{name}: OK [verifier=replay, after sql timeout] '
                      f'{detail}')
            else:
                fails.append(name)
                results[name] = 'fail'
                print(f'{name}: FAIL [verifier=replay] {detail}')
            continue
        fails.append(name)
        results[name] = 'timeout'
        print(f'{name}: TIMEOUT {e}')
    except Exception as e:
        fails.append(name)
        results[name] = 'error'
        print(f'{name}: ERROR {e}')
n_ok = sum(1 for v in results.values() if v == 'ok')
print(f'SUMMARY: ok={n_ok} skipped={len(skipped)} fails={len(fails)}')
print('FAILS:', fails)
json_out = os.environ.get('ORACLE_JSON_OUT')
if json_out:
    replay_cert = {n: REPLAY[n]['certified_at']
                   for n, v in verifiers.items()
                   if v == 'replay' and n in REPLAY}
    with open(json_out, 'w') as f:
        json.dump({'sf': sf, 'out': out, 'timeout_sec': timeout_sec,
                   'n_ok': n_ok, 'n_skipped': len(skipped), 'fails': fails,
                   'results': results, 'verifiers': verifiers,
                   'replay_certified_at': replay_cert}, f, indent=1)
if fails:
    sys.exit(1)
