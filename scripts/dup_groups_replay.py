#!/usr/bin/env python3
"""Independent replay of e_dup_groups for scale factors where the
DuckDB transitive-closure oracle is intractable.

The gate's oracle SQL has two parts: (1) the LSH-banded candidate
join + cosine filter that yields the duplicate EDGE set — linear in
pair volume and proven tractable at every scale the pair gates verify
at (e_lsh_pairs runs the identical shape) — and (2) a recursive
`reach` CTE computing each node's full reachable set to take
min(member) per component. Part (2) materializes O(nodes x
component-size) rows inside one un-spillable recursive working table:
at decorr-sf10 (200k vectors) DuckDB dies asking for a single 32 GiB
allocation even alone on a 125 GiB box.

This replay runs the SAME committed oracle SQL up to the edge set
(string-cut at the `reach` CTE, replaced by `SELECT a, b FROM ed`) in
DuckDB, then computes connected components with an independent Python
union-find (path-halving; the textbook algorithm, nothing shared with
the engine's distributed pointer-jumping implementation) and labels
each component by its minimum member — exactly the semantics
`min(m) ... GROUP BY n` expresses over the closure. Integer-exact
compare against the dump, so the verdict is bit-exact, not
tolerance-based. At every SQL-tractable scale BOTH verifiers run
green on the same dump, which is what certifies this replay to stand
in above them (same contract as greedy_replay.py).

Usage: dup_groups_replay.py <sf_dir> <dump_dir>
Reads <dump_dir>/oracle_sql.json (key e_dup_groups) and compares
against <dump_dir>/e_dup_groups.parquet/; exits non-zero on mismatch.
Honors ORACLE_MEMORY_LIMIT / ORACLE_THREADS like check_oracle.py.
"""
import glob
import json
import os
import sys
import tempfile

import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

sql = json.load(open(f"{dump}/oracle_sql.json"))["e_dup_groups"]
cut = sql.find(",\nreach AS")
if cut < 0:
    print("FAIL: oracle SQL shape changed (no `reach AS` CTE to cut)")
    sys.exit(1)
edge_sql = sql[:cut] + "\nSELECT a, b FROM ed"

con = duckdb.connect()
if os.environ.get("ORACLE_MEMORY_LIMIT"):
    con.execute(f"SET memory_limit='{os.environ['ORACLE_MEMORY_LIMIT']}'")
if os.environ.get("ORACLE_THREADS"):
    con.execute(f"SET threads={int(os.environ['ORACLE_THREADS'])}")
con.execute(
    f"SET temp_directory='{tempfile.mkdtemp(prefix='duckdb_spill_')}'")
for t in ("documents", "embeddings"):
    if os.path.exists(f"{sf}/{t}.parquet"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

edges = con.execute(edge_sql).fetchdf()

# union-find with path halving; union by min keeps no rank but the
# label pass below re-derives min-per-component exactly anyway
parent = {}


def find(x):
    r = parent.setdefault(x, x)
    while parent[r] != r:
        parent[r] = parent[parent[r]]
        r = parent[r]
    # second walk compresses x's own path
    while parent[x] != r:
        parent[x], x = r, parent[x]
    return r


for a, b in zip(edges["a"].astype("int64"), edges["b"].astype("int64")):
    ra, rb = find(int(a)), find(int(b))
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)

group_min = {}
for n in parent:
    r = find(n)
    group_min[r] = min(group_min.get(r, n), n)
replay = pd.DataFrame(
    {"vec_id": list(parent.keys()),
     "group_id": [group_min[find(n)] for n in parent]})
replay = replay.sort_values(["vec_id"]).reset_index(drop=True)

files = sorted(glob.glob(f"{dump}/e_dup_groups.parquet/*.parquet"))
got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
got = got[["vec_id", "group_id"]].sort_values(["vec_id"]).reset_index(drop=True)

if len(got) != len(replay):
    print(f"FAIL: rows replay={len(replay)} dump={len(got)}")
    sys.exit(1)
same = (replay["vec_id"].astype("int64").values ==
        got["vec_id"].astype("int64").values).all() and \
       (replay["group_id"].astype("int64").values ==
        got["group_id"].astype("int64").values).all()
if not same:
    merged = replay.merge(got, on="vec_id", suffixes=("_replay", "_dump"))
    bad = merged[merged["group_id_replay"] != merged["group_id_dump"]]
    print(f"FAIL: {len(bad)} label mismatches; first: "
          f"{bad.head(3).to_dict('records')}")
    sys.exit(1)
print(f"OK rows={len(got)} edges={len(edges)} "
      f"(python union-find == spark dump, bit-exact)")
