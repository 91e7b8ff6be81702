"""Negative test for the replay verifier chain (greedy_replay.py +
check_oracle.py's REPLAY routing).

Above ORACLE_REPLAY_ABOVE_ROWS, agg_greedy_avg is certified ONLY by
greedy_replay.py -- so that verifier's failure path must be provably
live: a corrupted dump must FAIL both the bare replay script and the
check_oracle.py routing that invokes it (surfaced as results=fail with
verifiers=replay in the JSON artifact). This script asserts all of:

  1. positive control: the pristine dump PASSES greedy_replay.py
     (guards against a vacuous test where the replay fails on
     everything);
  2. a dump with ONE corrupted dval row FAILS greedy_replay.py
     (non-zero exit, mismatch reported);
  3. check_oracle.py with ORACLE_REPLAY_ABOVE_ROWS=0 (forcing the
     replay route regardless of scale) reports the corrupted gate as
     results[agg_greedy_avg]=fail, verifiers[agg_greedy_avg]=replay,
     and exits non-zero;
  4. the same forced route on the pristine dump reports ok/replay.

Usage: test_replay_negative.py [sf_dir] [verify_out_dir]
Requires a prior `graft.Verify` run that dumped agg_greedy_avg (the
driver's standard t2 output, or a SPARK_GRAFT_ONLY=agg_greedy_avg run).
Exits 0 iff all four assertions hold.
"""
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
here = os.path.dirname(os.path.abspath(__file__))

parts = sorted(glob.glob(f"{out}/agg_greedy_avg.parquet/*.parquet"))
if not parts:
    print(f"PRECONDITION FAILED: no dump at {out}/agg_greedy_avg.parquet "
          f"(run graft.Verify first)")
    sys.exit(2)
if not os.path.exists(f"{out}/oracle_sql.json"):
    print(f"PRECONDITION FAILED: no {out}/oracle_sql.json")
    sys.exit(2)

failures = []


def check(label, ok, detail=""):
    print(f"[{'OK' if ok else 'FAIL'}] {label}" + (f" -- {detail}" if detail else ""))
    if not ok:
        failures.append(label)


def run_replay(dump_dir):
    return subprocess.run(
        [sys.executable, os.path.join(here, "greedy_replay.py"), sf, dump_dir],
        capture_output=True, text=True)


def run_routed(dump_dir, json_out):
    env = dict(os.environ,
               ORACLE_REPLAY_ABOVE_ROWS="0",
               SPARK_GRAFT_ONLY="agg_greedy_avg",
               ORACLE_JSON_OUT=json_out)
    return subprocess.run(
        [sys.executable, os.path.join(here, "check_oracle.py"), sf, dump_dir],
        capture_output=True, text=True, env=env)


with tempfile.TemporaryDirectory(prefix="replay_neg_") as tmp:
    # 1. positive control on the pristine dump
    r = run_replay(out)
    check("pristine dump passes greedy_replay", r.returncode == 0,
          (r.stdout + r.stderr).strip().splitlines()[-1] if (r.stdout + r.stderr).strip() else "")

    # corrupted twin: same dump dir layout, one dval perturbed
    bad = os.path.join(tmp, "corrupted")
    os.makedirs(os.path.join(bad, "agg_greedy_avg.parquet"))
    shutil.copy(f"{out}/oracle_sql.json", bad)
    df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
    df.loc[df.index[0], "dval"] = float(df["dval"].iloc[0]) + 1.0
    df.to_parquet(os.path.join(bad, "agg_greedy_avg.parquet", "part-0.parquet"))

    # 2. the bare replay must reject the corruption
    r = run_replay(bad)
    check("corrupted dump FAILS greedy_replay", r.returncode != 0,
          (r.stdout + r.stderr).strip().splitlines()[0] if (r.stdout + r.stderr).strip() else "")

    # 3. the check_oracle routing must surface it as fail/replay
    art = os.path.join(tmp, "neg.json")
    r = run_routed(bad, art)
    routed_fail = r.returncode != 0
    res = ver = None
    if os.path.exists(art):
        j = json.load(open(art))
        res = j.get("results", {}).get("agg_greedy_avg")
        ver = j.get("verifiers", {}).get("agg_greedy_avg")
    check("routed check exits non-zero on corruption", routed_fail)
    check("artifact records results=fail", res == "fail", f"got {res}")
    check("artifact records verifier=replay", ver == "replay", f"got {ver}")

    # 4. same forced route, pristine dump: ok/replay
    clean = os.path.join(tmp, "clean")
    os.makedirs(os.path.join(clean, "agg_greedy_avg.parquet"))
    shutil.copy(f"{out}/oracle_sql.json", clean)
    for i, p in enumerate(parts):
        shutil.copy(p, os.path.join(clean, "agg_greedy_avg.parquet",
                                    f"part-{i}.parquet"))
    art2 = os.path.join(tmp, "pos.json")
    r = run_routed(clean, art2)
    res2 = ver2 = None
    if os.path.exists(art2):
        j = json.load(open(art2))
        res2 = j.get("results", {}).get("agg_greedy_avg")
        ver2 = j.get("verifiers", {}).get("agg_greedy_avg")
    check("routed check passes pristine dump via replay",
          r.returncode == 0 and res2 == "ok" and ver2 == "replay",
          f"rc={r.returncode} results={res2} verifier={ver2}")

print("PASS" if not failures else f"FAIL: {failures}")
sys.exit(1 if failures else 0)
