"""Independent replay of agg_greedy_avg for scale factors where the
DuckDB recursive-CTE oracle is intractable.

The multi-stream greedy anchor cascade (reference ValueStreamCalculation,
lib/protobuf.cc:49-85) is inherently sequential per group; the DuckDB
oracle simulates it with a recursive CTE whose accumulator carries one
record per point, so every fold step rescans the accumulator --
O(points x points-per-group) list operations (~1.8e11 at sf1, far past
any timeout). This script is a direct Python transcription of the SAME
published semantics, written independently of the Scala operator's
single-pass derivation:

  anchor = first unconsumed ts of the first alive stream in series-key
  order; each stream's FRONT run within +/-interval of the anchor joins
  the bucket; residual values of later streams seed later anchors; the
  chronologically-last-created anchor's bucket is dropped.

Bucket means mirror the engine's exact decimal accumulation (each
addend rounded to 12dp half-up = the decimal(38,12) cast, summed
exactly, one final double division), so the comparison is bit-exact,
not tolerance-based. Output rounding replicates the gates' cross-
engine-deterministic form floor(x*10000 + 0.5)/10000 (IEEE ops only
-- see SparkEntry.r4).

Usage: greedy_replay.py <sf_dir> <dump_dir> [interval_ms]
Compares the replay against <dump_dir>/agg_greedy_avg.parquet/ and
exits non-zero on any mismatch.
"""
import glob
import math
import sys
from decimal import Decimal, ROUND_HALF_UP

import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
interval = int(sys.argv[3]) if len(sys.argv) > 3 else 30000

Q12 = Decimal("0.000000000001")

ev = pd.read_parquet(f"{sf}/events.parquet",
                     columns=["event_type", "user_id", "ts", "value"])
ev = ev[ev["value"].notna()].copy()
ev["gkey"] = "/events/" + ev["event_type"]
def mk_skey_suffix(u):
    if pd.isna(u):
        return "{}"
    if isinstance(u, str):
        return "{user=%s}" % u
    return "{user=%d}" % int(u)


ev["skey"] = ev["gkey"] + ev["user_id"].map(mk_skey_suffix)
# epoch ms regardless of parquet physical ts type (ns / us / ms)
ts = ev["ts"]
if str(ts.dtype).startswith("datetime64"):
    unit = str(ts.dtype)[len("datetime64["):-1].split(",")[0]
    ev["tsm"] = ts.astype("int64") // {"ns": 10**6, "us": 10**3, "ms": 1}[unit]
else:
    ev["tsm"] = ts.astype("int64")

ev = ev.sort_values(["gkey", "skey", "tsm"], kind="mergesort")

rows = []
for gkey, g in ev.groupby("gkey", sort=True):
    anchors = []          # anchor ts, creation order
    sums = []             # exact decimal sum per anchor
    counts = []
    prev_skey = None
    cursor = 0
    for skey, t, v in zip(g["skey"].values, g["tsm"].values, g["value"].values):
        if skey != prev_skey:
            cursor = 0
            prev_skey = skey
        while cursor < len(anchors) and (
                t < anchors[cursor] - interval or t > anchors[cursor] + interval):
            cursor += 1
        if cursor == len(anchors):
            anchors.append(int(t))
            sums.append(Decimal(0))
            counts.append(0)
        sums[cursor] += Decimal(float(v)).quantize(Q12, rounding=ROUND_HALF_UP)
        counts[cursor] += 1
    for ts_a, s, n in list(zip(anchors, sums, counts))[:max(0, len(anchors) - 1)]:
        mean = float(s) / n
        rows.append((gkey, ts_a, math.floor(mean * 10000 + 0.5) / 10000))

replay = pd.DataFrame(rows, columns=["gkey", "ts", "dval"])
parts = sorted(glob.glob(f"{dump}/agg_greedy_avg.parquet/*.parquet"))
if not parts:
    print(f"no dump at {dump}/agg_greedy_avg.parquet"); sys.exit(2)
spark = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


r, s = canon(replay), canon(spark)
if len(r) != len(s):
    print(f"ROWS MISMATCH replay={len(r)} spark={len(s)}"); sys.exit(1)
bad = 0
for c in r.columns:
    neq = (r[c].astype(str).values != s[c].astype(str).values)
    if neq.any():
        i = neq.argmax()
        print(f"col {c}: first mismatch row {i}: "
              f"replay={r[c].iloc[i]} spark={s[c].iloc[i]}")
        bad += 1
if bad:
    print(f"FAIL: {bad} columns differ"); sys.exit(1)
print(f"OK rows={len(r)} (replay == spark dump, bit-exact)")
