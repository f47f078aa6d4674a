#!/usr/bin/env python3
"""Deterministic scale-up of the driver testdata (driver-side tooling).

Produces an sfN directory with the SAME schemas (exact arrow/parquet
physical types, including events.ts timestamp[ns] and embeddings
list<float>) and the same per-copy distributions as the source, at
FACTOR x the row count. Used for the round-10 scale-ramp validation:
correctness and bench at sf1 = 10 x sf0.1 (TESTDATA.md stops at sf0.1
and /root/testdata is read-only, so the ramp fixture lives under the
repo instead).

Construction (copy index cp = 0..F-1; cp 0 is the source data verbatim):
  - region/nation: fixed dimensions, copied once (TPC-H convention).
  - customer/supplier/part/orders/lineitem/events: cp adds cp*10^7 to
    every key column (consistently across fact/dim, so join selectivity
    and per-key cardinalities are EXACTLY preserved; each copy is an
    isolated sub-universe). Timestamps/prices untouched: window counts
    grow linearly, distributions don't move.
  - documents: doc_id offset; text Caesar-shifted by cp over [a-z]
    (length/token structure/Zipf shape preserved; planted duplicate and
    near-duplicate clusters replicate WITHIN a copy but are unrelated
    ACROSS copies, so dedup work scales linearly, not quadratically).
  - embeddings: vec_id offset; vector circularly rotated by cp
    (norm-preserving; rotated copies are distinct points, so ANN
    structure scales linearly).

Usage: python3 tools/gen_scale.py [src] [dst] [factor]
Defaults: /root/testdata/sf0.1 testdata/sf1 10
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "testdata/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000

ALPHA = "abcdefghijklmnopqrstuvwxyz"

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def shift_keys(tbl, cols, cp):
    for c in cols:
        i = tbl.schema.get_field_index(c)
        shifted = pc.add(tbl.column(c), pa.scalar(cp * OFF, pa.int64()))
        tbl = tbl.set_column(i, tbl.schema.field(i), shifted.cast(pa.int64()))
    return tbl


def caesar(text_col, cp):
    table = str.maketrans(ALPHA, ALPHA[cp % 26:] + ALPHA[:cp % 26])
    return pa.array([t if t is None else t.translate(table)
                     for t in text_col.to_pylist()], pa.string())


def rotate_vecs(vec_col, cp):
    rot = [v if v is None else v[cp % len(v):] + v[:cp % len(v)]
           for v in vec_col.to_pylist()]
    return pa.array(rot, vec_col.type)


# --- deliberate heavy-hitter stream (round 15, VERDICT r14 item 4) ---
# gen_scale's per-replica Caesar vocabularies dilute every natural token's
# corpus share by ~1/FACTOR, so the Misra-Gries heavy set (share > 1/200)
# goes structurally EMPTY at sf1+ (the "exactly ONE 0-row green" row in
# BASELINE). Hold ONE token family at a fixed share across replicas: each
# copy appends ~41 synthetic docs whose text alternates the fixed token
# HEAVY_TOKEN with a per-doc-unique filler. The alternation means every
# 3-gram shingle contains the unique filler, so injected docs share no
# shingles with each other or the corpus — no new dedup families, no
# near-dup candidate pairs, no contamination overlap; exact-dup texts stay
# unique. Share is FACTOR-invariant (per-copy proportional), so the
# threshold bites at every SF, and gen_seeded's bijective Caesar redraw
# maps the token to another token with the same share (still non-vacuous).
HEAVY_TOKEN = "zzqheavyhitter"
HEAVY_SHARE = 0.015   # target corpus share; threshold is 1/200 = 0.005
HEAVY_DOC_TOKENS = 100  # heavy occurrences per injected doc (200 tokens)
HEAVY_ID_BASE = 9_900_000  # reserved id band inside each copy's sub-universe


def heavy_docs(src, cp, m):
    """Synthetic heavy-hitter docs for copy `cp`, matching src's schema.
    `m` = src's total token count (computed once by the caller)."""
    h = int(HEAVY_SHARE * m / (1.0 - 2 * HEAVY_SHARE)) + 1
    n = (h + HEAVY_DOC_TOKENS - 1) // HEAVY_DOC_TOKENS
    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(n):
        filler = f"zq{cp}x{i}"
        text = " ".join(
            w for _ in range(HEAVY_DOC_TOKENS) for w in (HEAVY_TOKEN, filler))
        rows["doc_id"].append(cp * OFF + HEAVY_ID_BASE + i)
        rows["text"].append(text)
        rows["lang"].append("xx")
        # srcN shape is a FIXTURE CONTRACT: several operators parse the
        # numeric source id via substr(source, 4) (priority dedup, z-order)
        # and DuckDB's cast is strict where Spark's is null-tolerant
        rows["source"].append("src9900")
        rows["n_chars"].append(len(text))
    return pa.table(rows, schema=src.schema)


def copy_of(src, name, cp):
    t = shift_keys(src, KEY_COLS.get(name, []), cp)
    if name == "documents":
        i = t.schema.get_field_index("doc_id")
        t = t.set_column(i, t.schema.field(i),
                         pc.add(t.column("doc_id"),
                                pa.scalar(cp * OFF, pa.int64())).cast(pa.int64()))
        j = t.schema.get_field_index("text")
        t = t.set_column(j, t.schema.field(j), caesar(t.column("text"), cp))
    if name == "embeddings":
        i = t.schema.get_field_index("vec_id")
        t = t.set_column(i, t.schema.field(i),
                         pc.add(t.column("vec_id"),
                                pa.scalar(cp * OFF, pa.int64())).cast(pa.int64()))
        j = t.schema.get_field_index("embedding")
        t = t.set_column(j, t.schema.field(j),
                         rotate_vecs(t.column("embedding"), cp))
    return t


# Row-group sizing is BYTE-oriented, not row-oriented: 1M-row groups are
# ~100 MB for narrow fact rows, but text/embedding rows are ~1 KB each, so
# 1M rows = one huge group — and a parquet row group is Spark's minimum
# split unit, so a 500k-doc corpus written as ONE group pins every
# downstream tokenize/shingle pass to ONE core regardless of cluster size
# (measured: q_contamination 26.6 s at sf10 with 1.2 of 32 threads busy).
# The same rule a production ingest writer must follow at 100 TB.
ROW_GROUP = {"documents": 1 << 15, "embeddings": 1 << 15}


def gen(name):
    rg = ROW_GROUP.get(name, 1 << 20)
    src = pq.read_table(f"{SRC}/{name}.parquet")
    if name in ("region", "nation"):
        pq.write_table(src, f"{DST}/{name}.parquet", compression="snappy",
                       row_group_size=rg)
        print(f"{name}: {src.num_rows} -> {src.num_rows}")
        return
    # Stream copies through a ParquetWriter: content identical to the old
    # concat-then-write (same rows, same order), but memory stays ~one copy
    # instead of FACTOR copies — at factor 1000 (sf100) the concat would
    # need ~100 GB. Row groups stay ~1M rows via per-copy buffering.
    total = 0
    with pq.ParquetWriter(f"{DST}/{name}.parquet", src.schema,
                          compression="snappy") as w:
        buf = []
        buf_rows = 0
        src_tokens = (sum(len(x.split()) for x in src.column("text").to_pylist() if x)
                      if name == "documents" else 0)
        for cp in range(FACTOR):
            t = copy_of(src, name, cp)
            if name == "documents":
                t = pa.concat_tables([t, heavy_docs(src, cp, src_tokens)])
            buf.append(t)
            buf_rows += t.num_rows
            total += t.num_rows
            if buf_rows >= rg:
                w.write_table(pa.concat_tables(buf), row_group_size=rg)
                buf, buf_rows = [], 0
        if buf:
            w.write_table(pa.concat_tables(buf), row_group_size=rg)
    print(f"{name}: {src.num_rows} -> {total}")


def main():
    os.makedirs(DST, exist_ok=True)
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        gen(t)


if __name__ == "__main__":
    main()
