#!/usr/bin/env python3
"""Skewed-embedding probe fixtures (round-14 verdict item 4): 2M vectors,
64-dim float32.

  skew2m: 80% of vectors in ONE semantic clump (unit direction e1 + 0.23
          relative noise, pairwise cosine ~0.95 — semantic duplicates), 20%
          scattered pseudo-random directions, interleaved by id % 5 so the
          first-k quantizer samples the mixture.
  unif2m: all scattered — the same-session uniform baseline.

Deterministic (seeded numpy); written as one embeddings.parquet per dir so
Tables.embeddings() reads them directly.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DIM = 64
CHUNK = 250_000

def write(dst, skew):
    rng = np.random.default_rng(42)
    writer = None
    for lo in range(0, N, CHUNK):
        n = min(CHUNK, N - lo)
        ids = np.arange(lo, lo + n, dtype=np.int64)
        v = rng.standard_normal((n, DIM)).astype(np.float32)
        if skew:
            clump = (ids % 5) != 0           # 80%
            v[clump] *= 0.23                 # relative noise
            v[clump, 0] += 1.0               # the clump direction e1
        labels = (ids % 8).astype(np.int32)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(v.reshape(-1), pa.float32()), DIM)
        # match the fixture schema: list<float> (not fixed-size)
        emb = emb.cast(pa.list_(pa.float32()))
        t = pa.table({"vec_id": ids, "embedding": emb, "label": labels})
        if writer is None:
            writer = pq.ParquetWriter(f"{dst}/embeddings.parquet", t.schema, compression="snappy")
        writer.write_table(t)
    writer.close()
    print(dst, "done", N)

write("testdata/skew2m", True)
write("testdata/unif2m", False)
