#!/usr/bin/env python3
"""Skewed-documents fixture for the duplicateSpans 100 TB skew adjudication
(round-18, VERDICT r17 item 3).

Every doc embeds the SAME 19-token boilerplate head (=> its 10 fully-inside
w=10 windows are duplicated across ALL docs — the "license block repeated
millions of times" case) followed by a per-doc unique tail, so the per-hash
occurrence list of each hot window hash is N_DOCS long. A window-aggregate
implementation must buffer one whole hot hash's list per partition; a
groupBy implementation collapses it map-side. Schema matches the sf
fixtures' documents table (doc_id, text, lang, source, n_chars).

Usage: tools/gen_skew_docs.py <outdir> [n_docs=2000000]
"""
import os, sys

import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "testdata/skewdocs2m"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

HOT = " ".join(f"boiler{i:02d}" for i in range(19))  # 19 tokens -> 10 hot windows

os.makedirs(OUT, exist_ok=True)

ids, texts, nchars = [], [], []
batches = []
schema = pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64())])
writer = pq.ParquetWriter(os.path.join(OUT, "documents.parquet"), schema,
                          compression="zstd")
for d in range(N):
    # 5 unique tail tokens: windows straddling the boundary are per-doc unique
    tail = " ".join(f"u{d}x{j}" for j in range(5))
    t = HOT + " " + tail
    ids.append(d); texts.append(t); nchars.append(len(t))
    if len(ids) == 200_000:
        writer.write_table(pa.table(
            {"doc_id": ids, "text": texts, "lang": ["en"] * len(ids),
             "source": ["skew"] * len(ids), "n_chars": nchars}, schema=schema))
        ids, texts, nchars = [], [], []
if ids:
    writer.write_table(pa.table(
        {"doc_id": ids, "text": texts, "lang": ["en"] * len(ids),
         "source": ["skew"] * len(ids), "n_chars": nchars}, schema=schema))
writer.close()
print(f"wrote {N} docs to {OUT} (hot head: 10 windows x {N} occurrences each)")
