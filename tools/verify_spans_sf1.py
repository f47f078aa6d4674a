#!/usr/bin/env python3
"""sf1 oracle check for q_dedup_spans with bounded memory.

The registry oracle for q_dedup_spans OOMs DuckDB at sf1 for a reason that
is NOT data volume (2.26M windows, ~190 MB materialized): `min()` over a
STRUCT in the `dup` GROUP BY is pathological in this DuckDB build — the
aggregate allocates ~130 GB on 2.3M rows and the process is OOM-killed
(memory_limit does not govern it). Verified by stage bisection: every other
stage of the oracle runs in < 0.5 GB.

Same math, bounded:
  1. materialize the stride-1 window table `wins` in doc-id chunks
     (identical window/hash expressions to the oracle text);
  2. replace `min({'d': doc_id, 'p': pos})` with the order-isomorphic
     scalar `min(doc_id * 1024 + pos)` — lexicographic struct-min equals
     scalar-min of the packed key iff pos < 1024, which the script asserts
     against the data;
  3. run the UNCHANGED downstream SQL (flagged -> islands -> spans) and
     hash-compare exactly like tools/local_verify.py.

Usage: python3 tools/verify_spans_sf1.py [sfdir] [outdir] [nchunks]
"""
import hashlib
import sys

import duckdb
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "testdata/sf1"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_sf1"
NCHUNKS = int(sys.argv[3]) if len(sys.argv) > 3 else 25
PACK = 1024  # packed-key radix; valid while max(pos) < PACK (asserted)


def canon(df: pd.DataFrame) -> str:  # identical to local_verify.canon
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bytes):
            return v.hex()
        return str(v)
    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


WINS_CHUNK = """
INSERT INTO wins
WITH t AS (SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
           FROM documents WHERE doc_id % {n} = {i})
SELECT doc_id, p.pos AS pos, p.h AS h
FROM (SELECT doc_id,
        unnest([{{'pos': i,
                 'h': ('0x' || substr(md5(array_to_string(toks[i:i+9], ' ')), 1, 15))::BIGINT}}
                for i in range(1, len(toks) - 8)]) AS p
      FROM t WHERE len(toks) >= 10)
"""

TAIL = f"""
WITH dup AS (SELECT h, count(*) AS n_occ, min(doc_id * {PACK} + pos) AS first_key
        FROM wins GROUP BY h),
flagged AS (SELECT w.doc_id, w.pos
            FROM wins w JOIN dup USING (h)
            WHERE n_occ > 1 AND first_key <> w.doc_id * {PACK} + w.pos),
g AS (SELECT doc_id, pos,
        max(pos + 10) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM flagged),
i AS (SELECT doc_id, pos,
        sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
      FROM g),
sp AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + 10 AS BIGINT) AS span_end
       FROM i GROUP BY doc_id, island)
SELECT doc_id, span_start, span_end, span_end - span_start AS n_tokens
FROM sp
"""


def main():
    con = duckdb.connect()
    con.execute("SET memory_limit='32GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SFDIR}/documents.parquet')")
    con.execute("CREATE TEMP TABLE wins (doc_id BIGINT, pos BIGINT, h BIGINT)")
    for i in range(NCHUNKS):
        con.execute(WINS_CHUNK.format(n=NCHUNKS, i=i))
        print(f"chunk {i + 1}/{NCHUNKS}", flush=True)
    maxpos = con.execute("SELECT max(pos) FROM wins").fetchone()[0]
    assert maxpos < PACK, f"packed-key radix too small: max(pos)={maxpos} >= {PACK}"
    odf = con.execute(TAIL).df()
    sdf = con.execute(
        f"SELECT * FROM read_parquet('{OUTDIR}/q_dedup_spans/*.parquet')").df()
    rows_ok = len(sdf) == len(odf)
    cols_ok = sorted(sdf.columns) == sorted(odf.columns)
    hash_ok = canon(sdf) == canon(odf)
    status = "PASS" if (rows_ok and cols_ok and hash_ok) else "FAIL"
    print(f"{status} q_dedup_spans: rows=({len(sdf)}, {len(odf)}) "
          f"cols_match={cols_ok} hash={hash_ok}")


if __name__ == "__main__":
    main()
