#!/usr/bin/env python3
"""DuckDB single-node baseline timings for every oracle query.

Runs each oracle_sql.json query in DuckDB over the same parquet tables the
Spark bench reads, timing N passes per query (median reported), and prints
one JSON line shaped like graft.Bench's output for side-by-side comparison.

DuckDB is the strongest available single-node stand-in for the reference
engine (the reference publishes no reproducible numbers — BASELINE.md), so
"within small-factor of DuckDB at single-node scale" is the honest local
throughput gate; above that scale Spark's distribution is the point.

Usage: python3 tools/duckdb_bench.py [sfdir] [passes]
Needs a prior Spark dump for oracle_sql.json: tools/local_verify.py writes
it to /tmp/graft_verify (or pass ORACLE_JSON=path).
"""
import json, os, statistics, sys, time
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ORACLE = os.environ.get("ORACLE_JSON", "/tmp/graft_verify/oracle_sql.json")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    # Same guard as local_verify.py: bound DuckDB so a heavy oracle spills
    # instead of tripping the OOM killer; override via GRAFT_DUCKDB_MEM.
    mem = os.environ.get("GRAFT_DUCKDB_MEM", "48GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = f"{SFDIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(ORACLE))
    out, failed, total = {}, [], 0.0
    for name, sql in sorted(oracle.items()):
        times = []
        try:
            for _ in range(PASSES):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                times.append(time.monotonic() - t0)
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {e}", file=sys.stderr)
            continue
        med = statistics.median(times)
        out[name] = {"median": round(med, 6), "min": round(min(times), 6),
                     "max": round(max(times), 6)}
        total += med
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "passes": PASSES, "queries": out,
                      "failed": failed, "sf": SFDIR}))


if __name__ == "__main__":
    main()
