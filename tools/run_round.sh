#!/usr/bin/env bash
# One-command round verification: every gate this repo maintains, in order.
# Usage: bash tools/run_round.sh [quick|full]
#   quick (default): compile, smoke, full sf0.01 oracle registry, spec suite,
#                    sf0.1 bench + per-query regression gate vs the blessed
#                    clean-room artifact.
#   full:  adds the sf1 invariant audit (excluded-oracle dispositions) and a
#          fresh 3-pass bench written to bench_out.json.
# Exits non-zero on the first failing gate.
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-quick}"

echo "== 1/6 compile =="
sbt -batch compile

echo "== 2/6 smoke (flagship entry, sf0.001) =="
bash tools/run_verify.sh graft.Smoke | tail -2 | grep -q "SMOKE-OK"

echo "== 3/6 oracle registry (sf0.01 vs DuckDB) =="
python3 tools/local_verify.py

echo "== 4/6 spec suite =="
sbt -batch test

echo "== 5/6 bench (sf0.1, 3-pass) + regression gate =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  SPARK_GRAFT_BENCH_OUT=bench_out.json bash tools/run_verify.sh graft.Bench | tail -1
python3 tools/bench_gate.py bench_out.json bench_r12_final.json

if [ "$MODE" = "full" ]; then
  echo "== 6/7 excluded-oracle invariant audit (sf1) =="
  python3 tools/audit_invariants.py testdata/sf1 /tmp/graft_audit_round
  echo "== 7/7 seed-varied fixture sweep (anti-overfit, 3 seeds at sf0.01) =="
  for s in 1 2 3; do
    [ -d "testdata/sf0.01_s$s" ] || python3 tools/gen_seeded.py /root/testdata/sf0.01 "testdata/sf0.01_s$s" "$s"
    python3 tools/local_verify.py "testdata/sf0.01_s$s" "/tmp/graft_verify_s$s" \
      | tee "/tmp/graft_seed_$s.log" | tail -2
    ! grep -q '^FAIL' "/tmp/graft_seed_$s.log" # local_verify always exits 0
  done
else
  echo "== 6/7 skipped (quick mode; 'full' adds the sf1 invariant audit + 3-seed fixture sweep) =="
fi
echo "ROUND GATES: ALL PASS"
