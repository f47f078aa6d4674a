#!/usr/bin/env bash
# One-command round verification: every gate this repo maintains, in order.
# Usage: bash tools/run_round.sh [quick|full]
#   quick (default): compile, smoke, generated-catalog staleness check, full
#                    sf0.01 oracle registry, spec suite, sf0.1 bench +
#                    per-query regression gate vs the blessed artifact.
#   full:  adds the sf1 invariant audit (excluded-oracle dispositions), the
#          3-seed sf0.01 fixture sweep, and the seeded-sf1 runnable-registry
#          sweep (anti-overfit at scale), plus a fresh 3-pass bench written
#          to bench_out.json.
# Exits non-zero on the first failing gate.
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-quick}"

# Queries with no runnable oracle at sf1+ (FIXTURES.md): quadratic DuckDB
# oracles (ngram, prefix), DuckDB struct-min OOM (spans, spans_cut — audited
# by tools/verify_spans_sf1.py instead), and the Spark-side all-pairs guard
# that FIRES by design (source_overlap — audited by audit_invariants.py).
SF1_SKIP="q_dedup_ngram,q_dedup_prefix,q_dedup_spans,q_dedup_spans_cut,q_source_overlap"

# Seeded fixtures are cached, keyed on (generator source + source-fixture
# listing): a change to gen_seeded.py or a regenerated base fixture
# invalidates the cache instead of silently sweeping stale parquet.
gen_seeded_fixture() { # src dst seed
  local src=$1 dst=$2 seed=$3 stamp
  stamp=$( (cat tools/gen_seeded.py; ls -l "$src") | md5sum | cut -d' ' -f1)
  if [ ! -f "$dst/.stamp" ] || [ "$(cat "$dst/.stamp")" != "$stamp" ]; then
    rm -rf "$dst"
    python3 tools/gen_seeded.py "$src" "$dst" "$seed"
    echo "$stamp" > "$dst/.stamp"
  fi
}

echo "== 1/7 compile =="
sbt -batch compile

echo "== 2/7 smoke (flagship entry, sf0.001) =="
bash tools/run_verify.sh graft.Smoke | tail -2 | grep -q "SMOKE-OK"

echo "== 3/7 generated operator catalog is current =="
python3 tools/gen_catalog.py --check

echo "== 4/7 oracle registry (sf0.01 vs DuckDB) =="
python3 tools/local_verify.py

echo "== 5/7 spec suite =="
sbt -batch test

echo "== 6/7 bench (sf0.1, 3-pass, local[32] — the blessed artifacts' env) + regression gate =="
# SPARK_GRAFT_CPUS pinned: every blessed bench artifact was recorded at
# local[32] (the driver contract), and an unset env here silently benched at
# Bench's local[4] default — round 14 saw the parallel-heavy q_dedup_ngram
# flag 2.08x on nothing but that env mismatch (cpu_ms HALVED while wall
# doubled: fewer cores, not more work).
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  SPARK_GRAFT_BENCH_OUT=bench_out.json bash tools/run_verify.sh graft.Bench | tail -1
python3 tools/bench_gate.py bench_out.json "${SPARK_GRAFT_BENCH_BLESSED:-bench_r14b_final.json}"

if [ "$MODE" = "full" ]; then
  echo "== 7a excluded-oracle invariant audit (sf1) =="
  python3 tools/audit_invariants.py testdata/sf1 /tmp/graft_audit_round
  echo "== 7b seed-varied fixture sweep (anti-overfit, 3 seeds at sf0.01) =="
  # NOTE: local_verify.py always exits 0, so the gate is the FAIL grep — and
  # it must be an explicit if/exit: bash's errexit IGNORES '!'-inverted
  # commands, so the old '! grep -q ^FAIL' form never aborted anything.
  for s in 1 2 3; do
    gen_seeded_fixture /root/testdata/sf0.01 "testdata/sf0.01_s$s" "$s"
    python3 tools/local_verify.py "testdata/sf0.01_s$s" "/tmp/graft_verify_s$s" \
      | tee "/tmp/graft_seed_$s.log" | tail -2
    if grep -q '^FAIL' "/tmp/graft_seed_$s.log"; then
      echo "SEED SWEEP s$s FAILED"; exit 1
    fi
  done
  echo "== 7c seeded-sf1 runnable-registry sweep =="
  gen_seeded_fixture testdata/sf1 testdata/sf1_s1 1
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    SPARK_GRAFT_VERIFY_SKIP="$SF1_SKIP" GRAFT_VERIFY_SKIP="$SF1_SKIP" \
    GRAFT_VERIFY_JSON=CORRECTNESS_sf1_seeded.json \
    python3 tools/local_verify.py testdata/sf1_s1 /tmp/graft_verify_sf1s1 \
    | tee /tmp/graft_sf1s1.log | tail -3
  if grep -q '^FAIL' /tmp/graft_sf1s1.log; then
    echo "SEEDED-SF1 SWEEP FAILED"; exit 1
  fi
  # 7c rewrote CORRECTNESS_sf1_seeded.json — a gen_catalog.py input — so the
  # step-3 staleness verdict is void; re-check (and tell the dev to --write)
  # rather than ending ALL-PASS with a README the next round will reject.
  echo "== 7d catalog re-check (7c rewrote a catalog input) =="
  python3 tools/gen_catalog.py --check
else
  echo "== 7/7 skipped (quick mode; 'full' adds sf1 audit + seeded sweeps) =="
fi

# Final step (round-16 verdict item 5): the catalog citing a stale round and
# untracked CORRECTNESS_r{N}/BENCH_r{N} artifacts recurred two rounds in a
# row because both were manual. Regenerate the catalog from whatever is the
# newest correctness artifact and STAGE the round artifacts, so an ALL-PASS
# tree is commit-ready by construction (staging only — the commit itself
# stays a human/agent decision).
echo "== final: catalog --write + stage round artifacts =="
python3 tools/gen_catalog.py --write
git add README.md 2>/dev/null || true
for f in CORRECTNESS_r*.json BENCH_r*.json VERDICT.md ADVICE.md; do
  [ -e "$f" ] && git add "$f" 2>/dev/null || true
done
echo "ROUND GATES: ALL PASS"
