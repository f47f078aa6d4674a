#!/usr/bin/env bash
# Pin-mode crossover A/B (round-16 verdict item 4): sf0.1 priced reliable
# pins at +17.5% (the per-round file write dominates small inputs), sf100
# priced them 1.56x FASTER on q_dedup_semantic (the eager file pin
# materializes the normalized projection's repartition once, deleting an
# exchange class). Somewhere between lies the corpus size where the eager
# file pin starts paying for itself — this script measures one scale point
# in BOTH modes, anchor-bracketed (same protocol as probe_sf100_bracketed:
# reject the session if the before/after cpu anchors disagree > 1.2x).
#
# Usage: tools/pin_crossover.sh <sfdir> <out_prefix> [query,list] [passes] [heap]
# Writes <out_prefix>_default.json and <out_prefix>_reliable.json.
set -e
cd "$(dirname "$0")/.."
SFDIR=${1:?sfdir}
PREFIX=${2:?out prefix}
QUERIES=${3:-q_dedup_semantic,q_dedup_clusters}
PASSES=${4:-1}
HEAP=${5:-24g}

anchor() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_WARMUP=0 \
    SPARK_GRAFT_BENCH_ONLY=q_filter SPARK_GRAFT_BENCH_OUT=/tmp/xover_anchor.json \
    bash tools/run_verify.sh graft.Bench > /dev/null 2>&1 || true
  python3 -c "import json; print(json.load(open('/tmp/xover_anchor.json'))['cpu_anchor'])" \
    2>/dev/null || echo 0
}

run_mode() { # $1=mode(default|reliable) $2=out
  local env_reliable=""
  [ "$1" = "reliable" ] && env_reliable="true"
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="$HEAP" \
    SPARK_GRAFT_BENCH_PASSES="$PASSES" SPARK_GRAFT_BENCH_WARMUP=0 \
    SPARK_GRAFT_PIN_RELIABLE="$env_reliable" \
    SPARK_GRAFT_BENCH_ONLY="$QUERIES" SPARK_GRAFT_BENCH_OUT="$2" \
    bash tools/run_verify.sh graft.Bench > /dev/null 2>&1
}

for MODE in default reliable; do
  OUT="${PREFIX}_${MODE}.json"
  BEFORE=$(anchor)
  run_mode "$MODE" "$OUT"
  AFTER=$(python3 -c "import json; print(json.load(open('$OUT'))['cpu_anchor'])" 2>/dev/null || echo 0)
  RATIO=$(python3 -c "
b=$BEFORE; a=$AFTER
print(round(max(b/a, a/b), 3) if b > 0 and a > 0 else 999.0)")
  echo "$MODE: anchor before=$BEFORE after=$AFTER ratio=$RATIO"
  python3 - "$OUT" "$BEFORE" "$AFTER" "$RATIO" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
d["anchor_before"], d["anchor_after"], d["anchor_bracket_ratio"] = \
    float(sys.argv[2]), float(sys.argv[3]), float(sys.argv[4])
json.dump(d, open(sys.argv[1], "w"))
EOF
  OK=$(python3 -c "print(1 if $RATIO <= 1.2 else 0)")
  if [ "$OK" != "1" ]; then
    echo "BRACKET VIOLATED for $MODE (> 1.2x) — rerun this scale point"; exit 1
  fi
done
python3 - "$PREFIX" <<'EOF'
import json, sys
p = sys.argv[1]
d = json.load(open(f"{p}_default.json"))["queries"]
r = json.load(open(f"{p}_reliable.json"))["queries"]
for q in d:
    dm, rm = d[q]["median"], r[q]["median"]
    print(f"{q}: default={dm:.2f}s reliable={rm:.2f}s reliable/default={rm/dm:.3f}")
EOF
