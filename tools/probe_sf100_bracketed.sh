#!/usr/bin/env bash
# Anchor-BRACKETED sf100 probe (round-15 verdict items 1 and 7): the r14b
# session proved this host can throttle ~2x on SUSTAINED load while a ~2 s
# anchor window still reads healthy, so a single post-run anchor cannot
# certify a multi-minute wall. Protocol (BASELINE "isolate-mode" note):
#   1. sample the cpu anchor immediately BEFORE the probe (a 1-query
#      trivial Bench run at sf0.001 — its cpu_anchor field);
#   2. run the probe (single pass, 64g, knob-free partitions) — its own
#      cpu_anchor is the AFTER sample (Bench measures it post-queries);
#   3. REJECT the session if before/after disagree by more than 1.2x;
#      repeat until a session holds.
# Usage: tools/probe_sf100_bracketed.sh <out.json> <query,list> [attempts]
set -e
cd /root/repo
OUT=${1:?out.json}
QUERIES=${2:?query list}
ATTEMPTS=${3:-3}

anchor_of() { python3 -c "import json,sys; print(json.load(open(sys.argv[1]))['cpu_anchor'])" "$1"; }

for i in $(seq 1 "$ATTEMPTS"); do
  # cool-down before re-sampling: the host's sustained-load throttle decays
  # over ~minutes, so a before-anchor taken right after a rejected probe
  # reads low and dooms the next bracket too
  [ "$i" -gt 1 ] && sleep 180
  # every step below is guarded: under `set -e` an unguarded non-zero exit
  # (a failed probe, a missing anchor field) would abort the script BEFORE
  # the rejection/retry protocol engages (round-15 advice)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_WARMUP=0 \
    SPARK_GRAFT_BENCH_ONLY=q_filter SPARK_GRAFT_BENCH_OUT=/tmp/anchor_before.json \
    bash tools/run_verify.sh graft.Bench > /dev/null 2>&1 || true
  BEFORE=$(anchor_of /tmp/anchor_before.json 2>/dev/null || echo 0)

  if ! bash tools/probe_sf100.sh "$OUT" "$QUERIES" > /tmp/probe_sf100_run.log 2>&1; then
    echo "attempt $i: probe itself FAILED (see /tmp/probe_sf100_run.log) — retrying"
    continue
  fi
  AFTER=$(anchor_of "$OUT" 2>/dev/null || echo 0)

  RATIO=$(python3 -c "
b=$BEFORE; a=$AFTER
print(round(max(b/a, a/b), 3) if b > 0 and a > 0 else 999.0)")
  OK=$(python3 -c "print(1 if $RATIO <= 1.2 else 0)")
  echo "attempt $i: anchor before=$BEFORE after=$AFTER ratio=$RATIO ok=$OK"
  python3 - "$OUT" "$BEFORE" "$AFTER" "$RATIO" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
d["anchor_before"], d["anchor_after"], d["anchor_bracket_ratio"] = \
    float(sys.argv[2]), float(sys.argv[3]), float(sys.argv[4])
json.dump(d, open(sys.argv[1], "w"))
EOF
  if [ "$OK" = "1" ]; then
    echo "BRACKET HOLDS — $OUT is the session of record"; exit 0
  fi
  echo "bracket violated (> 1.2x) — rejecting session, retrying"
done
echo "NO SESSION HELD THE BRACKET after $ATTEMPTS attempts"; exit 1
