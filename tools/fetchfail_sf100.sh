#!/usr/bin/env bash
# Executor kill DURING an sf100 heavy (round-15 verdict item 2): the r15
# fetchfail evidence was at sf0.01 where every query is sub-second — the
# kill landed between queries, so no multi-minute stage ever lost a live
# shuffle. This run points the assassin at ONE bracketed sf100 heavy under
# local-cluster (two real executor JVMs) in RELIABLE-PIN mode
# (SPARK_GRAFT_PIN_RELIABLE=true): the kill must land mid-stage, Spark must
# resubmit the lost stages (the driver log line is the evidence), the pins
# must survive as files, and the output must HASH-MATCH a no-kill reference
# run of the same configuration.
#
# Usage: bash tools/fetchfail_sf100.sh [query] [kill_s] [sfdir]
# Artifacts: FETCHFAIL_sf100_evidence.log (+ /tmp logs)
set -uo pipefail
cd "$(dirname "$0")/.."
QUERY="${1:-q_dedup_semantic}"
KILL_S="${2:-120}"
SFDIR="${3:-testdata/sf100}"
EVID=FETCHFAIL_sf100_evidence.log
# 2 executors x 16 threads x 48g: ~3 g/thread, the same heap-per-thread the
# adjudicated single-JVM sf100 probes run at (64g/32) — 24g executors OOM'd
# in the semanticDedup normalize/pin stage. Driver adds 12g; 108g total.
MASTER='local-cluster[2,16,49152]'

anchor() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_WARMUP=0 \
    SPARK_GRAFT_BENCH_ONLY=q_filter SPARK_GRAFT_BENCH_OUT=/tmp/ffsf100_anchor.json \
    bash tools/run_verify.sh graft.Bench > /dev/null 2>&1 || true
  python3 -c "import json; print(json.load(open('/tmp/ffsf100_anchor.json'))['cpu_anchor'])" \
    2>/dev/null || echo 0
}

run_one() { # $1=outdir $2=log $3=kill(0/1)
  rm -rf "$1"; mkdir -p "$1"
  local t0 t1 rc
  if [ "$3" = "1" ]; then
    (
      sleep "$KILL_S"
      pid=$(pgrep -f CoarseGrainedExecutorBackend | head -1 || true)
      if [ -n "${pid:-}" ]; then
        echo "$(date -u +%H:%M:%S) KILL executor pid=$pid (after ${KILL_S}s, mid-heavy)" >> "$EVID"
        kill -9 "$pid" || true
      else
        echo "$(date -u +%H:%M:%S) no executor found at ${KILL_S}s" >> "$EVID"
      fi
    ) &
    ASSASSIN=$!
  fi
  t0=$(date +%s)
  # SPARK_GRAFT_LOG_DAG=1 on EVERY run: the evidence section greps this log
  # for DAGScheduler "Resubmitting" lines, which Verify only surfaces at
  # INFO when the flag is set — without it a fresh run always reports
  # resubmitted=0 even when stage recovery happened (r16 advice)
  SPARK_GRAFT_MASTER="$MASTER" SPARK_SCALA_VERSION=2.13 \
    SPARK_GRAFT_LOG_DAG=1 \
    SPARK_GRAFT_PIN_RELIABLE=true SPARK_GRAFT_EXECUTOR_MEM=48g \
    SPARK_GRAFT_VERIFY_RETRIES=0 SPARK_GRAFT_VERIFY_ONLY="$QUERY" \
    SPARK_DRIVER_MEM=12g SPARK_GRAFT_CPUS=32 \
    bash tools/run_verify.sh graft.Verify "$SFDIR" "$1" > "$2" 2>&1
  rc=$?
  t1=$(date +%s)
  [ "$3" = "1" ] && kill "$ASSASSIN" 2>/dev/null
  echo "$((t1 - t0)) $rc"
}

: > "$EVID"
echo "query=$QUERY sfdir=$SFDIR master=$MASTER pin=reliable kill_at=${KILL_S}s" >> "$EVID"
A_BEFORE=$(anchor)
echo "anchor_before=$A_BEFORE" >> "$EVID"

echo "--- reference run (no kill) ---" >> "$EVID"
read -r REF_WALL REF_RC <<< "$(run_one /tmp/ffsf100_ref /tmp/ffsf100_ref.log 0)"
echo "ref_wall_s=$REF_WALL ref_rc=$REF_RC" >> "$EVID"

echo "--- kill run ---" >> "$EVID"
read -r KILL_WALL KILL_RC <<< "$(run_one /tmp/ffsf100_kill /tmp/ffsf100_kill.log 1)"
echo "kill_wall_s=$KILL_WALL kill_rc=$KILL_RC" >> "$EVID"

A_AFTER=$(anchor)
echo "anchor_after=$A_AFTER" >> "$EVID"

echo "--- driver recovery evidence (kill run) ---" >> "$EVID"
grep -E "Lost executor|ExecutorLostFailure|FetchFailed|Resubmitt|resubmit" /tmp/ffsf100_kill.log \
  | head -40 >> "$EVID" || true
printf 'lost_executor=%s fetchfailed=%s resubmitted=%s job_level_retries=%s\n' \
  "$(grep -c 'Lost executor' /tmp/ffsf100_kill.log || true)" \
  "$(grep -c -i 'fetchfail' /tmp/ffsf100_kill.log || true)" \
  "$(grep -c -i 'resubmit' /tmp/ffsf100_kill.log || true)" \
  "$(grep -c '\[verify\].*failed' /tmp/ffsf100_kill.log || true)" >> "$EVID"

echo "--- hash compare (kill vs reference) ---" >> "$EVID"
python3 - "$QUERY" >> "$EVID" <<'EOF'
import hashlib, sys
import duckdb
q = sys.argv[1]
def h(d):
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    df = con.execute(f"select * from read_parquet('{d}/{q}/*.parquet')").fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted("\x01".join(str(v) for v in r) for r in df.itertuples(index=False, name=None))
    return len(rows), hashlib.md5("\n".join(rows).encode()).hexdigest()
nr, hr = h('/tmp/ffsf100_ref')
nk, hk = h('/tmp/ffsf100_kill')
print(f"ref_rows={nr} kill_rows={nk} ref_hash={hr} kill_hash={hk} match={hr == hk and nr == nk}")
EOF
tail -6 "$EVID"
