#!/usr/bin/env python3
"""Per-query bench regression gate against the blessed reference artifact.

Compares a fresh bench JSON (graft.Bench output) to the blessed gate
artifact (default bench_r14_final.json, recorded in a quiet session —
see BASELINE.md "round 11 CLEAN-ROOM GATE") and reports:

  - WALL: queries whose median exceeds gate_ratio x the blessed median
    (only where wall > min_wall, default 0.5 s — BASELINE's adjudication
    data shows >2x spreads concentrate in sub-0.5 s queries where absolute
    scheduler jitter dominates; a same-tree gate self-test reproduced
    exactly that: 4 sub-second flags, all refuted by isolate-mode
    spot-checks), AND whose absolute excess over the blessed median tops
    abs_delta (default 0.5 s) — sub-second queries float in a startup/
    page-cache band several-x wide with identical plans, so a ratio alone
    cries wolf; a real regression on a query that matters clears both;
  - PLAN: queries whose shuffle_mb moved by more than shuffle_tol MB in
    either direction — a plan-shape change (broadcast<->shuffle flip,
    partitioning change), which is signal even when wall looks fine;
  - ENV: the median wall ratio over ALL common queries. If the whole
    distribution moved together, that is the rig, not the code (the
    documented round-10/11 host slowdown); per-query verdicts use the
    env-normalized ratio so a uniform shift never flags everything.

Exit 0 iff no query fails the normalized wall gate and no plan deltas.

Usage: python3 tools/bench_gate.py <fresh.json> [blessed.json]
  GATE_RATIO (default 2.0), SHUFFLE_TOL_MB (default 2.0), MIN_WALL (0.5)
"""
import json
import os
import statistics
import sys

fresh_path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
blessed_path = sys.argv[2] if len(sys.argv) > 2 else "bench_r14b_final.json"
GATE = float(os.environ.get("GATE_RATIO", "2.0"))
SH_TOL = float(os.environ.get("SHUFFLE_TOL_MB", "2.0"))
MIN_WALL = float(os.environ.get("MIN_WALL", "0.5"))
ABS_DELTA = float(os.environ.get("ABS_DELTA_S", "0.5"))

fresh_doc = json.load(open(fresh_path))
blessed_doc = json.load(open(blessed_path))
fresh = fresh_doc["queries"]
blessed = blessed_doc["queries"]


def med(v):
    return v["median"] if isinstance(v, dict) else float(v)


def sh(v):
    return v.get("shuffle_mb", 0.0) if isinstance(v, dict) else 0.0


common = sorted(set(fresh) & set(blessed))
if not common:
    print("no common queries between artifacts")
    sys.exit(2)

med_env = statistics.median(med(fresh[k]) / max(med(blessed[k]), 1e-9) for k in common)
# Preferred normalizer: the pure-CPU anchor (units/sec, higher = faster rig)
# recorded in both artifacts. blessed/fresh > 1 means this rig is SLOWER than
# the blessed one, i.e. walls are expected to inflate by that factor. The
# query-median fallback conflates rig drift with a real uniform regression;
# the anchor cannot (no Spark in it), so when both artifacts carry one it
# wins. Both ratios are printed for cross-checking.
anchor_env = None
if fresh_doc.get("cpu_anchor") and blessed_doc.get("cpu_anchor"):
    anchor_env = blessed_doc["cpu_anchor"] / fresh_doc["cpu_anchor"]
# The anchor is a ~2 s post-run sample: co-load that overlaps only the anchor
# window would inflate it and normalize away REAL regressions gate-wide. The
# query median cannot be inflated that way (and an anchor far below it means
# the shift was not uniform CPU), so take the CONSERVATIVE (smaller) of the
# two normalizers: a genuine rig slowdown moves both together, while either
# artifact alone can only make the gate stricter, never looser.
if anchor_env is not None:
    env = min(anchor_env, med_env)
    if max(anchor_env, med_env) > 1.5 * min(anchor_env, med_env):
        print(f"note: anchor ({anchor_env:.3f}) and query-median ({med_env:.3f}) "
              f"normalizers disagree >1.5x — non-uniform shift, using the stricter")
else:
    env = med_env

wall_fails, plan_fails = [], []
for k in common:
    f, b = med(fresh[k]), med(blessed[k])
    norm = (f / max(b, 1e-9)) / env
    if norm > GATE and f > MIN_WALL and (f - b) > ABS_DELTA:
        wall_fails.append((k, b, f, round(norm, 2)))
    d = sh(fresh[k]) - sh(blessed[k])
    if abs(d) > SH_TOL:
        plan_fails.append((k, round(sh(blessed[k]), 1), round(sh(fresh[k]), 1)))

print(f"common={len(common)} env_ratio={env:.3f} "
      f"[{'min(cpu_anchor, query-median)' if anchor_env is not None else 'query-median'}; "
      f"median_wall_ratio={med_env:.3f}"
      + (f", anchor_ratio={anchor_env:.3f}" if anchor_env is not None else "")
      + f"] (uniform shift = rig, normalized out; gate={GATE}x normalized)")
for k, b, f, r in sorted(wall_fails, key=lambda x: -x[3]):
    print(f"WALL  {k}: {b:.2f}s -> {f:.2f}s ({r}x normalized)")
for k, b, f in plan_fails:
    print(f"PLAN  {k}: shuffle {b} MB -> {f} MB")
missing = sorted(set(blessed) - set(fresh))
extra = sorted(set(fresh) - set(blessed))
if missing:
    print(f"note: {len(missing)} blessed queries absent from fresh run")
if extra:
    print(f"note: {len(extra)} new queries (no gate yet): {', '.join(extra[:8])}{'...' if len(extra) > 8 else ''}")
ok = not wall_fails and not plan_fails
print("GATE", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
