#!/bin/bash
# Round-5 measurement sweep (run when the axon tunnel is live).
# Supersedes run_r4_tpu_suite.sh (never ran: the outage spanned the whole
# r3-close -> r4 window). Collects, in priority order:
#   1. headline re-capture (approx fast mode) + the configs 1-4 table in one
#      artifact (TPU3DSAD_BENCH_MULTI, VERDICT r4 #8)
#   2. headline under sorted fast mode (grouping-default decision, #2)
#   3. sorted-vs-approx grouping kernel table
#   4. scatter-VJP table incl. the pallas one-hot-tiles kernel (#2)
#   5. R=32 train decomposition (feeds the config-3 roofline paragraph, #5)
# Steps report failures and keep going — one bad step must not cost the
# rest of a scarce tunnel session. Each step is also the first hardware
# (Mosaic) compile of the r3/r4 Pallas changes — lowering failures will
# surface here (VERDICT r4 missing #2).
set -u -o pipefail
cd "$(dirname "$0")/.."
log() { echo "=== $* ==="; }
step() { log "$1"; shift; "$@" || log "STEP_FAILED($?)"; }

log probe
timeout 180 python -u -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 3; }

# Single-core host: a CPU training leg running in parallel inflates the
# dispatch-side timings of every step below. Suspend it (exact pid chain
# from its pidfile — never pattern-match) and resume on exit; its wall
# timeout may expire while frozen, which is acceptable — the TPU legs
# supersede the CPU fallback leg once the tunnel is back.
CPU_LEG_PY=""
if [ -f /tmp/r5_legA.pid ] && kill -0 "$(cat /tmp/r5_legA.pid)" 2>/dev/null; then
  _leg=$(cat /tmp/r5_legA.pid)
  _t=$(pgrep -P "$_leg" timeout 2>/dev/null | head -1)
  [ -n "$_t" ] && CPU_LEG_PY=$(pgrep -P "$_t" python 2>/dev/null | head -1)
  if [ -n "$CPU_LEG_PY" ]; then
    kill -STOP "$CPU_LEG_PY" && log "suspended CPU leg python=$CPU_LEG_PY"
  fi
fi
trap '[ -n "$CPU_LEG_PY" ] && kill -CONT "$CPU_LEG_PY" 2>/dev/null' EXIT

mkdir -p docs/experiments
# Outer budget covers the inner worst case (headline + 4 configs at
# 1800s each); bench.py also rewrites the artifact after every config,
# so even a kill here banks the rows measured so far.
step "headline approx + configs table" \
    env TPU3DSAD_BENCH_MULTI=docs/experiments/r5_bench_configs.json \
    timeout 9000 python -u bench.py
step "headline approx rerun"  timeout 1200 python -u bench.py
step "headline sorted"        env TPU3DSAD_FAST_MODE=sorted timeout 1800 python -u bench.py
step "sorted_grouping R=8"    timeout 1800 python -u bench/bench_sorted_grouping.py
step "scatter_vjp R=64 incl. pallas" \
    env TPU3DSAD_BENCH_R=64 timeout 1800 python -u bench/bench_scatter_vjp.py
step "train_decompose R=32" \
    env TPU3DSAD_BENCH_R=32 timeout 1800 python -u bench/bench_train_decompose.py
log DONE
