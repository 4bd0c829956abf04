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
