#!/bin/bash
# Round-4 measurement sweep (run when the axon tunnel is live).
# Supersedes run_r3_tpu_suite.sh (never ran: tunnel outage spanned the
# r3 close + r4 start). Collects, in priority order:
#   1. headline re-capture under approx AND sorted fast modes (VERDICT #1/#2)
#   2. sorted-vs-approx grouping kernel table
#   3. scatter-VJP table incl. the NEW pallas one-hot-tiles kernel (#5)
#   4. R=32 train decomposition (feeds the config-3 roofline paragraph, #7)
# Steps report failures and keep going — one bad step must not cost the
# rest of a scarce tunnel session.
set -u -o pipefail
cd "$(dirname "$0")/.."
log() { echo "=== $* ==="; }
step() { log "$1"; shift; "$@" || log "STEP_FAILED($?)"; }

log probe
timeout 180 python -u -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 3; }

step "headline approx"        timeout 1800 python -u bench.py
step "headline approx rerun"  timeout 1200 python -u bench.py
step "headline sorted"        env TPU3DSAD_FAST_MODE=sorted timeout 1800 python -u bench.py
step "sorted_grouping R=8"    timeout 1800 python -u bench/bench_sorted_grouping.py
step "scatter_vjp R=64 incl. pallas" \
    env TPU3DSAD_BENCH_R=64 timeout 1800 python -u bench/bench_scatter_vjp.py
step "train_decompose R=32" \
    env TPU3DSAD_BENCH_R=32 timeout 1800 python -u bench/bench_train_decompose.py
log DONE
