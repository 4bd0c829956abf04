#!/bin/bash
# Round-4 measurement sweep (run when the axon tunnel is live).
# Supersedes run_r3_tpu_suite.sh (never ran: tunnel outage spanned the
# r3 close + r4 start). Collects, in priority order:
#   1. headline re-capture under approx AND sorted fast modes (VERDICT #1/#2)
#   2. sorted-vs-approx grouping kernel table
#   3. scatter-VJP table incl. the NEW pallas one-hot-tiles kernel (#5)
#   4. R=32 train decomposition (feeds the config-3 roofline paragraph, #7)
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $* ==="; }
log probe
timeout 180 python -u -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 3; }
log headline approx
timeout 1800 python -u bench.py
log headline approx rerun
timeout 1200 python -u bench.py
log headline sorted
TPU3DSAD_FAST_MODE=sorted timeout 1800 python -u bench.py
log sorted_grouping R=8
timeout 1800 python -u bench/bench_sorted_grouping.py
log scatter_vjp R=64 (incl. pallas kernel)
TPU3DSAD_BENCH_R=64 timeout 1800 python -u bench/bench_scatter_vjp.py
log train_decompose R=32
TPU3DSAD_BENCH_R=32 timeout 1800 python -u bench/bench_train_decompose.py
log DONE
