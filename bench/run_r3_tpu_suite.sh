#!/bin/bash
# Round-3 measurement sweep, run when the axon tunnel is live.
# Collects: dispatch-floor-corrected scatter-VJP + train decomposition,
# sorted-vs-approx grouping, headline under both fast modes.
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $* ==="; }
log probe
timeout 120 python -u -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 3; }
log scatter_vjp R=64
TPU3DSAD_BENCH_R=64 timeout 900 python -u bench/bench_scatter_vjp.py
log train_decompose R=32
TPU3DSAD_BENCH_R=32 timeout 1200 python -u bench/bench_train_decompose.py
log sorted_grouping R=8
timeout 1200 python -u bench/bench_sorted_grouping.py
log headline approx
timeout 1200 python -u bench.py
log headline sorted
TPU3DSAD_FAST_MODE=sorted timeout 1200 python -u bench.py
log DONE
