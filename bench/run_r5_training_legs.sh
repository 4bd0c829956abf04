#!/bin/bash
# Round-5 training legs (run when the axon tunnel is live).
#   Leg A (VERDICT r4 #4): outdoor recipe + foreground-biased proposal
#          sampling (model.proposal_sampling=density) — target mAP@0.5
#          meaningfully above the r3 plateau of 0.055 at the same budget.
#   Leg B (VERDICT r4 #3): shape-family classifier benchmark — MSG
#          classifier (the ModelNet40-91.9% anchor architecture) on the
#          10-family OFF set; target >=0.90 val accuracy. If a reduced
#          CPU leg already banked a >=0.9 row this round, this re-runs at
#          full budget for the committed TPU row.
# JSONL stdout goes to docs/experiments/. A failed/timed-out leg is
# reported and the script continues (the other leg is independent).
set -u -o pipefail
cd "$(dirname "$0")/.."
log() { echo "=== $* ==="; }

log probe
timeout 180 python -u -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 3; }

# Single-core host: suspend a still-running CPU fallback leg so its
# training python does not contend with these legs' host-side dispatch
# (scenes/s rows here are committed evidence). Same pid-chain discipline
# as run_r5_tpu_suite.sh; resumed on exit.
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

EXP=docs/experiments

log "leg A: generate outdoor scenes"
OUT=/tmp/r5_outdoor
rm -rf "$OUT" /tmp/r5_outdoor_ckpt
python -m tpu3dsad.data.synthetic_outdoor out="$OUT" scenes=48 seed=0

log "leg A: outdoor + density sampling, r3 budget (1200 epochs)"
timeout 14400 python -u train.py preset=outdoor data.root="$OUT" \
  model.proposal_sampling=density model.proposal_density_radius=1.0 \
  model.proposal_candidate_factor=2 \
  train.batch_size=8 train.num_epochs=1200 train.eval_every=50 \
  train.ckpt_dir=/tmp/r5_outdoor_ckpt \
  | tee "$EXP/r5_outdoor_density.jsonl" || log "STEP_FAILED(legA rc=$?)"

log "leg B: generate + preproc shape families"
SHAPES=/tmp/r5_shapes
rm -rf "$SHAPES" /tmp/r5_shapes_ckpt
python -m tpu3dsad.data.synthetic_shapes out="$SHAPES/raw" per_class=64 test_per_class=16
python -m tpu3dsad.data.preproc_modelnet root="$SHAPES/raw" out="$SHAPES/npy" num_points=4096

log "leg B: train MSG classifier 250 epochs"
timeout 7200 python -u train.py model.name=classifier model.classifier_msg=true \
  data.name=modelnet data.root="$SHAPES/npy" data.num_points=1024 \
  train.batch_size=16 train.num_epochs=250 train.eval_every=25 \
  train.lr=1e-3 "train.lr_decay_steps=(120,180,220)" \
  "train.lr_decay_rates=(0.3,0.3,0.3)" \
  train.ckpt_dir=/tmp/r5_shapes_ckpt \
  | tee "$EXP/r5_classifier_shapes.jsonl" || log "STEP_FAILED(legB rc=$?)"

log DONE
