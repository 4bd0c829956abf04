#!/bin/bash
# Round-5 CPU fallback for training leg A (VERDICT r4 #4): outdoor
# density-sampling hypothesis test at a REDUCED budget, two arms at
# IDENTICAL conditions — control (plain FPS proposal sampling) vs
# treatment (model.proposal_sampling=density). The full r3 budget runs on
# TPU via run_r5_training_legs.sh when the tunnel returns; this leg only
# needs to show the pos_ratio / AR@0.5 trajectories SEPARATING to
# validate or kill the hypothesis (VERDICT: "a shortened leg that shows
# the pos_ratio and AR@0.5 trajectory moving is enough").
#
# Reduced budget: 24 scenes, 4096-pt clouds, b=4 (6 steps/epoch),
# 200 epochs = 1200 steps/arm — sized to ~1.5h/arm on the 1-core host.
set -u -o pipefail
cd "$(dirname "$0")/.."
log() { echo "=== $* ==="; }
EXP=docs/experiments
mkdir -p "$EXP"

OUT=/tmp/r5_outdoor_cpu
if [ ! -d "$OUT" ]; then
  log "generate reduced outdoor scenes"
  python -m tpu3dsad.data.synthetic_outdoor out="$OUT" scenes=24 \
    val_scenes=8 points=49152 seed=0
fi

COMMON=(preset=outdoor data.root="$OUT" data.num_points=4096
        train.batch_size=4 train.num_epochs=200 train.eval_every=25
        "train.lr_decay_steps=(90,150,180)"
        "train.lr_decay_rates=(0.3,0.3,0.3)" train.ckpt_every=50
        train.log_every=6)

log "arm 1 (control): plain FPS sampling"
rm -rf /tmp/r5_outA_fps
TPU3DSAD_PLATFORM=cpu timeout 14400 python -u train.py "${COMMON[@]}" \
  model.proposal_sampling=fps train.ckpt_dir=/tmp/r5_outA_fps \
  | tee "$EXP/r5_outdoor_cpu_fps.jsonl" || log "STEP_FAILED(fps rc=$?)"

log "arm 2 (treatment): density-biased sampling"
rm -rf /tmp/r5_outA_density
TPU3DSAD_PLATFORM=cpu timeout 14400 python -u train.py "${COMMON[@]}" \
  model.proposal_sampling=density model.proposal_density_radius=1.0 \
  model.proposal_candidate_factor=2 train.ckpt_dir=/tmp/r5_outA_density \
  | tee "$EXP/r5_outdoor_cpu_density.jsonl" || log "STEP_FAILED(density rc=$?)"

log DONE
