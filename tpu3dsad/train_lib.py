"""Training library: train state, schedules, jitted steps, checkpointing.

TPU mapping of the lineage's train.py (SURVEY.md §3.1): everything from
model(inputs) through optimizer.step() is ONE jitted train_step(state,
batch) → (state, metrics); LR step-decay and the BN-momentum schedule are
traced functions of the step counter, so no recompiles across the run.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from tpu3dsad.config import Config, TrainConfig


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def apply_runtime_config(cfg: Config) -> None:
    """Apply the process-global knobs a Config carries: ops tier, fast
    grouping, matmul precision. Called by the CLIs AND by run_detector/
    run_classifier/evaluate so library callers (benches, notebooks) get the
    configured tiers too — bypassing this silently ran the 11x-slower XLA
    FPS/grouping tier in a throughput harness (round-3 session note).
    Idempotent AND fully reverting: every knob is set unconditionally from
    cfg so a second Config in the same process (benches comparing configs)
    never inherits the previous run's sorted mode / pallas tier / fp32
    precision (ADVICE r3). Env-var precedence is explicit: a set
    TPU3DSAD_OPS_IMPL wins over cfg.ops_impl='xla' (the dataclass default,
    i.e. "unspecified") but loses to any explicit non-default cfg value."""
    from tpu3dsad import ops

    if cfg.ops_impl != "xla":
        ops.set_default_impl(cfg.ops_impl)
    else:
        ops.set_default_impl(os.environ.get("TPU3DSAD_OPS_IMPL", "xla"))
    ops.set_fast_grouping(cfg.ops_fast_grouping)
    if cfg.ops_fast_mode != "approx":
        ops.set_fast_mode(cfg.ops_fast_mode)
    else:  # same rule for TPU3DSAD_FAST_MODE (bench/debug toggle)
        ops.set_fast_mode(os.environ.get("TPU3DSAD_FAST_MODE", "approx"))
    # same precedence rule as ops_impl/fast_mode (ADVICE r4): bf16_matmul=
    # True is the dataclass default ("unspecified"), so a user's global
    # JAX_DEFAULT_MATMUL_PRECISION (e.g. =highest for debugging) wins
    # there; bf16_matmul=False is an explicit fp32-parity request and
    # owns the global.
    if cfg.train.bf16_matmul:
        prec = os.environ.get("JAX_DEFAULT_MATMUL_PRECISION", "default")
    else:
        prec = "highest"
    jax.config.update("jax_default_matmul_precision", prec)


def round_steps_per_epoch(steps_per_epoch: int,
                          steps_per_call: int) -> tuple[int, int]:
    """(rounded steps_per_epoch, effective k) for the fused k-step block.

    Contract (config.py train.steps_per_call): epochs round DOWN to a
    multiple of k; k is clamped to steps_per_epoch so a tiny dataset with
    a large steps_per_call never oversamples an epoch (ADVICE r4 — the
    previous max(1, spe // k) * k rounded UP whenever spe < k)."""
    k = max(1, min(steps_per_call, steps_per_epoch))
    if k > 1:
        steps_per_epoch = (steps_per_epoch // k) * k
    return steps_per_epoch, k


def check_and_record_train_meta(ckpt_dir: str, steps_per_epoch: int,
                                steps_per_call: int, *,
                                resumed: bool) -> str | None:
    """Record steps_per_epoch in <ckpt_dir>/train_meta.json; on resume,
    return a warning string if the checkpointed run used a different value
    — resuming under a steps_per_call whose rounding changes steps_per_epoch
    remaps epoch boundaries (start_step // steps_per_epoch) and shifts the
    lr-decay/BN-momentum schedules (ADVICE r3)."""
    import json

    path = os.path.join(os.path.abspath(ckpt_dir), "train_meta.json")
    warning = None
    if resumed and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f).get("steps_per_epoch")
        if prev is not None and prev != steps_per_epoch:
            warning = (
                f"WARNING: resuming with steps_per_epoch={steps_per_epoch} "
                f"(train.steps_per_call={steps_per_call}) but the "
                f"checkpointed run used {prev} — epoch boundaries and the "
                "lr-decay/BN-momentum schedules will shift; use the original "
                "steps_per_call to preserve them"
            )
            # keep the ORIGINAL baseline on disk: overwriting it with the
            # mismatched value would invert the warning on the next resume
            # and lose the schedule the checkpoint was trained under
            return warning
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"steps_per_epoch": steps_per_epoch,
                   "steps_per_call": steps_per_call}, f)
    return warning


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Lineage-style step decay: lr * rate_i after epoch boundary i."""
    boundaries = {
        int(e) * steps_per_epoch: float(r)
        for e, r in zip(cfg.lr_decay_steps, cfg.lr_decay_rates)
    }
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def bn_momentum_at(cfg: TrainConfig, epoch):
    """Lineage BNMomentumScheduler: torch-momentum starts at
    cfg.bn_momentum_init, halved every cfg.bn_decay_epochs, floored so the
    flax running-average weight never exceeds cfg.bn_momentum_max.
    flax weight = 1 - torch_momentum."""
    torch_m = jnp.maximum(
        cfg.bn_momentum_init * (0.5 ** (epoch // cfg.bn_decay_epochs)),
        1.0 - cfg.bn_momentum_max,
    )
    return 1.0 - torch_m


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    sched = lr_schedule(cfg, steps_per_epoch)
    if cfg.weight_decay > 0:
        # AdamW: decay applied after Adam preconditioning but INSIDE the -lr
        # scaling, so wd>0 shrinks weights (regression test:
        # tests/e2e/test_weight_decay.py). Chaining add_decayed_weights
        # after optax.adam would ADD +wd*params to the final update instead.
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    else:
        tx = optax.adam(sched)
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def create_state(model, example_batch_fn, tx, rng) -> TrainState:
    """Init params/batch_stats with a jitted model.init on example inputs."""
    variables = jax.jit(example_batch_fn)(rng)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


# ---------------------------------------------------------------- classifier


def classifier_loss_fn(model, params, batch_stats, batch, rng, bn_momentum):
    outputs, updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["points"],
        mask=batch["mask"],
        train=True,
        bn_momentum=bn_momentum,
        mutable=["batch_stats"],
        rngs={"dropout": rng},
    )
    loss = optax.softmax_cross_entropy_with_integer_labels(
        outputs, batch["labels"]
    ).mean()
    acc = jnp.mean(jnp.argmax(outputs, -1) == batch["labels"])
    return loss, (updates["batch_stats"], {"loss": loss, "acc": acc})


@partial(jax.jit, static_argnums=0, donate_argnums=1)
def classifier_train_step(model, state: TrainState, batch, rng, bn_momentum):
    def lf(p):
        return classifier_loss_fn(
            model, p, state.batch_stats, batch, rng, bn_momentum
        )

    (_, (new_stats, metrics)), grads = jax.value_and_grad(lf, has_aux=True)(
        state.params
    )
    state = state.apply_gradients(grads=grads, batch_stats=new_stats)
    return state, metrics


@partial(jax.jit, static_argnums=0)
def classifier_eval_step(model, state: TrainState, batch):
    """Batch metrics; honors an optional scene_mask [B] (val tail-batch
    padding from iter_val_batches) so padded items don't bias acc/loss."""
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["points"],
        mask=batch["mask"],
        train=False,
    )
    correct = (jnp.argmax(logits, -1) == batch["labels"]).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, batch["labels"]
    )
    sm = batch.get("scene_mask")
    w = jnp.ones_like(correct) if sm is None else sm.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return {
        "acc": jnp.sum(correct * w) / denom,
        "loss": jnp.sum(ce * w) / denom,
        "n_valid": jnp.sum(w),
    }


# ----------------------------------------------------------------- detector


def _make_detector_step_body(model, cfg: Config,
                             aug_dataset: str | None = None):
    """The un-jitted single-step body (state, batch, rng, bn_momentum) ->
    (state, metrics), shared by the jitted per-step path and the scanned
    k-steps-per-dispatch block (make_detector_train_block)."""
    from tpu3dsad.data.device_pipeline import decode_compact_votes
    from tpu3dsad.losses import detection_loss

    mean_sizes = model._mean_sizes()
    nh = cfg.model.num_heading_bins
    bank = tuple(cfg.model.cluster_radius_bank)
    device_aug = cfg.data.device_augment and cfg.data.augment
    if device_aug:
        from tpu3dsad.data.augment import resolve_aug

        # the dataset's lineage recipe (or the custom fields) — same
        # resolution the host loaders use
        aug_params = resolve_aug(cfg.data, aug_dataset or cfg.data.name)

    def loss_fn(params, batch_stats, batch, rng, bn_momentum):
        end_points, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["points"],
            batch.get("point_features"),
            mask=batch["point_mask"],
            train=True,
            bn_momentum=bn_momentum,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss, metrics = detection_loss(
            end_points, batch, mean_sizes, nh, bank,
            near=cfg.model.assign_near, far=cfg.model.assign_far,
            center_norm=cfg.model.center_loss_norm,
        )
        return loss, (updates["batch_stats"], metrics)

    def step_body(state: TrainState, batch, rng, bn_momentum):
        # compact-votes feeds (data.compact_votes) ship int8 owners; build
        # the float targets on device before anything consumes them
        batch = decode_compact_votes(batch, cfg.data.vote_candidates)
        if device_aug:  # flip/rot/scale on device (data.device_augment)
            from tpu3dsad.data.device_pipeline import augment_batch

            rng, akey = jax.random.split(rng)
            batch = augment_batch(batch, akey, **aug_params)
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng, bn_momentum)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, metrics

    @jax.jit
    def eval_step(state: TrainState, batch):
        batch = decode_compact_votes(batch, cfg.data.vote_candidates)
        end_points = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["points"],
            batch.get("point_features"),
            mask=batch["point_mask"],
            train=False,
        )
        loss, metrics = detection_loss(
            end_points, batch, mean_sizes, nh, bank,
            near=cfg.model.assign_near, far=cfg.model.assign_far,
            center_norm=cfg.model.center_loss_norm,
        )
        return end_points, metrics

    return step_body, eval_step


def make_detector_steps(model, cfg: Config, aug_dataset: str | None = None):
    """Build jitted train/eval steps for the detector, closed over statics.

    aug_dataset overrides which lineage augmentation preset device
    augmentation resolves (a PACKED dataset's scenes keep their source
    recipe — data/packed.py header). Defaults to cfg.data.name.

    Returns (train_step(state, batch, rng, bn_momentum) -> (state, metrics),
             eval_step(state, batch) -> (end_points, metrics))."""
    step_body, eval_step = _make_detector_step_body(model, cfg, aug_dataset)
    return jax.jit(step_body, donate_argnums=0), eval_step


def make_detector_train_block(model, cfg: Config, k: int,
                              aug_dataset: str | None = None,
                              synth_fn=None):
    """k train steps fused into ONE jitted dispatch (train.steps_per_call).

    The per-call tunnel dispatch (~30-60ms) made end-to-end training run at
    half the device's measured step throughput (VERDICT r2 weak #2); a
    lax.scan over k device-resident batches pays it once per k steps.

    Returns block(state, batches, key, bn_momentum) -> (state, metrics)
    where `batches` is the standard batch dict with an extra LEADING k axis
    on every leaf and `metrics` are stacked [k]. Step i uses
    jax.random.fold_in(key, i) — the per-step RNG schedule is part of the
    block's contract (tests pin block == k sequential folded single steps).

    With synth_fn (device_synth mode), batches are generated INSIDE the
    scan — pass batches=None; zero host work or link bytes per block.
    """
    step_body, _ = _make_detector_step_body(model, cfg, aug_dataset)

    def block(state: TrainState, batches, key, bn_momentum):
        if synth_fn is None:
            def body(carry, xs):
                i, batch = xs
                return step_body(
                    carry, batch, jax.random.fold_in(key, i), bn_momentum
                )

            xs = (jnp.arange(k), batches)
        else:
            def body(carry, i):
                # batch lane k+i never collides with step lane i (both < k)
                batch = synth_fn(jax.random.fold_in(key, k + i))
                return step_body(
                    carry, batch, jax.random.fold_in(key, i), bn_momentum
                )

            xs = jnp.arange(k)
        return jax.lax.scan(body, state, xs)

    return jax.jit(block, donate_argnums=0)


# ------------------------------------------------------------- checkpointing


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int, keep: int = 3):
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(
            step,
            args=ocp.args.StandardSave(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state, "step": step}
            ),
        )


def save_best_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                         metric: float) -> bool:
    """Best-metric retention next to the rolling last-k (SURVEY.md §5
    "orbax keeps last-k + best-mAP"): when `metric` (higher is better —
    the eval mAP) improves on the recorded best, snapshot into
    `<ckpt_dir>/best` (max_to_keep=1) and record it in `<ckpt_dir>/best.json`.
    Returns True when a new best was written."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    rec_path = os.path.join(path, "best.json")
    best = -float("inf")
    if os.path.exists(rec_path):
        with open(rec_path) as f:
            best = json.load(f)["metric"]
    if metric <= best:
        return False
    with ocp.CheckpointManager(
        os.path.join(path, "best"),
        options=ocp.CheckpointManagerOptions(max_to_keep=1),
    ) as mgr:
        mgr.save(
            step,
            args=ocp.args.StandardSave(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state, "step": step}
            ),
        )
    with open(rec_path, "w") as f:
        json.dump({"metric": float(metric), "step": int(step)}, f)
    return True


def restore_checkpoint(ckpt_dir: str, state: TrainState,
                       for_eval: bool = False,
                       use_best: bool = False) -> tuple[TrainState, int]:
    """Auto-resume contract (lineage train.py): restore latest if present.

    for_eval=True restores params/batch_stats/step only, skipping the
    optimizer state — eval never uses it, and requiring the caller to
    reconstruct the training optimizer (adam vs adamw vs grad-clip chain)
    just to deserialize a checkpoint is a footgun. use_best=True reads the
    best-mAP snapshot (save_best_checkpoint) instead of the latest."""
    import orbax.checkpoint as ocp

    if use_best:
        ckpt_dir = os.path.join(ckpt_dir, "best")
    path = os.path.abspath(ckpt_dir)
    if not os.path.isdir(path):
        return state, 0
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return state, 0
        if for_eval:
            # targetless restore returns the raw saved tree; we take only
            # params/batch_stats/step and never touch opt_state
            restored = mgr.restore(step)
        else:
            target = {"params": state.params,
                      "batch_stats": state.batch_stats,
                      "opt_state": state.opt_state, "step": 0}
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(target)
            )
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        step=restored["step"],
        **({} if for_eval else {"opt_state": restored["opt_state"]}),
    )
    return state, int(restored["step"])
