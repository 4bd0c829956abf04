"""Detector training loop (lineage train.py detection path, SURVEY.md §3.1).

One jitted train_step per batch; periodic on-train-data AP eval via the
on-device parse (decode+NMS) + host APCalculator; orbax checkpoints with
auto-resume.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad import train_lib
from tpu3dsad.config import Config
from tpu3dsad.data import get_dataset
from tpu3dsad.eval.ap import APCalculator
from tpu3dsad.eval.parse import (
    parse_groundtruths,
    parse_predictions,
    predictions_to_lists,
)
from tpu3dsad.models.detector import SizeAdaptiveDetector
from tpu3dsad.parallel import make_mesh, shard_batch


def build_detector(cfg: Config, mean_sizes=None):
    return SizeAdaptiveDetector(
        cfg.model,
        mean_sizes=tuple(map(tuple, mean_sizes)) if mean_sizes is not None else None,
    )


def run_detector(cfg: Config):
    train_lib.apply_runtime_config(cfg)
    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    if cfg.data.device_augment:
        # host loads CANONICAL scenes; flip/rot/scale runs inside the jitted
        # train step (data/device_pipeline.py — 1-core-host bottleneck fix)
        from dataclasses import replace

        dataset = get_dataset(
            replace(cfg, data=replace(cfg.data, augment=False))
        )
    else:
        dataset = get_dataset(cfg)
    if (cfg.data.name == "packed" and cfg.data.augment
            and not cfg.data.device_augment):
        raise ValueError(
            "packed scenes are canonical (packed with augment off): training "
            "with data.augment=true requires data.device_augment=true (the "
            "on-device flip/rot/scale path) — or set data.augment=false "
            "deliberately"
        )
    model = build_detector(cfg, dataset.mean_sizes)
    steps_per_epoch = dataset.steps_per_epoch(cfg.train.batch_size)
    # k>1 fuses k steps into one device dispatch (train.steps_per_call);
    # epochs round down to a multiple of k (scenes are sampled randomly, so
    # no scene is systematically skipped — epochs are step-count brackets).
    # Rounded BEFORE the optimizer so lr-decay boundaries match real epochs.
    steps_per_epoch, k = train_lib.round_steps_per_epoch(
        steps_per_epoch, cfg.train.steps_per_call
    )

    rng_np = np.random.default_rng(cfg.train.seed)
    example = dataset.train_batch(rng_np, cfg.train.batch_size)
    example_j = shard_batch({k: jnp.asarray(v) for k, v in example.items()}, mesh)

    tx = train_lib.make_optimizer(cfg.train, steps_per_epoch)
    state = train_lib.create_state(
        model,
        lambda k: model.init(
            k,
            example_j["points"],
            example_j.get("point_features"),
            mask=example_j["point_mask"],
            train=False,
        ),
        tx,
        jax.random.key(cfg.train.seed),
    )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"detector params: {n_params / 1e6:.2f}M", file=sys.stderr)
    state, start_step = train_lib.restore_checkpoint(cfg.train.ckpt_dir, state)
    if start_step:
        print(f"resumed from step {start_step}", file=sys.stderr)
    warning = train_lib.check_and_record_train_meta(
        cfg.train.ckpt_dir, steps_per_epoch, k, resumed=bool(start_step)
    )
    if warning:
        print(warning, file=sys.stderr)

    train_step, eval_step = train_lib.make_detector_steps(
        model, cfg,
        aug_dataset=getattr(dataset, "source_dataset", None),
    )
    parse = jax.jit(
        lambda ep: parse_predictions(
            ep, model._mean_sizes(), cfg.model.num_heading_bins, cfg.eval
        )
    )

    from tpu3dsad.utils.metrics import MetricsLogger

    logger = MetricsLogger(cfg.train.tb_dir)
    profiling = False
    if cfg.train.profile_dir:
        # SURVEY.md §5 tracing: capture a short window of real train steps
        jax.profiler.start_trace(cfg.train.profile_dir)
        profiling = True

    # input feed: fully on-device synthetic generation (zero host work and
    # zero link bytes per step) when enabled; otherwise background-thread
    # prefetch of host batches (lineage DataLoader workers — SURVEY.md §3.1)
    from tpu3dsad.data import Batcher

    device_synth = cfg.data.device_synth and cfg.data.name == "synthetic"
    train_block = None
    if k > 1:
        # the scanned k-step block; with device_synth the batches are
        # generated INSIDE the scan (zero host work / link bytes per block)
        synth_fn = None
        if device_synth:
            from tpu3dsad.data.device_pipeline import synthetic_detection_batch

            def synth_fn(bkey):
                return synthetic_detection_batch(
                    bkey, cfg.train.batch_size, cfg.data.num_points,
                    cfg.model.num_classes, cfg.data.max_boxes,
                    vote_candidates=cfg.data.vote_candidates,
                )

        train_block = train_lib.make_detector_train_block(
            model, cfg, k,
            aug_dataset=getattr(dataset, "source_dataset", None),
            synth_fn=synth_fn,
        )
    if device_synth:
        from tpu3dsad.data.device_pipeline import synthetic_detection_batch

        gen_key = jax.random.key(cfg.train.seed + 1234)

        def _gen():
            nonlocal gen_key
            gen_key, sub = jax.random.split(gen_key)
            return synthetic_detection_batch(
                sub, cfg.train.batch_size, cfg.data.num_points,
                cfg.model.num_classes, cfg.data.max_boxes,
                vote_candidates=cfg.data.vote_candidates,
            )

        batcher = None
        raw_batches = None if k > 1 else iter(_gen, object())  # infinite
    else:
        bsz = cfg.train.batch_size

        def _host_batch(rng, bsz=bsz, k=k):
            if k == 1:
                return dataset.train_batch(rng, bsz)
            # ONE bulk gather of k*B scenes, reshaped to a [k, B, ...] block
            flat = dataset.train_batch(rng, k * bsz)
            return {
                name: v.reshape((k, bsz) + v.shape[1:])
                for name, v in flat.items()
            }

        batcher = Batcher(_host_batch, seed=cfg.train.seed, prefetch=2)
        raw_batches = iter(batcher)
    # double-buffered device feed: batch i+1's host→HBM copy (or on-device
    # generation) is dispatched before step i is consumed (data/packed.py)
    from tpu3dsad.data.packed import device_prefetch

    batches = (
        None
        if raw_batches is None
        else device_prefetch(raw_batches, mesh, stacked=k > 1)
    )

    key = jax.random.key(cfg.train.seed + 1)
    step = start_step
    for epoch in range(start_step // steps_per_epoch, cfg.train.num_epochs):
        bn_m = train_lib.bn_momentum_at(cfg.train, epoch)
        t0 = time.time()
        if k > 1:
            for _ in range(steps_per_epoch // k):
                block = None if batches is None else next(batches)
                key, sub = jax.random.split(key)
                state, mstack = train_block(state, block, sub, bn_m)
                base = step
                step += k
                log_rows = [
                    j for j in range(k)
                    if (base + j + 1) % cfg.train.log_every == 0
                ]
                if log_rows:
                    mh = {n: np.asarray(v) for n, v in mstack.items()}
                    for j in log_rows:
                        m = {n: round(float(v[j]), 4) for n, v in mh.items()}
                        logger.log(base + j + 1, {"epoch": epoch, **m},
                                   prefix="train/")
            metrics = {n: v[-1] for n, v in mstack.items()}
        else:
            for _ in range(steps_per_epoch):
                batch = next(batches)  # already sharded by device_prefetch
                key, sub = jax.random.split(key)
                state, metrics = train_step(state, batch, sub, bn_m)
                step += 1
                if step % cfg.train.log_every == 0:
                    m = {n: round(float(v), 4) for n, v in metrics.items()}
                    logger.log(step, {"epoch": epoch, **m}, prefix="train/")
        # fetch one scalar to close the async dispatch pipe before timing
        # (block_until_ready is a no-op under the axon tunnel; steps are
        # sequential, so the last step's metrics sync the whole epoch)
        _ = float(metrics["loss"])
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "epoch": epoch,
                    "epoch_time_s": round(dt, 2),
                    "scenes_per_sec": round(
                        steps_per_epoch * cfg.train.batch_size / dt, 2
                    ),
                }
            )
        )
        if ((epoch + 1) % max(1, cfg.train.ckpt_every) == 0
                or epoch == cfg.train.num_epochs - 1):
            train_lib.save_checkpoint(cfg.train.ckpt_dir, state, step)
        if profiling:
            jax.profiler.stop_trace()  # first executed epoch only
            profiling = False

        if (epoch + 1) % cfg.train.eval_every == 0:
            m = evaluate(cfg, model, state, dataset, eval_step, parse,
                         mesh=mesh)
            flat = {k: v for k, v in m.items() if isinstance(v, (int, float))}
            logger.log(step, {"epoch": epoch, **flat}, prefix="eval/")
            per_cls = {k: v for k, v in m.items() if isinstance(v, dict)}
            if per_cls:
                print(json.dumps({"epoch": epoch, **per_cls}))
            # best-mAP retention (SURVEY §5): snapshot to <ckpt_dir>/best
            lead = m.get(f"mAP@{cfg.eval.ap_iou_threshs[0]}")
            if lead is not None and train_lib.save_best_checkpoint(
                cfg.train.ckpt_dir, state, step, lead
            ):
                print(json.dumps({"epoch": epoch, "new_best_mAP": lead}))
    if profiling:  # zero remaining epochs (resumed past num_epochs)
        jax.profiler.stop_trace()
    if batcher is not None:
        batcher.close()
    logger.flush()


def evaluate(cfg, model, state, dataset, eval_step, parse, num_batches=None,
             mesh=None):
    """Val sweep → AP table (lineage eval.py path, SURVEY.md §3.2).

    With `mesh`, each val batch is sharded over the data axis and the jitted
    eval/parse run SPMD; XLA inserts the cross-chip gather of the decoded
    fixed-shape detections when they are fetched for host AP (SURVEY.md §2.4
    "all_gather for prediction collection"). mAP is bitwise the same as the
    single-device sweep (tests/distributed/test_dp_eval.py)."""
    calc = {
        t: APCalculator(iou_thresh=t, class_names=dataset.class_names)
        for t in cfg.eval.ap_iou_threshs
    }
    rng = np.random.default_rng(12345)
    losses, loss_weights = [], []
    for i, batch_np in enumerate(dataset.val_batches(rng, cfg.train.batch_size)):
        if num_batches is not None and i >= num_batches:
            break
        # scene_mask marks tail-batch padding (iter_val_batches): padded
        # scenes are wrap-around duplicates and must not be scored twice.
        # It rides into the device batch so detection_loss excludes the
        # duplicates from the batch loss exactly (not just a down-weight).
        scene_mask = np.asarray(
            batch_np.pop("scene_mask", np.ones(cfg.train.batch_size, bool))
        )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        batch["scene_mask"] = jnp.asarray(scene_mask)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        end_points, metrics = eval_step(state, batch)
        losses.append(float(metrics["loss"]))
        loss_weights.append(float(scene_mask.mean()))
        parsed = parse(end_points)
        preds = predictions_to_lists(parsed, cfg.eval, cfg.model.num_classes)
        gts = parse_groundtruths(batch_np)
        preds = [p for p, v in zip(preds, scene_mask) if v]
        gts = [g for g, v in zip(gts, scene_mask) if v]
        for c in calc.values():
            c.step(preds, gts)
    out = {
        "val_loss": round(float(np.average(losses, weights=loss_weights)), 4)
        if losses
        else None
    }
    for t, c in calc.items():
        m = c.compute_metrics()
        out[f"mAP@{t}"] = round(m["mAP"], 4)
        out[f"AR@{t}"] = round(m["AR"], 4)
        out[f"per_class@{t}"] = {
            k[: -len(" AP")]: round(v, 4)
            for k, v in m.items()
            if k.endswith(" AP")
        }
    return out
