"""Training entry point.

TPU-native counterpart of the lineage's train.py (SURVEY.md §2.2/§3.1).
Usage:
    python train.py model.name=classifier data.name=synthetic train.num_epochs=2
    python train.py model.name=detector data.name=scannet data.root=/data/scannet

Config overrides are `section.key=value` pairs (see tpu3dsad/config.py).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

from tpu3dsad.config import parse_cli, describe


def main(argv):
    from tpu3dsad.utils.platform import force_platform_from_env

    force_platform_from_env()  # TPU3DSAD_PLATFORM=cpu|axon, pre-backend-init
    cfg = parse_cli(argv)
    print(describe(cfg), file=sys.stderr)
    from tpu3dsad import train_lib as _tl

    _tl.apply_runtime_config(cfg)

    if cfg.model.name == "classifier":
        run_classifier(cfg)
    elif cfg.model.name == "detector":
        from tpu3dsad.train_detector import run_detector

        run_detector(cfg)
    else:
        raise SystemExit(f"unknown model.name={cfg.model.name}")


def run_classifier(cfg):
    import jax.numpy as jnp

    from tpu3dsad import train_lib
    from tpu3dsad.data.synthetic import classification_batch
    from tpu3dsad.parallel import make_mesh, shard_batch

    train_lib.apply_runtime_config(cfg)
    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    rng_np = np.random.default_rng(cfg.train.seed)
    if cfg.data.name == "modelnet":
        from tpu3dsad.data.modelnet import ModelNetClassificationDataset

        ds = ModelNetClassificationDataset(cfg)
        steps_per_epoch = ds.steps_per_epoch(cfg.train.batch_size)
        num_classes = ds.num_classes
        make_batch = lambda: ds.train_batch(rng_np, cfg.train.batch_size)
    else:
        steps_per_epoch = 100
        num_classes = cfg.model.num_classes
        make_batch = lambda: classification_batch(
            rng_np, cfg.train.batch_size, cfg.data.num_points, num_classes
        )
    from tpu3dsad.models.classifier import build_classifier

    model = build_classifier(cfg, num_classes)
    example = make_batch()
    example_j = {k: jnp.asarray(v) for k, v in example.items()}

    tx = train_lib.make_optimizer(cfg.train, steps_per_epoch)
    state = train_lib.create_state(
        model,
        lambda k: model.init(
            k, example_j["points"], mask=example_j["mask"], train=False
        ),
        tx,
        jax.random.key(cfg.train.seed),
    )
    state, start_step = train_lib.restore_checkpoint(cfg.train.ckpt_dir, state)
    if start_step:
        print(f"resumed from step {start_step}", file=sys.stderr)

    key = jax.random.key(cfg.train.seed + 1)
    step = start_step
    for epoch in range(start_step // steps_per_epoch, cfg.train.num_epochs):
        bn_m = train_lib.bn_momentum_at(cfg.train, epoch)
        t0 = time.time()
        for _ in range(steps_per_epoch):
            batch = make_batch()
            batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
            key, sub = jax.random.split(key)
            state, metrics = train_lib.classifier_train_step(
                model, state, batch, sub, bn_m
            )
            step += 1
            if step % cfg.train.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(json.dumps({"step": step, "epoch": epoch, **m}))
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "epoch": epoch,
                    "epoch_time_s": round(dt, 2),
                    "clouds_per_sec": round(
                        steps_per_epoch * cfg.train.batch_size / dt, 2
                    ),
                }
            )
        )
        if ((epoch + 1) % cfg.train.eval_every == 0
                or epoch == cfg.train.num_epochs - 1):
            # held-out accuracy — the lineage anchor metric (ModelNet40
            # 91.9%, SURVEY.md §6); synthetic data has no fixed val split,
            # so fresh clouds stand in for it there
            if cfg.data.name == "modelnet":
                val_iter = ds.val_batches(rng_np, cfg.train.batch_size)
            else:
                val_iter = (make_batch() for _ in range(8))
            tot_acc = tot_loss = tot_n = 0.0
            for vb in val_iter:
                m = train_lib.classifier_eval_step(
                    model, state, {k: jnp.asarray(v) for k, v in vb.items()}
                )
                n = float(m["n_valid"])
                tot_acc += float(m["acc"]) * n
                tot_loss += float(m["loss"]) * n
                tot_n += n
            print(json.dumps({
                "step": step, "eval/epoch": epoch,
                "eval/val_acc": round(tot_acc / max(tot_n, 1.0), 4),
                "eval/val_loss": round(tot_loss / max(tot_n, 1.0), 4),
                "eval/n_scenes": int(tot_n),
            }))
        if ((epoch + 1) % max(1, cfg.train.ckpt_every) == 0
                or epoch == cfg.train.num_epochs - 1):
            train_lib.save_checkpoint(cfg.train.ckpt_dir, state, step)


if __name__ == "__main__":
    main(sys.argv[1:])
