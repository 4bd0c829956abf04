"""Evaluation entry point: restore a checkpoint, run the val sweep, print AP.

Lineage: eval.py (SURVEY.md §2.2/§3.2).
Usage: python eval.py data.name=synthetic train.ckpt_dir=./ckpt [overrides]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad import train_lib
from tpu3dsad.config import describe, parse_cli
from tpu3dsad.data import get_dataset
from tpu3dsad.eval.parse import parse_predictions
from tpu3dsad.train_detector import build_detector, evaluate


def main(argv):
    from tpu3dsad.utils.platform import force_platform_from_env

    force_platform_from_env()  # TPU3DSAD_PLATFORM=cpu|axon, pre-backend-init
    cfg = parse_cli(argv)
    print(describe(cfg), file=sys.stderr)
    from tpu3dsad import train_lib as _tl

    _tl.apply_runtime_config(cfg)
    if cfg.model.name == "classifier":
        return eval_classifier(cfg)
    dataset = get_dataset(cfg)
    model = build_detector(cfg, dataset.mean_sizes)

    rng = np.random.default_rng(0)
    example = dataset.train_batch(rng, cfg.train.batch_size)
    ex = {k: jnp.asarray(v) for k, v in example.items()}
    tx = train_lib.make_optimizer(cfg.train, 100)
    state = train_lib.create_state(
        model,
        lambda k: model.init(
            k, ex["points"], ex.get("point_features"),
            mask=ex["point_mask"], train=False,
        ),
        tx,
        jax.random.key(0),
    )
    state, step = train_lib.restore_checkpoint(
        cfg.train.ckpt_dir, state, for_eval=True,
        use_best=cfg.eval.use_best,
    )
    if step == 0:
        print("WARNING: no checkpoint found — evaluating random weights",
              file=sys.stderr)

    _, eval_step = train_lib.make_detector_steps(model, cfg)
    parse = jax.jit(
        lambda ep: parse_predictions(
            ep, model._mean_sizes(), cfg.model.num_heading_bins, cfg.eval
        )
    )
    # distributed eval: shard the val sweep over the data-parallel mesh
    # (train.mesh_shape, same flag as training; single device = no-op)
    from tpu3dsad.parallel import make_mesh

    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    metrics = evaluate(cfg, model, state, dataset, eval_step, parse,
                       mesh=mesh)
    print(json.dumps({"ckpt_step": step, **metrics}))


def eval_classifier(cfg):
    """Val accuracy sweep for the classification model (config #1)."""
    from tpu3dsad.data.synthetic import classification_batch

    rng = np.random.default_rng(999)
    if cfg.data.name == "modelnet":
        from tpu3dsad.data.modelnet import ModelNetClassificationDataset

        ds = ModelNetClassificationDataset(cfg)
        num_classes = ds.num_classes
        batches = list(ds.val_batches(rng, cfg.train.batch_size))
        if not batches:
            raise SystemExit("no val items found under data.root")
    else:
        num_classes = cfg.model.num_classes
        batches = [
            classification_batch(
                rng, cfg.train.batch_size, cfg.data.num_points, num_classes
            )
            for _ in range(4)
        ]

    from tpu3dsad.models.classifier import build_classifier

    model = build_classifier(cfg, num_classes)
    ex = {k: jnp.asarray(v) for k, v in batches[0].items()}
    tx = train_lib.make_optimizer(cfg.train, 100)
    state = train_lib.create_state(
        model,
        lambda k: model.init(k, ex["points"], mask=ex["mask"], train=False),
        tx,
        jax.random.key(0),
    )
    state, step = train_lib.restore_checkpoint(
        cfg.train.ckpt_dir, state, for_eval=True,
        use_best=cfg.eval.use_best,
    )
    if step == 0:
        print("WARNING: no checkpoint found — evaluating random weights",
              file=sys.stderr)
    accs, losses, weights = [], [], []
    for b in batches:
        m = train_lib.classifier_eval_step(
            model, state, {k: jnp.asarray(v) for k, v in b.items()}
        )
        accs.append(float(m["acc"]))
        losses.append(float(m["loss"]))
        weights.append(float(m["n_valid"]))  # tail batches carry fewer items
    print(json.dumps({
        "ckpt_step": step,
        "val_acc": round(float(np.average(accs, weights=weights)), 4),
        "val_loss": round(float(np.average(losses, weights=weights)), 4),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
