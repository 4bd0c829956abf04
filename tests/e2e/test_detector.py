"""Detector end-to-end: wiring smoke (fast) + synthetic overfit canary (slow)
covering benchmark config #2's pipeline (SURVEY.md §4.5/4.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad import train_lib
from tpu3dsad.config import Config, ModelConfig, TrainConfig, apply_overrides
from tpu3dsad.data.registry import SyntheticDetectionDataset
from tpu3dsad.eval.ap import APCalculator
from tpu3dsad.eval.parse import (
    parse_groundtruths,
    parse_predictions,
    predictions_to_lists,
)
from tpu3dsad.models.detector import SizeAdaptiveDetector


def _tiny_cfg(num_points=1024, batch=2):
    cfg = Config(
        model=ModelConfig(
            num_classes=4,
            sa_npoints=(256, 128, 64, 32),
            sa_nsamples=(16, 16, 8, 8),
            sa_channels=((32, 32), (32, 64), (32, 64), (32, 64)),
            fp_channels=((64, 64), (64, 64)),
            seed_feat_dim=64,
            num_proposals=32,
            cluster_nsample=8,
        ),
        train=TrainConfig(batch_size=batch, lr=2e-3),
    )
    return apply_overrides(cfg, [f"data.num_points={num_points}", "data.max_boxes=16",
                                 "data.name=synthetic"])


def _setup(cfg):
    ds = SyntheticDetectionDataset(cfg)
    rng = np.random.default_rng(0)
    batch_np = ds.train_batch(rng, cfg.train.batch_size)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = SizeAdaptiveDetector(cfg.model)
    tx = train_lib.make_optimizer(cfg.train, 100)
    state = train_lib.create_state(
        model,
        lambda k: model.init(
            k, batch["points"], mask=batch["point_mask"], train=False
        ),
        tx,
        jax.random.key(0),
    )
    return model, state, batch, batch_np


def test_detector_wiring_and_eval_path():
    cfg = _tiny_cfg()
    model, state, batch, batch_np = _setup(cfg)
    train_step, eval_step = train_lib.make_detector_steps(model, cfg)
    state, metrics = train_step(state, batch, jax.random.key(1), 0.9)
    assert np.isfinite(float(metrics["loss"]))

    end_points, em = eval_step(state, batch)
    parsed = parse_predictions(
        end_points, model._mean_sizes(), cfg.model.num_heading_bins, cfg.eval
    )
    assert parsed["keep"].shape == (2, cfg.model.num_proposals)
    preds = predictions_to_lists(parsed, cfg.eval, cfg.model.num_classes)
    gts = parse_groundtruths(batch_np)
    calc = APCalculator(0.25)
    calc.step(preds, gts)
    m = calc.compute_metrics()
    assert 0.0 <= m["mAP"] <= 1.0  # untrained: wiring only


@pytest.mark.slow
def test_detector_overfits_synthetic_scenes():
    cfg = _tiny_cfg()
    model, state, batch, batch_np = _setup(cfg)
    train_step, eval_step = train_lib.make_detector_steps(model, cfg)

    key = jax.random.key(1)
    first = None
    for step in range(300):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub, 0.9)
        if first is None:
            first = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < first * 0.5, (first, final_loss)
    assert float(metrics["obj_acc"]) > 0.9
    assert float(metrics["pos_ratio"]) > 0.05  # votes collapsed onto objects

    # box-level: overfit detector should find the training boxes
    end_points, _ = eval_step(state, batch)
    parsed = parse_predictions(
        end_points, model._mean_sizes(), cfg.model.num_heading_bins, cfg.eval
    )
    preds = predictions_to_lists(parsed, cfg.eval, cfg.model.num_classes)
    gts = parse_groundtruths(batch_np)
    calc = APCalculator(0.25)
    calc.step(preds, gts)
    m = calc.compute_metrics()
    assert m["mAP"] > 0.3, m


def test_detector_forward_under_sorted_fast_mode(monkeypatch):
    """The detector's SA stack must compose with fast_mode='sorted' (the
    Z-order tier): pallas impl, gate lowered so SA1 (N=1024) takes the
    sorted path while deeper layers fall back to approx. Interpret mode —
    checks wiring/masking composition, not speed."""
    import importlib

    from jax.experimental.pallas import tpu as pltpu

    from tpu3dsad import ops

    pbq = importlib.import_module("tpu3dsad.ops.pallas.ball_query")

    cfg = _tiny_cfg()
    model, state, batch, _ = _setup(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    old_impl, old_mode = ops.get_default_impl(), ops.get_fast_mode()
    monkeypatch.setattr(pbq, "_SORTED_MIN_N", 512)
    ops.set_default_impl("pallas")
    ops.set_fast_mode("sorted")
    try:
        with pltpu.force_tpu_interpret_mode():
            end_points = model.apply(
                variables, batch["points"], mask=batch["point_mask"],
                train=False,
            )
    finally:
        ops.set_default_impl(old_impl)
        ops.set_fast_mode(old_mode)

    assert end_points["center"].shape == (2, cfg.model.num_proposals, 3)
    for k in ("center", "objectness_scores", "heading_scores", "vote_xyz"):
        assert bool(np.isfinite(np.asarray(end_points[k])).all()), k
