"""k-steps-per-dispatch training (train.steps_per_call): the scanned block
must be exactly k sequential single steps (same params, same metrics), and
the run_detector loop must drive it end-to-end, including the on-device
synthetic generator variant."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad import train_lib
from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.registry import SyntheticDetectionDataset
from tpu3dsad.models.detector import SizeAdaptiveDetector

from tests.e2e.test_detector import _tiny_cfg


def _fresh_state(cfg, model, batch):
    tx = train_lib.make_optimizer(cfg.train, 100)
    return train_lib.create_state(
        model,
        lambda k: model.init(
            k, batch["points"], mask=batch["point_mask"], train=False
        ),
        tx,
        jax.random.key(0),
    )


def test_train_block_is_bitwise_k_sequential_steps():
    """block(state, stacked, key, m) == k single jitted steps on the same
    batches with jax.random.fold_in(key, i) — params, batch_stats and the
    stacked metrics all bitwise (CPU fp32)."""
    cfg = _tiny_cfg(num_points=512, batch=2)
    ds = SyntheticDetectionDataset(cfg)
    rng = np.random.default_rng(0)
    k = 4
    raw = [ds.train_batch(rng, cfg.train.batch_size) for _ in range(k)]
    stacked = {
        n: jnp.asarray(np.stack([b[n] for b in raw])) for n in raw[0]
    }
    single = [{n: jnp.asarray(v) for n, v in b.items()} for b in raw]
    model = SizeAdaptiveDetector(cfg.model)

    key = jax.random.key(7)
    block = train_lib.make_detector_train_block(model, cfg, k)
    state_a = _fresh_state(cfg, model, single[0])
    state_a, mstack = block(state_a, stacked, key, 0.9)

    train_step, _ = train_lib.make_detector_steps(model, cfg)
    state_b = _fresh_state(cfg, model, single[0])
    seq_metrics = []
    for i in range(k):
        state_b, m = train_step(
            state_b, single[i], jax.random.fold_in(key, i), 0.9
        )
        seq_metrics.append(m)

    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for sa, sb in zip(jax.tree.leaves(state_a.batch_stats),
                      jax.tree.leaves(state_b.batch_stats)):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    for n in mstack:
        got = np.asarray(mstack[n])
        want = np.asarray([float(m[n]) for m in seq_metrics])
        np.testing.assert_array_equal(got, want.astype(got.dtype),
                                      err_msg=n)


@pytest.mark.slow
def test_run_detector_steps_per_call(tmp_path, capsys):
    """The loop end-to-end with k=2 on the 8-virtual-device mesh: stacked
    [k,B,...] feed sharded P(None,'data'), per-step JSONL log rows at the
    exact log_every boundaries, checkpoint written."""
    from tpu3dsad.train_detector import run_detector

    cfg = apply_overrides(
        Config(),
        [
            "model.name=detector", "data.name=synthetic",
            "data.num_points=512", "data.max_boxes=8", "model.num_classes=4",
            "model.sa_npoints=(128,64,32,16)", "model.sa_nsamples=(8,8,4,4)",
            "model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
            "model.fp_channels=((32,32),(32,32))", "model.seed_feat_dim=32",
            "model.num_proposals=16", "model.cluster_nsample=4",
            "train.batch_size=8", "train.num_epochs=1", "train.eval_every=1",
            "train.log_every=4", "train.steps_per_call=2",
            f"train.ckpt_dir={tmp_path}/ckpt",
        ],
    )
    run_detector(cfg)
    out = capsys.readouterr().out.strip().splitlines()
    records = [json.loads(line) for line in out if line.startswith("{")]
    # synthetic: 8 steps/epoch, k=2 -> 4 blocks; log rows at steps 4 and 8
    steps = [r["step"] for r in records if "train/loss" in r]
    assert steps == [4, 8], steps
    assert any("scenes_per_sec" in r for r in records)
    assert any("eval/mAP@0.25" in r for r in records)
    assert (tmp_path / "ckpt").exists()


@pytest.mark.slow
def test_run_detector_steps_per_call_device_synth(tmp_path, capsys):
    """device_synth + k>1: batches are generated INSIDE the scanned block
    (no host feed at all)."""
    from tpu3dsad.train_detector import run_detector

    cfg = apply_overrides(
        Config(),
        [
            "model.name=detector", "data.name=synthetic",
            "data.device_synth=true",
            "data.num_points=512", "data.max_boxes=8", "model.num_classes=4",
            "model.sa_npoints=(128,64,32,16)", "model.sa_nsamples=(8,8,4,4)",
            "model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
            "model.fp_channels=((32,32),(32,32))", "model.seed_feat_dim=32",
            "model.num_proposals=16", "model.cluster_nsample=4",
            "train.batch_size=8", "train.num_epochs=1",
            "train.eval_every=100", "train.log_every=4",
            "train.steps_per_call=4",
            f"train.ckpt_dir={tmp_path}/ckpt",
        ],
    )
    run_detector(cfg)
    out = capsys.readouterr().out.strip().splitlines()
    records = [json.loads(line) for line in out if line.startswith("{")]
    losses = [r["train/loss"] for r in records if "train/loss" in r]
    assert losses and all(np.isfinite(v) for v in losses)
    assert any("scenes_per_sec" in r for r in records)
