"""Compact-votes wire format (data.compact_votes): the int8 vote_owner
feed must reconstruct EXACTLY the targets the expanded host path ships —
decoder semantics (device_pipeline.expand_votes/decode_compact_votes)
are pinned against the scannet loader + pipeline.candidate_votes, and a
train step fed compact batches must match one fed expanded batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.e2e.test_datasets import _write_scannet

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.device_pipeline import decode_compact_votes
from tpu3dsad.data.registry import get_dataset


def _cfg(root, compact, extra=()):
    return apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={root}", "data.num_points=512",
         "data.max_boxes=8", "data.vote_candidates=3", "data.augment=false",
         f"data.compact_votes={'true' if compact else 'false'}", *extra],
    )


@pytest.fixture
def scannet_root(tmp_path):
    _write_scannet(tmp_path, split="train", scans=4)
    return tmp_path


def _batches(root, rng_seed=0, batch=4, extra=()):
    """The same scenes through both vote formats (identical rng streams)."""
    exp = get_dataset(_cfg(root, False, extra)).train_batch(
        np.random.default_rng(rng_seed), batch
    )
    cmp = get_dataset(_cfg(root, True, extra)).train_batch(
        np.random.default_rng(rng_seed), batch
    )
    return exp, cmp


def test_decode_matches_host_expansion(scannet_root):
    exp, cmp = _batches(scannet_root)
    assert cmp["vote_owner"].dtype == np.int8
    assert "vote_targets" not in cmp
    dec = decode_compact_votes(
        {k: jnp.asarray(v) for k, v in cmp.items()}, vote_candidates=3
    )
    assert "vote_owner" not in dec
    np.testing.assert_array_equal(
        np.asarray(dec["vote_mask"]), exp["vote_mask"]
    )
    np.testing.assert_array_equal(
        np.asarray(dec["vote_targets"]), exp["vote_targets"]
    )
    # everything else rides through untouched
    for k in exp:
        if k not in ("vote_targets", "vote_mask"):
            np.testing.assert_array_equal(np.asarray(dec[k]), exp[k])


def test_decode_v1(scannet_root):
    exp, cmp = _batches(scannet_root, extra=("data.vote_candidates=1",))
    dec = decode_compact_votes(
        {k: jnp.asarray(v) for k, v in cmp.items()}, vote_candidates=1
    )
    assert dec["vote_targets"].shape == exp["vote_targets"].shape == (
        4, 512, 3
    )
    np.testing.assert_array_equal(
        np.asarray(dec["vote_targets"]), exp["vote_targets"]
    )


def test_decode_noop_on_expanded_batch(scannet_root):
    exp, _ = _batches(scannet_root)
    j = {k: jnp.asarray(v) for k, v in exp.items()}
    assert decode_compact_votes(j, 3) is j


def test_train_step_identical_under_both_formats(scannet_root):
    """One jitted detector train step: compact feed == expanded feed,
    bitwise in every metric and in the updated params."""
    from tpu3dsad import train_lib
    from tpu3dsad.train_detector import build_detector

    cfg = apply_overrides(
        _cfg(scannet_root, False),
        ["model.num_classes=18", "model.num_proposals=16",
         "model.sa_npoints=(64,32,16,8)", "model.sa_nsamples=(8,8,4,4)"],
    )
    ds = get_dataset(cfg)
    model = build_detector(cfg, ds.mean_sizes)
    exp, cmp = _batches(scannet_root)
    ej = {k: jnp.asarray(v) for k, v in exp.items()}
    cj = {k: jnp.asarray(v) for k, v in cmp.items()}

    tx = train_lib.make_optimizer(cfg.train, 10)
    state = train_lib.create_state(
        model,
        lambda k: model.init(k, ej["points"], mask=ej["point_mask"],
                             train=False),
        tx,
        jax.random.key(0),
    )
    train_step, _ = train_lib.make_detector_steps(model, cfg)
    rng = jax.random.key(1)
    s1, m1 = train_step(state, ej, rng, 0.9)
    # donate_argnums=0 consumed `state`: rebuild it identically
    state2 = train_lib.create_state(
        model,
        lambda k: model.init(k, ej["points"], mask=ej["point_mask"],
                             train=False),
        tx,
        jax.random.key(0),
    )
    s2, m2 = train_step(state2, cj, rng, 0.9)
    for k in m1:
        np.testing.assert_array_equal(
            np.asarray(m1[k]), np.asarray(m2[k]), err_msg=k
        )
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
