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


def test_truncated_owner_drops_supervision(tmp_path):
    """Scenes with more objects than data.max_boxes (config.py compact_votes
    KNOWN DIVERGENCE, ADVICE r3): the int8 owner cannot address a truncated
    box, so those points drop vote supervision (owner=-1 → vote_mask False),
    while the expanded path keeps their votes aimed at the truncated box's
    center. In-roster points stay bitwise identical across formats."""
    d = tmp_path / "train"
    d.mkdir(parents=True)
    g = 6  # boxes in the scene; the roster below keeps only 4
    n_per = 32
    n = g * n_per
    verts = np.zeros((n, 6), np.float32)
    ins = np.zeros(n, np.int64)
    sem = np.full(n, 5, np.int64)  # nyu40 5 = chair (benchmark class)
    bbox = np.zeros((g, 7), np.float32)
    for i in range(g):
        c = np.array([4.0 * i, 0.0, 0.0], np.float32)
        verts[i * n_per:(i + 1) * n_per, :3] = c + np.linspace(
            -0.2, 0.2, n_per
        )[:, None].astype(np.float32)
        ins[i * n_per:(i + 1) * n_per] = i + 1
        bbox[i] = [*c, 1, 1, 1, 5]
    np.save(d / "scene0000_vert.npy", verts)
    np.save(d / "scene0000_ins_label.npy", ins)
    np.save(d / "scene0000_sem_label.npy", sem)
    np.save(d / "scene0000_bbox.npy", bbox)

    def cfg(compact):
        return apply_overrides(
            Config(),
            ["data.name=scannet", f"data.root={tmp_path}",
             f"data.num_points={n}", "data.max_boxes=4",
             "data.vote_candidates=1", "data.augment=false",
             f"data.compact_votes={'true' if compact else 'false'}"],
        )

    exp = get_dataset(cfg(False)).train_batch(np.random.default_rng(0), 1)
    cmp = get_dataset(cfg(True)).train_batch(np.random.default_rng(0), 1)
    dec = decode_compact_votes(
        {k: jnp.asarray(v) for k, v in cmp.items()}, vote_candidates=1
    )
    # the sampled points are a subset; recover per-point owner by nearest
    # full-roster center of the vote target (exact: targets aim at centers)
    tgt = exp["points"][0] + exp["vote_targets"][0]
    owner = np.argmin(
        np.linalg.norm(tgt[:, None] - bbox[None, :, :3], axis=-1), axis=1
    )
    in_roster = owner < 4
    voting = exp["vote_mask"][0]
    assert (voting & ~in_roster).any(), "fixture must sample truncated owners"
    # expanded: truncated-owner points STILL vote (at the off-roster center)
    assert voting[~in_roster].all()
    # compact: those same points drop supervision
    dm = np.asarray(dec["vote_mask"])[0]
    assert not dm[voting & ~in_roster].any()
    # in-roster points: bitwise-identical mask and targets
    np.testing.assert_array_equal(dm[in_roster], voting[in_roster])
    np.testing.assert_array_equal(
        np.asarray(dec["vote_targets"])[0][in_roster & voting],
        exp["vote_targets"][0][in_roster & voting],
    )


def test_decode_noop_on_expanded_batch(scannet_root):
    exp, _ = _batches(scannet_root)
    j = {k: jnp.asarray(v) for k, v in exp.items()}
    assert decode_compact_votes(j, 3) is j


def _write_oriented_scenes(root, overlap, split="train", scenes=3, n=800,
                           cols=6, nc=10):
    """Oriented-contract scenes. overlap=True exercises V>1 candidate
    slots (SUN RGB-D); overlap=False honors the KITTI non-overlap
    annotation convention (the kitti host path never expands candidates,
    so decode parity only holds for convention-respecting data)."""
    d = root / split
    d.mkdir(parents=True)
    rng = np.random.default_rng(3)
    first = [12.0, 0.0, 0.5, 8.0, 8.0, 3.0, 0.3, 1 % nc]
    second = (
        [14.0, 1.0, 0.5, 8.0, 8.0, 3.0, -0.5, 0]  # broad overlap with #0
        if overlap
        else [28.0, -2.0, 0.4, 2.5, 2.5, 1.2, -0.5, 0]
    )
    for i in range(scenes):
        pc = rng.uniform(-5, 5, (n, cols)).astype(np.float32)
        pc[:, 0] = np.abs(pc[:, 0]) * 5
        bbox = np.array(
            [first, second, [35.0, 2.0, 0.2, 2.0, 1.2, 0.8, 0.9, 2 % nc]],
            np.float32,
        )
        np.save(d / f"{i:06d}_pc.npy", pc)
        np.save(d / f"{i:06d}_bbox.npy", bbox)


@pytest.mark.parametrize("name,cols,overlap,extra", [
    ("sunrgbd", 6, True, ()),
    ("kitti", 4, False, ("data.num_points=512", "data.augment=false")),
])
def test_decode_matches_host_expansion_oriented(tmp_path, name, cols,
                                                overlap, extra):
    """The compact wire format on the oriented-box loaders (native vote
    targets + exact owner recovery) decodes bitwise to the expanded path."""
    _write_oriented_scenes(tmp_path, overlap, cols=cols)

    def cfg(compact):
        return apply_overrides(
            Config(),
            [f"data.name={name}", f"data.root={tmp_path}",
             "data.num_points=256", "data.max_boxes=8",
             "data.vote_candidates=3",
             f"data.compact_votes={'true' if compact else 'false'}", *extra],
        )

    exp = get_dataset(cfg(False)).train_batch(np.random.default_rng(0), 2)
    cmp = get_dataset(cfg(True)).train_batch(np.random.default_rng(0), 2)
    assert cmp["vote_owner"].dtype == np.int8
    dec = decode_compact_votes(
        {k: jnp.asarray(v) for k, v in cmp.items()}, vote_candidates=3
    )
    np.testing.assert_array_equal(
        np.asarray(dec["vote_mask"]), exp["vote_mask"]
    )
    np.testing.assert_array_equal(
        np.asarray(dec["vote_targets"]), exp["vote_targets"]
    )
    assert exp["vote_mask"].any()
    if overlap:  # the overlap fixture must actually exercise slot-1
        v = exp["vote_targets"]
        distinct = np.abs(v[..., 1, :] - v[..., 0, :]).max(-1) > 0
        assert distinct.sum() > 0, "no multi-candidate points generated"


def test_sunrgbd_verbatim_votes_reject_compact(tmp_path):
    from tests.e2e.test_datasets import _write_oriented

    _write_oriented(tmp_path)
    d = tmp_path / "train"
    pre = np.zeros((800, 4), np.float32)
    pre[:, 0] = 1.0
    for i in range(3):  # every scene, so any batch pick hits one
        np.save(d / f"{i:06d}_votes.npy", pre)
    cfg = apply_overrides(
        Config(),
        ["data.name=sunrgbd", f"data.root={tmp_path}", "data.num_points=256",
         "data.max_boxes=8", "data.compact_votes=true",
         "data.augment=false"],
    )
    ds = get_dataset(cfg)
    with pytest.raises(ValueError, match="verbatim"):
        ds.train_batch(np.random.default_rng(0), 2)


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
