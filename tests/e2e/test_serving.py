"""AOT serving export (tpu3dsad/serving.py): the serialized whole-scene
program must reproduce the live jitted pipeline bitwise, and the CLI must
round-trip export → run-scene."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad.config import parse_cli
from tpu3dsad.data.synthetic import class_mean_sizes
from tpu3dsad.serving import build_inference_fn, export_detector, load

_OVERRIDES = [
    "model.name=detector", "data.name=synthetic", "data.num_points=512",
    "data.max_boxes=8", "model.num_classes=4",
    "model.sa_npoints=(128,64,32,16)", "model.sa_nsamples=(8,8,4,4)",
    "model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
    "model.fp_channels=((32,32),(32,32))", "model.seed_feat_dim=32",
    "model.num_proposals=16", "model.cluster_nsample=4",
    "train.batch_size=2",
]


def _setup(rng):
    cfg = parse_cli(_OVERRIDES)
    ms = class_mean_sizes(cfg.model.num_classes)
    from tpu3dsad.models.detector import SizeAdaptiveDetector

    model = SizeAdaptiveDetector(cfg.model, mean_sizes=tuple(map(tuple, ms)))
    pts = jnp.asarray(rng.uniform(-3, 3, (2, 512, 3)).astype(np.float32))
    mask = jnp.ones((2, 512), bool)
    variables = model.init(jax.random.key(0), pts, mask=mask, train=False)
    return cfg, ms, variables, pts, mask


def test_export_reproduces_live_pipeline(tmp_path, rng):
    cfg, ms, variables, pts, mask = _setup(rng)
    live = build_inference_fn(cfg, variables, ms)(pts, mask)

    path = str(tmp_path / "model.bin")
    manifest = export_detector(cfg, variables, ms, 2, path)
    assert manifest["num_points"] == 512 and manifest["bytes"] > 0
    assert json.load(open(path + ".json")) == manifest

    exp = load(path)
    got = exp.call(pts, mask)
    assert set(got) == set(live)
    for k in live:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(live[k]), err_msg=k
        )


def test_serving_cli_roundtrip(tmp_path, rng, capsys):
    from tpu3dsad import train_lib
    from tpu3dsad.serving import main as serving_main

    # fabricate a checkpoint so the export CLI has something to load
    cfg, ms, variables, pts, mask = _setup(rng)
    from tpu3dsad.models.detector import SizeAdaptiveDetector

    model = SizeAdaptiveDetector(cfg.model, mean_sizes=tuple(map(tuple, ms)))
    tx = train_lib.make_optimizer(cfg.train, 10)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx,
    )
    ckpt = str(tmp_path / "ckpt")
    train_lib.save_checkpoint(ckpt, state, 5)

    out = str(tmp_path / "model.bin")
    serving_main([f"ckpt={ckpt}", f"out={out}", *_OVERRIDES,
                  f"train.ckpt_dir={ckpt}"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ckpt_step"] == 5

    scene = tmp_path / "scene.npy"
    np.save(scene, rng.uniform(-3, 3, (800, 3)).astype(np.float32))
    dst = tmp_path / "dets.json"
    serving_main([f"run={out}", f"scene={scene}", f"out={dst}"])
    dets = json.load(open(dst))["detections"]
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) == {"center", "size", "heading", "score", "class"}


def test_export_with_features_roundtrip(tmp_path, rng):
    """Checkpoints trained with colors export a (points, mask, features)
    calling convention; the artifact reproduces the live pipeline."""
    cfg = parse_cli(_OVERRIDES + ["data.use_color=true"])
    ms = class_mean_sizes(cfg.model.num_classes)
    from tpu3dsad.models.detector import SizeAdaptiveDetector

    model = SizeAdaptiveDetector(cfg.model, mean_sizes=tuple(map(tuple, ms)))
    pts = jnp.asarray(rng.uniform(-3, 3, (2, 512, 3)).astype(np.float32))
    feats = jnp.asarray(rng.random((2, 512, 3)).astype(np.float32))
    mask = jnp.ones((2, 512), bool)
    variables = model.init(jax.random.key(0), pts, feats, mask=mask,
                           train=False)

    from tpu3dsad.serving import build_inference_fn

    live = build_inference_fn(cfg, variables, ms, with_features=True)(
        pts, mask, feats
    )
    path = str(tmp_path / "model.bin")
    manifest = export_detector(cfg, variables, ms, 2, path,
                               with_features=True)
    assert manifest["with_features"] is True
    got = load(path).call(pts, mask, feats)
    for k in live:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(live[k]), err_msg=k
        )


def test_run_cli_normalizes_scannet_colors(tmp_path, rng, capsys):
    """run-mode must apply the training loader's feature normalization:
    scannet stores 0-255 rgb but trains on /256 (regression: raw colors
    were 256x out of distribution)."""
    from tpu3dsad.serving import main as serving_main

    cfg = parse_cli(_OVERRIDES + ["data.use_color=true"])
    ms = class_mean_sizes(cfg.model.num_classes)
    from tpu3dsad.models.detector import SizeAdaptiveDetector

    model = SizeAdaptiveDetector(cfg.model, mean_sizes=tuple(map(tuple, ms)))
    pts = jnp.zeros((1, 512, 3), jnp.float32)
    feats = jnp.zeros((1, 512, 3), jnp.float32)
    variables = model.init(jax.random.key(0), pts, feats, train=False)

    path = str(tmp_path / "model.bin")
    manifest = export_detector(cfg, variables, ms, 1, path,
                               with_features=True, source_dataset="scannet")
    assert manifest["source_dataset"] == "scannet"

    # scene with 0-255 colors; exact N points so sel is identity
    scene = tmp_path / "scene.npy"
    raw = np.concatenate(
        [rng.uniform(-3, 3, (512, 3)), rng.uniform(0, 255, (512, 3))], 1
    ).astype(np.float32)
    np.save(scene, raw)
    serving_main([f"run={path}", f"scene={scene}"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # ground truth: live pipeline on the /256-normalized colors. Compare
    # detection CONTENTS — the export is bitwise the live pipeline, so
    # scores/centers must match exactly; a count-only assertion is vacuous
    # (NMS keeps all proposals for the random-init model either way).
    live = build_inference_fn(cfg, variables, ms, with_features=True)(
        jnp.asarray(raw[None, :, :3]),
        jnp.ones((1, 512), bool),
        jnp.asarray(raw[None, :, 3:6] / 256.0),
    )
    keep = np.asarray(live["keep"])[0]
    kept = np.nonzero(keep)[0]
    assert len(out["detections"]) == len(kept) > 0
    for det, i in zip(out["detections"], kept):
        assert det["score"] == float(np.asarray(live["obj_prob"])[0, i])
        np.testing.assert_array_equal(
            np.asarray(det["center"], np.float32),
            np.asarray(live["center"])[0, i],
        )


def test_prepare_scene_batch_pads_short_clouds_masked(rng):
    """A scene with fewer than N points must be zero-padded with mask=False
    for the pad slots — NOT duplicate-sampled with an all-true mask (pads
    must never enter balls/FPS/pool statistics as real points)."""
    from tpu3dsad.serving import prepare_scene_batch

    raw = rng.uniform(-3, 3, (300, 3)).astype(np.float32)
    manifest = {"batch_size": 2, "num_points": 512}
    pts, mask = prepare_scene_batch(raw, manifest)
    pts, mask = np.asarray(pts), np.asarray(mask)
    assert pts.shape == (2, 512, 3) and mask.shape == (2, 512)
    np.testing.assert_array_equal(pts[0, :300], raw)
    np.testing.assert_array_equal(pts[0, 300:], 0.0)
    assert mask[0, :300].all() and not mask[0, 300:].any()
    assert not mask[1].any()

    # oversized: subsample without replacement, full-true row mask
    raw_big = rng.uniform(-3, 3, (700, 4)).astype(np.float32)
    pts, mask = prepare_scene_batch(raw_big, manifest)
    pts, mask = np.asarray(pts), np.asarray(mask)
    assert mask[0].all()
    flat = {tuple(p) for p in np.asarray(pts[0])}
    assert len(flat) == 512  # no duplicates from replacement
