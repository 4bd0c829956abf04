"""Augmentation consistency: boxes must transform with the cloud."""

import numpy as np

from tpu3dsad.data.augment import augment_scene
from tpu3dsad.data.sunrgbd import points_in_oriented_box


def test_membership_preserved_under_augment(rng):
    """Points inside a box before augmentation stay inside after."""
    n_in, n_out = 200, 300
    center = np.array([1.0, -0.5, 0.4], np.float32)
    size = np.array([1.2, 0.8, 0.8], np.float32)
    heading = 0.7

    # sample points strictly inside the box (local coords then rotate out)
    local = rng.uniform(-0.49, 0.49, (n_in, 3)).astype(np.float32) * size
    c, s = np.cos(heading), np.sin(heading)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    inside_pts = local @ rot.T + center
    outside_pts = rng.uniform(5, 8, (n_out, 3)).astype(np.float32)
    points = np.concatenate([inside_pts, outside_pts])

    for trial in range(10):
        trial_rng = np.random.default_rng(trial)
        p2, c2, h2, s2 = augment_scene(
            trial_rng, points.copy(), center[None].copy(),
            np.array([heading], np.float32), size[None].copy(),
        )
        member = points_in_oriented_box(p2[:, :3], c2[0], s2[0], h2[0])
        assert member[:n_in].all(), f"trial {trial}: inside points escaped"
        assert not member[n_in:].any(), f"trial {trial}: outside points entered"


def test_augment_preserves_shapes_and_wraps_heading(rng):
    points = rng.standard_normal((64, 5)).astype(np.float32)  # xyz + extras
    centers = rng.standard_normal((3, 3)).astype(np.float32)
    headings = np.array([3.0, -3.0, 0.1], np.float32)
    sizes = np.abs(rng.standard_normal((3, 3))).astype(np.float32)
    p, c, h, s = augment_scene(rng, points, centers, headings, sizes)
    assert p.shape == points.shape
    np.testing.assert_array_equal(p[:, 3:], points[:, 3:])  # extras untouched
    assert (np.abs(h) <= np.pi + 1e-6).all()


def test_aug_presets_resolve_lineage_recipes():
    """data.aug_preset='auto' applies the dataset's lineage recipe;
    'custom' honors the explicit fields (scale min==max==1 disables)."""
    import numpy as np

    from tpu3dsad.config import Config, apply_overrides
    from tpu3dsad.data.augment import AUG_PRESETS, resolve_aug

    cfg = Config()
    sc = resolve_aug(cfg.data, "scannet")
    assert sc == AUG_PRESETS["scannet"]
    assert sc["rot_range"] == np.pi / 36 and sc["scale_range"] is None
    su = resolve_aug(cfg.data, "sunrgbd")
    assert su["flip_y"] is False and su["rot_range"] == np.pi / 6
    assert su["scale_range"] == (0.85, 1.15)

    custom = apply_overrides(
        Config(),
        ["data.aug_preset=custom", "data.aug_flip_y=false",
         "data.aug_rot_range=0.5", "data.aug_scale_min=0.7",
         "data.aug_scale_max=1.3"],
    )
    got = resolve_aug(custom.data, "scannet")
    assert got == dict(flip_x=True, flip_y=False, rot_range=0.5,
                       scale_range=(0.7, 1.3))
    noscale = apply_overrides(Config(), ["data.aug_preset=custom"])
    assert resolve_aug(noscale.data, "kitti")["scale_range"] is None
