"""Synthetic-outdoor generator (config #4 convergence harness).

The generator must produce scenes the real KITTI pipeline (data/kitti.py
crop -> FPS -> vote targets) consumes end to end, with the outdoor
statistics the recipe work depends on: non-overlapping boxes, sparse
per-object point counts, 1/r density falloff.
"""

import numpy as np
import pytest

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.synthetic_outdoor import outdoor_scene, write_dataset


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    return outdoor_scene(rng, num_points=40000)


def test_scene_contract(scene):
    pc, boxes = scene
    assert pc.shape == (40000, 4) and pc.dtype == np.float32
    assert boxes.shape[1] == 8 and boxes.dtype == np.float32
    assert len(boxes) >= 3
    assert set(boxes[:, 7].astype(int)) <= {0, 1, 2}


def test_boxes_do_not_overlap(scene):
    # KITTI annotation convention: outdoor boxes never overlap (this is what
    # lets data/kitti.py copy the single owner into every candidate slot)
    _, boxes = scene
    c, s = boxes[:, :2], boxes[:, 3:5]
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            d = np.hypot(*(c[i] - c[j]))
            assert d > 0.5 * min(np.hypot(*s[i]), np.hypot(*s[j])), (i, j, d)


def test_objects_are_sparse_and_on_ground(scene):
    pc, boxes = scene
    for b in boxes:
        ch, sh = np.cos(b[6]), np.sin(b[6])
        rel = pc[:, :3] - b[:3]
        lx = ch * rel[:, 0] + sh * rel[:, 1]
        ly = -sh * rel[:, 0] + ch * rel[:, 1]
        inside = (
            (np.abs(lx) < b[3] / 2 + 0.1)
            & (np.abs(ly) < b[4] / 2 + 0.1)
            & (np.abs(rel[:, 2]) < b[5] / 2 + 0.1)
        )
        n = int(inside.sum())
        assert 20 <= n <= 3500, n  # sparse: tens-to-thousands, never dense
        # box bottom sits at the local ground height
        assert abs((b[2] - b[5] / 2) - (-1.73 + 0.002 * abs(b[1]))) < 0.05


def test_density_falls_off_with_range(scene):
    pc, _ = scene
    r = np.hypot(pc[:, 0], pc[:, 1])
    near = ((r > 5) & (r < 15)).sum()
    far = ((r > 45) & (r < 55)).sum()
    # ground rings fall off ~1/r; uniform-in-range clutter dilutes the
    # mixture to ~1.7-1.8x between these bins
    assert near > 1.4 * far, (near, far)


def test_kitti_pipeline_consumes_generated_scenes(tmp_path):
    from tpu3dsad.data import get_dataset

    write_dataset(str(tmp_path), scenes=2, val_scenes=1, num_points=20000,
                  seed=3)
    cfg = apply_overrides(
        Config(),
        ["data.name=kitti", f"data.root={tmp_path}", "data.num_points=4096",
         "data.max_boxes=16", "model.num_classes=3"],
    )
    ds = get_dataset(cfg)
    b = ds.train_batch(np.random.default_rng(0), 2)
    assert b["points"].shape == (2, 4096, 3)
    assert b["vote_targets"].shape[0:2] == (2, 4096)
    assert b["gt_mask"].any()
    # vote targets: voting point + offset lands at a GT center
    vt = b["vote_targets"]
    if vt.ndim == 4:  # [B,N,V,3] candidate form — outdoor slots all match
        assert np.allclose(vt[..., 0, :], vt[..., -1, :])
        vt = vt[..., 0, :]
    for bi in range(2):
        vm = b["vote_mask"][bi] & b["point_mask"][bi]
        if not vm.any():
            continue
        tgt = b["points"][bi][vm] + vt[bi][vm]
        gt = b["gt_centers"][bi][b["gt_mask"][bi]]
        d = np.min(np.linalg.norm(tgt[:, None] - gt[None], axis=-1), axis=-1)
        assert d.max() < 0.3, d.max()
