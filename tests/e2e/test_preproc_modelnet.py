"""Raw ModelNet distributions → classification .npy contract
(data/preproc_modelnet.py): OFF parsing (incl. the malformed fused-header
files), area-weighted surface sampling, the resampled-txt layout, and the
output must feed the real modelnet loader."""

import os

import numpy as np
import pytest

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.preproc_modelnet import (
    export_all, read_off, sample_mesh,
)
from tpu3dsad.data.registry import get_dataset


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _write_off(path, verts, faces, fused_header=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        if fused_header:
            f.write(f"OFF{len(verts)} {len(faces)} 0\n")
        else:
            f.write(f"OFF\n{len(verts)} {len(faces)} 0\n")
        for v in verts:
            f.write(" ".join(f"{x:.6f}" for x in v) + "\n")
        for face in faces:
            f.write(f"{len(face)} " + " ".join(map(str, face)) + "\n")


UNIT_QUAD = (  # unit square in the z=0 plane, two triangles
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
    [[0, 1, 2], [0, 2, 3]],
)


def test_read_off_header_variants(tmp_path):
    verts, faces = UNIT_QUAD
    a, b = str(tmp_path / "a.off"), str(tmp_path / "b.off")
    _write_off(a, verts, faces, fused_header=False)
    _write_off(b, verts, faces, fused_header=True)
    va, fa = read_off(a)
    vb, fb = read_off(b)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(fa, fb)
    assert va.shape == (4, 3) and fa.shape == (2, 3)


def test_read_off_polygon_fanout(tmp_path):
    verts, _ = UNIT_QUAD
    p = str(tmp_path / "quad.off")
    _write_off(p, verts, [[0, 1, 2, 3]])  # one quad face
    _, faces = read_off(p)
    assert faces.shape == (2, 3)  # fanned into two triangles


def test_sample_mesh_on_surface_and_area_weighted(rng):
    # two triangles of very different area in the z=0 plane
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [10, 0, 0], [30, 0, 0], [10, 20, 0]], float)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    pts = sample_mesh(verts, faces, 4000, rng)
    assert pts.shape == (4000, 3)
    np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-6)  # on the plane
    # big triangle holds 200/200.5 of the area
    in_big = pts[:, 0] >= 9.0
    assert in_big.mean() > 0.95
    # points inside the big triangle: x in [10,30], y >= 0
    big = pts[in_big]
    assert (big[:, 0] <= 30 + 1e-4).all() and (big[:, 1] >= -1e-4).all()


def _write_off_tree(root):
    verts, faces = UNIT_QUAD
    for cls in ("airplane", "chair"):
        for split in ("train", "test"):
            for i in range(2):
                _write_off(
                    os.path.join(root, cls, split, f"{cls}_{i:04d}.off"),
                    verts, faces,
                )


def test_export_off_feeds_loader(tmp_path):
    raw, out = str(tmp_path / "raw"), str(tmp_path / "npy")
    _write_off_tree(raw)
    res = export_all(raw, out, num_points=64)
    assert res == {"layout": "off", "train": 4, "val": 4}
    # class ids follow sorted dir names
    assert open(os.path.join(out, "class_names.txt")).read().split() == [
        "airplane", "chair"]
    lab = np.load(os.path.join(out, "train", "chair_0000_label.npy"))
    assert int(lab) == 1
    pts = np.load(os.path.join(out, "train", "airplane_0000_pts.npy"))
    assert pts.shape == (64, 3) and pts.dtype == np.float32

    cfg = apply_overrides(Config(), [
        "model.name=classifier", "data.name=modelnet", f"data.root={out}",
        "data.num_points=32",
    ])
    ds = get_dataset(cfg)
    assert ds.num_classes == 2
    b = ds.train_batch(np.random.default_rng(0), 2)
    assert b["points"].shape == (2, 32, 3)
    assert set(np.asarray(b["labels"]).tolist()) <= {0, 1}


def test_export_off_deterministic(tmp_path):
    raw = str(tmp_path / "raw")
    _write_off_tree(raw)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    export_all(raw, out1, num_points=32)
    export_all(raw, out2, num_points=32)
    a = np.load(os.path.join(out1, "train", "chair_0001_pts.npy"))
    b = np.load(os.path.join(out2, "train", "chair_0001_pts.npy"))
    np.testing.assert_array_equal(a, b)


def _write_resampled_tree(root):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(1)
    names = ["airplane", "night_stand"]  # underscore class name on purpose
    items = {"train": [], "test": []}
    for cls in names:
        os.makedirs(os.path.join(root, cls), exist_ok=True)
        for split, count in (("train", 2), ("test", 1)):
            for i in range(count):
                name = f"{cls}_{i:04d}"
                pts = rng.standard_normal((50, 6)).astype(np.float32)
                np.savetxt(os.path.join(root, cls, name + ".txt"),
                           pts, delimiter=",", fmt="%.6f")
                items[split].append(name)
    with open(os.path.join(root, "modelnet40_shape_names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    for split in ("train", "test"):
        with open(os.path.join(root, f"modelnet40_{split}.txt"), "w") as f:
            f.write("\n".join(items[split]) + "\n")
    return names


def test_export_resampled_feeds_loader(tmp_path):
    raw, out = str(tmp_path / "raw"), str(tmp_path / "npy")
    names = _write_resampled_tree(raw)
    res = export_all(raw, out)
    assert res == {"layout": "resampled", "train": 4, "val": 2}
    # class ids follow the shape-names file order, not sorted dirs
    assert open(os.path.join(out, "class_names.txt")).read().split() == names
    # normals survive as extra columns
    pts = np.load(os.path.join(out, "train", "night_stand_0000_pts.npy"))
    assert pts.shape == (50, 6)
    lab = np.load(os.path.join(out, "val", "night_stand_0000_label.npy"))
    assert int(lab) == 1

    cfg = apply_overrides(Config(), [
        "model.name=classifier", "data.name=modelnet", f"data.root={out}",
        "data.num_points=16",
    ])
    ds = get_dataset(cfg)
    assert ds.num_classes == 2
    b = ds.train_batch(np.random.default_rng(0), 2)
    assert b["points"].shape == (2, 16, 3)


def test_export_off_rejects_garbage(tmp_path):
    raw = str(tmp_path / "raw")
    p = os.path.join(raw, "chair", "train", "bad.off")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    open(p, "w").write("PLY\n1 1 0\n")
    with pytest.raises(ValueError, match="not an OFF file"):
        export_all(raw, str(tmp_path / "npy"), num_points=8)
