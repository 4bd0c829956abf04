"""Raw KITTI files → outdoor .npy contract (data/preproc_kitti.py): the
camera-frame label inversion (R0_rect, Tr_velo_to_cam, bottom-center,
ry → velodyne yaw) is checked analytically and the output must feed the
real kitti loader."""

import os

import numpy as np
import pytest

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.preproc_kitti import export_all, export_scene, read_calib
from tpu3dsad.data.registry import get_dataset

# canonical KITTI extrinsics: cam x = -velo y, cam y = -velo z,
# cam z = velo x, plus the real sensor offset
TR = np.array(
    [[0.0, -1.0, 0.0, 0.00],
     [0.0, 0.0, -1.0, -0.08],
     [1.0, 0.0, 0.0, -0.27]]
)


def _rect_matrix(angle=0.0):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _write_scene(root, idx, pc, boxes_velo, r0_angle=0.0):
    """boxes_velo: [(center_xyz, (l, w, h), yaw, type)] in the velodyne
    frame; the fixture forward-transforms them into rectified-camera labels
    so the exporter must invert exactly."""
    split = os.path.join(root, "training")
    for d in ("velodyne", "label_2", "calib"):
        os.makedirs(os.path.join(split, d), exist_ok=True)
    pc.astype(np.float32).tofile(os.path.join(split, "velodyne", idx + ".bin"))
    r0 = _rect_matrix(r0_angle)
    with open(os.path.join(split, "calib", idx + ".txt"), "w") as f:
        f.write("P2: " + " ".join(["0"] * 12) + "\n")
        f.write("R0_rect: " + " ".join(f"{v:.9f}" for v in r0.reshape(-1)) + "\n")
        f.write(
            "Tr_velo_to_cam: "
            + " ".join(f"{v:.9f}" for v in TR.reshape(-1)) + "\n"
        )
    lines = []
    for center, (length, w, h), yaw, typ in boxes_velo:
        bottom = np.array(center, np.float64) - [0, 0, h / 2]
        rect = r0 @ (TR[:, :3] @ bottom + TR[:, 3])
        ry = -yaw - np.pi / 2
        lines.append(
            f"{typ} 0.0 0 0.0 0 0 50 50 {h:.4f} {w:.4f} {length:.4f} "
            f"{rect[0]:.6f} {rect[1]:.6f} {rect[2]:.6f} {ry:.6f}"
        )
    with open(os.path.join(split, "label_2", idx + ".txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.mark.parametrize("r0_angle", [0.0, 0.05])
def test_label_inversion(tmp_path, rng, r0_angle):
    root = str(tmp_path)
    pc = np.concatenate(
        [rng.random((500, 4)) * [60, 60, 3, 1] - [0, 30, 2, 0],
         [[10.0, 3.0, -0.5, 0.3]]]
    )
    boxes = [
        ((10.0, 3.0, -0.75), (3.9, 1.6, 1.5), 0.3, "Car"),
        ((20.0, -5.0, -0.9), (0.8, 0.6, 1.8), -1.2, "Pedestrian"),
        ((15.0, 0.0, -0.8), (1.8, 0.6, 1.7), 2.5, "Cyclist"),
        ((30.0, 8.0, -0.5), (5.5, 2.1, 2.3), 0.0, "Van"),  # dropped
        ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), 0.0, "DontCare"),  # dropped
    ]
    _write_scene(root, "000000", pc, boxes, r0_angle)
    out = export_scene(root, "training", "000000")
    np.testing.assert_array_equal(out["pc"], pc.astype(np.float32))
    bbox = out["bbox"]
    assert bbox.shape == (3, 8)
    for row, (center, dims, yaw, typ) in zip(bbox, boxes[:3]):
        np.testing.assert_allclose(row[:3], center, atol=1e-4)
        np.testing.assert_allclose(row[3:6], dims, atol=1e-5)
        np.testing.assert_allclose(row[6], -(-yaw - np.pi / 2) - np.pi / 2,
                                   atol=1e-6)  # = yaw by construction
        assert row[7] == {"Car": 0, "Pedestrian": 1, "Cyclist": 2}[typ]


def test_calib_matrices_are_homogeneous(tmp_path, rng):
    _write_scene(str(tmp_path), "000001", rng.random((8, 4)), [], 0.02)
    calib = read_calib(
        os.path.join(str(tmp_path), "training", "calib", "000001.txt")
    )
    assert calib["R0_rect"].shape == (4, 4)
    assert calib["Tr_velo_to_cam"][3].tolist() == [0, 0, 0, 1]


def test_export_all_feeds_the_loader(tmp_path, rng):
    root = str(tmp_path / "raw")
    car = ((12.0, 1.0, -0.7), (3.9, 1.6, 1.5), 0.4, "Car")
    for idx in ("000000", "000001", "000002"):
        # points clustered in the crop range so the loader keeps them
        pc = rng.random((600, 4)) * [50, 40, 3, 1] + [5, -20, -2.5, 0]
        _write_scene(root, idx, pc, [car])
    (tmp_path / "val.txt").write_text("000002\n")
    out = str(tmp_path / "npy")
    counts = export_all(root, out, val_list=str(tmp_path / "val.txt"))
    assert counts == {"train": 2, "val": 1}

    cfg = apply_overrides(
        Config(),
        ["data.name=kitti", f"data.root={out}", "data.num_points=256",
         "data.max_boxes=8", "data.augment=false"],
    )
    ds = get_dataset(cfg)
    batch = ds.train_batch(rng, 2)
    assert batch["points"].shape == (2, 256, 3)
    gt = batch["gt_mask"]
    assert gt.sum() == 2  # one car per scene
    np.testing.assert_allclose(
        batch["gt_centers"][gt], np.tile(car[0], (2, 1)), atol=1e-4
    )
    np.testing.assert_allclose(batch["gt_headings"][gt], 0.4, atol=1e-5)


def test_export_output_passes_validate(tmp_path, rng):
    from tpu3dsad.data.validate import validate_root

    root = str(tmp_path / "raw")
    pc = rng.random((300, 4)) * [50, 40, 3, 1] + [5, -20, -2.5, 0]
    _write_scene(root, "000000", pc,
                 [((12.0, 1.0, -0.7), (3.9, 1.6, 1.5), 0.4, "Car")])
    out = str(tmp_path / "npy")
    export_all(root, out)
    rep = validate_root("kitti", out)
    assert rep.errors == []
