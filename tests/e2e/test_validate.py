"""Dataset-contract pre-flight (python -m tpu3dsad.data.validate): clean
fixture dirs pass, corrupted files fail with messages naming the offending
file and field (VERDICT r2 next #8 — real-data switchover must not be
spent debugging contracts)."""

import json

import numpy as np
import pytest

from tests.e2e.test_datasets import _write_oriented, _write_scannet
from tpu3dsad.data.validate import main as validate_main, validate_root


def _run(capsys, *args):
    code = validate_main(list(args))
    out = capsys.readouterr().out.strip().splitlines()
    return code, json.loads(out[-1]), out[:-1]


def test_scannet_clean_passes(tmp_path, capsys):
    _write_scannet(tmp_path, split="train", scans=3)
    _write_scannet(tmp_path, split="val", scans=2)
    code, rep, lines = _run(
        capsys, "data.name=scannet", f"root={tmp_path}"
    )
    assert code == 0 and rep["ok"] and rep["scenes_checked"] == 5


def test_scannet_corruptions_name_file_and_field(tmp_path, capsys):
    _write_scannet(tmp_path, split="train", scans=3)
    d = tmp_path / "train"
    # wrong label length
    np.save(d / "scene0000_ins_label.npy", np.zeros(7, np.int64))
    # NaN vertex
    v = np.load(d / "scene0001_vert.npy")
    v[0, 0] = np.nan
    np.save(d / "scene0001_vert.npy", v)
    # bad bbox width: 5 columns instead of 7
    np.save(d / "scene0002_bbox.npy", np.zeros((2, 5), np.float32))
    code, rep, lines = _run(
        capsys, "data.name=scannet", f"root={tmp_path}"
    )
    assert code == 1 and rep["errors"] >= 3
    text = "\n".join(lines)
    assert "scene0000_ins_label.npy" in text and "[N]" in text
    assert "scene0001_vert.npy" in text and "NaN" in text
    assert "scene0002_bbox.npy" in text and "[G,7]" in text


def test_scannet_unknown_nyu40_warns_not_errors(tmp_path, capsys):
    _write_scannet(tmp_path, split="train", scans=1)
    d = tmp_path / "train"
    bb = np.load(d / "scene0000_bbox.npy")
    bb[0, 6] = 40  # not one of the 18 benchmark nyu40 ids
    np.save(d / "scene0000_bbox.npy", bb)
    code, rep, lines = _run(
        capsys, "data.name=scannet", f"root={tmp_path}"
    )
    assert code == 0 and rep["warnings"] >= 1
    assert any("DROPPED" in line for line in lines)


def test_sunrgbd_votes_contract(tmp_path, capsys):
    _write_oriented(tmp_path, split="train", scenes=2, cols=6)
    d = tmp_path / "train"
    # scene 0: valid votes; scene 1: mask column with an out-of-set value
    n = np.load(d / "000000_pc.npy").shape[0]
    good = np.zeros((n, 4), np.float32)
    good[:5, 0] = 1.0
    np.save(d / "000000_votes.npy", good)
    bad = np.zeros((n, 4), np.float32)
    bad[0, 0] = 0.5
    np.save(d / "000001_votes.npy", bad)
    code, rep, lines = _run(
        capsys, "data.name=sunrgbd", f"root={tmp_path}"
    )
    assert code == 1
    text = "\n".join(lines)
    assert "000001_votes.npy" in text and "mask col 0" in text
    assert "000000_votes.npy" not in "\n".join(
        line for line in lines if line.startswith("ERROR")
    )


def test_kitti_wrong_frame_detected(tmp_path, capsys):
    _write_oriented(tmp_path, split="train", scenes=1, cols=4, nc=3)
    d = tmp_path / "train"
    pc = np.load(d / "000000_pc.npy")
    pc[:, 0] = -np.abs(pc[:, 0]) - 1.0  # everything behind the sensor
    np.save(d / "000000_pc.npy", pc)
    code, rep, lines = _run(capsys, "data.name=kitti", f"root={tmp_path}")
    assert code == 1
    assert any("range crop" in line and "000000_pc.npy" in line
               for line in lines)


def test_missing_train_split_is_error(tmp_path):
    rep = validate_root("scannet", str(tmp_path))
    assert any("train" in e and "split" in e for e in rep.errors)


def test_max_scenes_limits_walk(tmp_path, capsys):
    _write_scannet(tmp_path, split="train", scans=5)
    code, rep, _ = _run(
        capsys, "data.name=scannet", f"root={tmp_path}", "max_scenes=2"
    )
    assert rep["scenes_checked"] == 2


def test_unknown_family_exits(tmp_path):
    with pytest.raises(SystemExit, match="contract"):
        validate_main(["data.name=synthetic", f"root={tmp_path}"])


def test_modelnet_family_and_test_split_fallback(tmp_path):
    """modelnet npy contract validates; a test/ dir stands in for val/
    (the loaders treat them as synonyms)."""
    d = tmp_path / "train"
    d.mkdir()
    np.save(d / "chair_0000_pts.npy",
            np.random.default_rng(0).standard_normal((40, 3)).astype(np.float32))
    np.save(d / "chair_0000_label.npy", np.int32(1))
    t = tmp_path / "test"
    t.mkdir()
    np.save(t / "chair_0001_pts.npy",
            np.random.default_rng(1).standard_normal((40, 6)).astype(np.float32))
    np.save(t / "chair_0001_label.npy", np.int32(1))
    rep = validate_root("modelnet", str(tmp_path))
    assert not rep.errors, rep.errors
    assert rep.scenes == 2  # the test/ split was walked as val

    # corruption: float label must be named
    np.save(t / "chair_0001_label.npy", np.float32(1.0))
    rep = validate_root("modelnet", str(tmp_path))
    assert any("chair_0001_label" in e and "dtype" in e for e in rep.errors)
