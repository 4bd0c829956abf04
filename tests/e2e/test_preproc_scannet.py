"""Raw ScanNet scans → .npy contract (data/preproc_scannet.py): a synthetic
raw scene (binary PLY + aggregation/segs json + axis-align meta + label TSV)
is exported and must land, byte-semantics intact, in the real scannet
loader — the missing preprocessing half of the real-data switchover path
(lineage load_scannet_data.py / batch_load_scannet_data.py)."""

import json
import os
import struct

import numpy as np
import pytest

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.preproc_scannet import (
    export_all,
    export_scene,
    read_label_mapping,
    read_ply_vertices,
)
from tpu3dsad.data.registry import get_dataset

# 90° about +Z plus a translation — distinguishes x/y and catches a
# transposed matrix or boxes computed before alignment.
ALIGN = np.array(
    [[0.0, -1.0, 0.0, 0.5],
     [1.0, 0.0, 0.0, -0.25],
     [0.0, 0.0, 1.0, 1.0],
     [0.0, 0.0, 0.0, 1.0]]
)


def _cluster(rng, center, size, n):
    return center + (rng.random((n, 3)) - 0.5) * size


def _write_ply(path, xyz, rgb, fmt="binary_little_endian", alpha=True):
    props = ["x", "y", "z", "red", "green", "blue"] + (["alpha"] if alpha else [])
    header = ["ply", f"format {fmt} 1.0", f"element vertex {len(xyz)}"]
    header += [
        f"property {'float' if p in 'xyz' else 'uchar'} {p}" for p in props
    ]
    # a face element after the vertices: the reader must not choke on it
    header += ["element face 1", "property list uchar int vertex_indices",
               "end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        for p, c in zip(xyz, rgb):
            if fmt == "ascii":
                row = [f"{v:.6f}" for v in p] + [str(int(v)) for v in c]
                f.write((" ".join(row + (["255"] if alpha else [])) + "\n").encode())
            else:
                f.write(struct.pack("<fff", *p))
                f.write(struct.pack("<BBB", *(int(v) for v in c)))
                if alpha:
                    f.write(struct.pack("<B", 255))
        f.write(b"\x03\x00\x00\x00\x00\x01\x00\x00\x00\x02\x00\x00\x00")


def _write_raw_scene(scan_root, scene, rng, n_floor=120):
    """Two benchmark objects (chair nyu40=5, table nyu40=7), one annotated
    non-benchmark instance (wall nyu40=1), unannotated floor. Returns the
    raw (pre-alignment) xyz and the per-vertex segment ids."""
    chair = _cluster(rng, [1.0, 2.0, 0.4], [0.5, 0.5, 0.8], 80)
    table = _cluster(rng, [-1.0, 0.5, 0.35], [1.2, 0.9, 0.7], 100)
    wall = _cluster(rng, [0.0, -2.0, 1.2], [4.0, 0.1, 2.4], 60)
    floor = _cluster(rng, [0.0, 0.0, 0.0], [6.0, 6.0, 0.02], n_floor)
    xyz = np.concatenate([chair, table, wall, floor]).astype(np.float32)
    rgb = np.concatenate(
        [np.tile(c, (len(p), 1)) for c, p in
         [((200, 30, 30), chair), ((30, 200, 30), table),
          ((30, 30, 200), wall), ((120, 120, 120), floor)]]
    )
    # over-segmentation: chair = segs {11, 12}, table = {20}, wall = {31},
    # floor = {40} (unaggregated)
    segs = np.concatenate(
        [np.where(np.arange(80) < 40, 11, 12),
         np.full(100, 20), np.full(60, 31), np.full(n_floor, 40)]
    )
    d = os.path.join(scan_root, scene)
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, scene)
    _write_ply(p + "_vh_clean_2.ply", xyz, rgb)
    with open(p + ".aggregation.json", "w") as f:
        json.dump({"segGroups": [
            {"id": 0, "objectId": 0, "label": "chair", "segments": [11, 12]},
            {"id": 1, "objectId": 1, "label": "dining table", "segments": [20]},
            {"id": 2, "objectId": 2, "label": "wall", "segments": [31]},
        ]}, f)
    with open(p + "_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": segs.tolist()}, f)
    with open(p + ".txt", "w") as f:
        f.write("numVertices = %d\n" % len(xyz))
        f.write("axisAlignment = " + " ".join(
            f"{v:.6f}" for v in ALIGN.reshape(-1)) + "\n")
    return xyz, rgb, segs


@pytest.fixture
def labels_tsv(tmp_path):
    path = tmp_path / "scannetv2-labels.combined.tsv"
    rows = [
        "id\traw_category\tcategory\tnyu40id\tnyu40class",
        "2\tchair\tchair\t5\tchair",
        "7\tdining table\ttable\t7\ttable",
        "1\twall\twall\t1\twall",
        "9\tunmapped thing\tmisc\t\t",  # blank nyu40id must be skipped
    ]
    path.write_text("\n".join(rows) + "\n")
    return str(path)


def test_ply_reader_binary_matches_ascii(tmp_path, rng):
    xyz = rng.standard_normal((17, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (17, 3))
    _write_ply(tmp_path / "b.ply", xyz, rgb)
    _write_ply(tmp_path / "a.ply", xyz, rgb, fmt="ascii", alpha=False)
    vb = read_ply_vertices(str(tmp_path / "b.ply"))
    va = read_ply_vertices(str(tmp_path / "a.ply"))
    np.testing.assert_array_equal(vb[:, :3], xyz)
    np.testing.assert_array_equal(vb[:, 3:], rgb.astype(np.float32))
    np.testing.assert_allclose(va, vb, atol=1e-5)


def test_export_scene_semantics(tmp_path, rng, labels_tsv):
    scene = "scene0000_00"
    xyz, rgb, _ = _write_raw_scene(str(tmp_path / "scans"), scene, rng)
    label_map = read_label_mapping(labels_tsv)
    assert "unmapped thing" not in label_map
    out = export_scene(
        str(tmp_path / "scans" / scene), scene, label_map, max_points=10_000
    )
    n = len(xyz)
    aligned = xyz @ ALIGN[:3, :3].T + ALIGN[:3, 3]
    np.testing.assert_allclose(out["vert"][:, :3], aligned, atol=1e-5)
    np.testing.assert_array_equal(out["vert"][:, 3:], rgb)

    ins, sem = out["ins_label"], out["sem_label"]
    np.testing.assert_array_equal(ins[:80], 1)  # objectId 0 → instance 1
    np.testing.assert_array_equal(ins[80:180], 2)
    np.testing.assert_array_equal(ins[180:240], 3)
    np.testing.assert_array_equal(ins[240:], 0)  # floor unannotated
    np.testing.assert_array_equal(sem[:80], 5)
    np.testing.assert_array_equal(sem[80:180], 7)
    np.testing.assert_array_equal(sem[180:240], 1)
    np.testing.assert_array_equal(sem[240:], 0)

    # wall (nyu40=1) is not a benchmark class: 2 boxes, from ALIGNED points
    bbox = out["bbox"]
    assert bbox.shape == (2, 7)
    assert bbox[:, 6].tolist() == [5.0, 7.0]
    for row, sl in zip(bbox, (slice(0, 80), slice(80, 180))):
        pts = aligned[sl]
        np.testing.assert_allclose(
            row[:3], (pts.min(0) + pts.max(0)) / 2, atol=1e-5
        )
        np.testing.assert_allclose(row[3:6], pts.max(0) - pts.min(0), atol=1e-5)


def test_export_scene_subsamples_consistently(tmp_path, rng, labels_tsv):
    scene = "scene0001_00"
    _write_raw_scene(str(tmp_path / "scans"), scene, rng)
    out = export_scene(
        str(tmp_path / "scans" / scene), scene,
        read_label_mapping(labels_tsv), max_points=100,
    )
    assert len(out["vert"]) == len(out["ins_label"]) == 100
    # the subsample keeps vert/ins/sem row-aligned: every surviving chair
    # point (red) still carries instance 1 / nyu40 5
    red = out["vert"][:, 3] == 200
    assert red.any()
    np.testing.assert_array_equal(out["ins_label"][red], 1)
    np.testing.assert_array_equal(out["sem_label"][red], 5)
    assert out["bbox"].shape == (2, 7)  # boxes from the FULL point set


def test_export_all_feeds_the_loader(tmp_path, rng, labels_tsv):
    scans = str(tmp_path / "scans")
    for s in ("scene0000_00", "scene0001_00", "scene0002_00"):
        _write_raw_scene(scans, s, rng)
    (tmp_path / "val.txt").write_text("scene0002_00\n")
    out = str(tmp_path / "npy")
    counts = export_all(
        scans, out, labels_tsv, val_list=str(tmp_path / "val.txt")
    )
    assert counts == {"train": 2, "val": 1}

    cfg = apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={out}", "data.num_points=512",
         "data.max_boxes=16", "data.augment=false", "data.use_color=true"],
    )
    ds = get_dataset(cfg)
    assert len(ds.train_scans) == 2 and len(ds.val_scans) == 1
    batch = ds.train_batch(rng, 2)
    assert batch["points"].shape == (2, 512, 3)
    assert batch["point_features"].shape == (2, 512, 3)
    # chair(cls 2) + table(cls 4) in every scene; wall filtered upstream
    got = set(batch["gt_classes"][batch["gt_mask"]].tolist())
    assert got == {2, 4}
    assert batch["gt_mask"].sum() == 4
    assert batch["vote_mask"].any()


def test_export_output_passes_validate(tmp_path, rng, labels_tsv):
    from tpu3dsad.data.validate import validate_root

    scans = str(tmp_path / "scans")
    _write_raw_scene(scans, "scene0000_00", rng)
    out = str(tmp_path / "npy")
    export_all(scans, out, labels_tsv)
    rep = validate_root("scannet", out)
    assert rep.errors == []
