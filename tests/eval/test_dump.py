"""PLY/OBJ dump writers (lineage pc_util/dump_helper parity)."""

import numpy as np

from tpu3dsad.utils.dump import write_boxes_obj, write_ply


def test_write_ply_roundtrip(tmp_path, rng):
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    colors = rng.integers(0, 256, (10, 3)).astype(np.uint8)
    p = tmp_path / "cloud.ply"
    write_ply(str(p), pts, colors)
    lines = p.read_text().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex {len(pts)}" in lines
    body = lines[lines.index("end_header") + 1 :]
    assert len(body) == 10
    first = body[0].split()
    np.testing.assert_allclose([float(x) for x in first[:3]], pts[0], atol=1e-3)
    assert [int(x) for x in first[3:]] == list(colors[0])


def test_write_boxes_obj(tmp_path):
    corners = np.zeros((2, 8, 3), np.float32)
    corners[1] += 1.0
    p = tmp_path / "boxes.obj"
    write_boxes_obj(str(p), corners)
    lines = p.read_text().splitlines()
    verts = [l for l in lines if l.startswith("v ")]
    edges = [l for l in lines if l.startswith("l ")]
    assert len(verts) == 16
    assert len(edges) == 24  # 12 per box
    # edge indices 1-based within bounds
    for e in edges:
        a, b = map(int, e.split()[1:])
        assert 1 <= a <= 16 and 1 <= b <= 16
