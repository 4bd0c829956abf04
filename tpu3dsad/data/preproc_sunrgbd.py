"""Raw SUN RGB-D data → the extracted .npy detection contract — without
MATLAB.

Lineage: sunrgbd/matlab/extract_rgbd_data_v2.m + sunrgbd_data.py
(SURVEY.md §2.2 SUN RGB-D row). The lineage pipeline needs MATLAB to read
`SUNRGBDMeta3DBB_v2.mat` and convert depth maps to upright point clouds;
this module replaces both stages with numpy + scipy.io + PIL:

  inputs:
    meta=SUNRGBDMeta3DBB_v2.mat    per-scene struct array: depthpath,
                                   rgbpath, Rtilt [3,3], K [3,3],
                                   groundtruth3DBB (basis [3,3] rows,
                                   coeffs half-extents, centroid,
                                   classname, …) — v1 or v2 file
    root=<dir containing SUNRGBD/>  image tree; the meta's absolute paths
                                   are re-rooted at the 'SUNRGBD/' segment

  outputs under out/{train,val} (what data/sunrgbd.py consumes):
    <idx>_pc.npy     float32 [N, 6]  upright-depth xyz (Z-up) + rgb(0-1)
    <idx>_bbox.npy   float32 [G, 8]  cx cy cz dx dy dz heading cls (0..9)
    <idx>_votes.npy  float32 [N, 10] lineage GT_VOTE_FACTOR=3 layout:
                                     mask + 3 candidate center offsets

Depth semantics pinned to the SUNRGBD toolbox (read3dPoints.m): raw uint16
pixels are bit-rotated (d>>3 | d<<13), scaled to meters (/1000), capped at
8 m; pixel (u, v) (1-based, MATLAB) back-projects through K to camera
coordinates, axes swapped to (x, depth, -y), then rotated by Rtilt into
the gravity-aligned "upright" frame. Zero-depth pixels are dropped.

Box semantics: the toolbox basis rows are the box axes in upright
coordinates with coeffs the half-extents along them; the exporter
normalizes row order so the most-vertical row is the z axis, takes
dx/dy/dz = 2·coeffs in (x, y, z) order and heading = atan2 of the x-row —
the angle that makes `points_in_oriented_box` (the loader's containment
test, world→box via rot_z) accept the box's own corners
(tests/e2e/test_preproc_sunrgbd.py pins this self-consistency). Classes
outside the 10-class benchmark are dropped.

CLI:
  python -m tpu3dsad.data.preproc_sunrgbd meta=SUNRGBDMeta3DBB_v2.mat \\
      root=/data root out=/data/sunrgbd [val_list=val_idxs.txt] \\
      [num_points=50000]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from tpu3dsad.data.sunrgbd import (
    SUNRGBD_CLASS_NAMES,
    points_in_oriented_box,
)

_CLS = {n: i for i, n in enumerate(SUNRGBD_CLASS_NAMES)}
GT_VOTE_FACTOR = 3  # lineage sunrgbd_data.py candidate count


def read_depth(path: str) -> np.ndarray:
    """SUNRGBD 16-bit depth png → meters [H, W] (toolbox bit-rotation,
    8 m cap)."""
    from PIL import Image

    raw = np.asarray(Image.open(path), np.uint16)
    meters = (
        np.bitwise_or(raw >> 3, raw << 13).astype(np.float32) / 1000.0
    )
    return np.minimum(meters, 8.0)


def depth_to_points(depth: np.ndarray, k: np.ndarray,
                    rtilt: np.ndarray, rgb=None) -> np.ndarray:
    """[H, W] meters → [N, 6] upright xyz + rgb(0-1); zero-depth dropped."""
    h, w = depth.shape
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    u, v = np.meshgrid(
        np.arange(1, w + 1, dtype=np.float32),
        np.arange(1, h + 1, dtype=np.float32),
    )
    x3 = (u - cx) * depth / fx
    y3 = (v - cy) * depth / fy
    cam = np.stack([x3, depth, -y3], -1).reshape(-1, 3)
    valid = depth.reshape(-1) > 0
    pts = cam[valid] @ np.asarray(rtilt, np.float32).T
    colors = (
        np.asarray(rgb, np.float32).reshape(-1, 3)[valid] / 255.0
        if rgb is not None
        else np.zeros_like(pts)
    )
    return np.concatenate([pts, colors], 1).astype(np.float32)


def convert_box(basis: np.ndarray, coeffs: np.ndarray,
                centroid: np.ndarray, classname: str):
    """Toolbox OBB → our [8] row, or None for a non-benchmark class."""
    cls = _CLS.get(str(classname))
    if cls is None:
        return None
    basis = np.asarray(basis, np.float64).reshape(3, 3)
    coeffs = np.abs(np.asarray(coeffs, np.float64).reshape(3))
    zi = int(np.argmax(np.abs(basis[:, 2])))
    order = [i for i in range(3) if i != zi] + [zi]
    basis, coeffs = basis[order], coeffs[order]
    heading = float(np.arctan2(basis[0, 1], basis[0, 0]))
    return np.array(
        [*np.asarray(centroid, np.float64).reshape(3),
         *(coeffs * 2), heading, cls],
        np.float32,
    )


def lineage_votes(points: np.ndarray, bbox: np.ndarray) -> np.ndarray:
    """[N, 10] mask + GT_VOTE_FACTOR candidate offsets: a point inside
    several boxes carries up to 3 distinct centers; unfilled candidate
    slots repeat the first (lineage sunrgbd_data.py semantics). The
    lineage clamps point_vote_idx at 2 (np.minimum(2, idx+1)), so a 4th+
    containing box OVERWRITES slot 3 (index 2) rather than being skipped —
    replicated here (ADVICE r3), pinned by
    test_preproc_sunrgbd.py::test_lineage_votes_fourth_box_overwrites_slot3."""
    n = len(points)
    votes = np.zeros((n, 10), np.float32)
    filled = np.zeros(n, np.int64)
    for row in bbox:
        inside = points_in_oriented_box(points, row[:3], row[3:6], row[6])
        if not inside.any():
            continue
        offset = row[:3] - points[inside]
        slot = np.minimum(filled[inside], GT_VOTE_FACTOR - 1)
        votes[inside, 0] = 1.0
        flat = np.nonzero(inside)[0]
        for s in range(GT_VOTE_FACTOR):
            at = slot == s
            votes[flat[at], 1 + 3 * s : 4 + 3 * s] = offset[at]
        filled[inside] = np.minimum(filled[inside] + 1, GT_VOTE_FACTOR)
    # repeat candidate 0 into empty slots (never all-zero candidates)
    one = filled == 1
    votes[one, 4:7] = votes[one, 7:10] = votes[one, 1:4]
    two = filled == 2
    votes[two, 7:10] = votes[two, 1:4]
    return votes


def _local_path(root: str, meta_path: str) -> str:
    """Re-root the meta's absolute path at its 'SUNRGBD/' segment."""
    parts = str(meta_path).replace("\\", "/").split("/")
    if "SUNRGBD" in parts:
        parts = parts[parts.index("SUNRGBD"):]
    return os.path.join(root, *parts)


def read_meta(mat_path: str):
    """SUNRGBDMeta3DBB_v2.mat → list of per-scene dicts."""
    from scipy.io import loadmat

    mat = loadmat(mat_path, squeeze_me=True, struct_as_record=False)
    key = next(k for k in mat if not k.startswith("__"))
    metas = np.atleast_1d(mat[key])
    scenes = []
    for m in metas:
        groups = getattr(m, "groundtruth3DBB", None)
        rows = []
        if groups is not None and np.size(groups):
            for g in np.atleast_1d(groups):
                row = convert_box(g.basis, g.coeffs, g.centroid, g.classname)
                if row is not None:
                    rows.append(row)
        scenes.append({
            "depthpath": str(m.depthpath),
            "rgbpath": str(getattr(m, "rgbpath", "")),
            "Rtilt": np.asarray(m.Rtilt, np.float64).reshape(3, 3),
            "K": np.asarray(m.K, np.float64).reshape(3, 3),
            "bbox": (
                np.stack(rows) if rows else np.zeros((0, 8), np.float32)
            ),
        })
    return scenes


def export_scene(scene: dict, root: str, num_points: int = 50000,
                 seed: int = 0) -> dict:
    depth = read_depth(_local_path(root, scene["depthpath"]))
    rgb = None
    rgb_path = _local_path(root, scene["rgbpath"]) if scene["rgbpath"] else ""
    if rgb_path and os.path.exists(rgb_path):
        from PIL import Image

        rgb = np.asarray(Image.open(rgb_path).convert("RGB"))
        if rgb.shape[:2] != depth.shape:
            raise ValueError(
                f"{rgb_path}: rgb {rgb.shape[:2]} does not register with "
                f"depth {depth.shape}"
            )
    pc = depth_to_points(depth, scene["K"], scene["Rtilt"], rgb)
    if len(pc) > num_points:
        sel = np.random.default_rng(seed).choice(
            len(pc), num_points, replace=False
        )
        pc = pc[sel]
    bbox = scene["bbox"]
    return {
        "pc": pc,
        "bbox": bbox,
        "votes": lineage_votes(pc[:, :3], bbox),
    }


def _read_list(path):
    if not path:
        return None
    with open(path) as f:
        return {line.strip() for line in f if line.strip()}


def export_all(meta: str, root: str, out: str, val_list=None,
               num_points: int = 50000) -> dict:
    scenes = read_meta(meta)
    val_set = _read_list(val_list) or set()
    counts = {"train": 0, "val": 0}
    for i, scene in enumerate(scenes):
        idx = f"{i + 1:06d}"  # lineage 1-based image ids
        split = "val" if idx in val_set else "train"
        arrays = export_scene(scene, root, num_points, seed=i)
        d = os.path.join(out, split)
        os.makedirs(d, exist_ok=True)
        for key, arr in arrays.items():
            np.save(os.path.join(d, f"{idx}_{key}.npy"), arr)
        counts[split] += 1
    return counts


def main(argv):
    kv = dict(a.split("=", 1) for a in argv)
    if not {"meta", "root", "out"} <= set(kv):
        print(__doc__)
        return 2
    try:
        counts = export_all(
            kv["meta"], kv["root"], kv["out"], kv.get("val_list"),
            int(kv.get("num_points", 50000)),
        )
    except (OSError, ValueError, KeyError) as e:
        print(f"preproc_sunrgbd: {e}", file=sys.stderr)
        return 1
    print(json.dumps({"written": counts, "out": kv["out"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
