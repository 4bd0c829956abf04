"""Numpy oracles for the point-op semantics of the reference's CUDA kernels.

These are slow, loopy, unambiguous re-implementations of the lineage CUDA
semantics (SURVEY.md §2.1 — pointnet2/_ext_src/src/{sampling,ball_query,
group_points,interpolate}_gpu.cu in the VoteNet/PointNet++ family). They are
the ground truth that both the XLA and the Pallas implementations are tested
against, including the quirky details that matter for box-level parity:

  * FPS starts at index 0 and, on ties in the running min-distance, picks the
    lowest index (CUDA block-reduction picks the first maximum).
  * ball_query scans points in index order 0..N-1; the FIRST in-ball hit
    fills ALL K slots, subsequent hits overwrite slots 1..K-1 in order
    ("pad with first hit"). An empty ball yields all-zero indices.
  * three_nn breaks distance ties toward the lower index.

All oracles take channels-last [N, C] / [B, N, C] numpy arrays.
"""

from __future__ import annotations

import numpy as np


def fps_oracle(xyz: np.ndarray, npoint: int, mask: np.ndarray | None = None) -> np.ndarray:
    """Furthest point sampling, single cloud. xyz [N,3] -> idx [npoint]."""
    n = xyz.shape[0]
    valid = np.ones(n, bool) if mask is None else mask.astype(bool)
    idx = np.zeros(npoint, np.int64)
    dist = np.full(n, np.inf)
    dist[~valid] = -np.inf  # padded points can never win the argmax
    last = 0
    idx[0] = 0
    for i in range(1, npoint):
        d2 = np.sum((xyz - xyz[last]) ** 2, axis=-1)
        np.minimum(dist, np.where(valid, d2, -np.inf), out=dist)
        last = int(np.argmax(dist))  # ties -> lowest index, like the CUDA reduce
        idx[i] = last
    return idx


def ball_query_oracle(
    xyz: np.ndarray,
    centers: np.ndarray,
    radius: float,
    nsample: int,
    mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Ball query, single cloud. xyz [N,3], centers [M,3] -> (idx [M,K], cnt [M])."""
    n = xyz.shape[0]
    m = centers.shape[0]
    valid = np.ones(n, bool) if mask is None else mask.astype(bool)
    r2 = radius * radius
    idx = np.zeros((m, nsample), np.int64)
    cnt = np.zeros(m, np.int64)
    for j in range(m):
        c = 0
        for k in range(n):
            if not valid[k]:
                continue
            d2 = float(np.sum((xyz[k] - centers[j]) ** 2))
            if d2 < r2:
                if c == 0:
                    idx[j, :] = k  # first hit pads every slot
                idx[j, c] = k
                c += 1
                if c == nsample:
                    break
        cnt[j] = c
    return idx, cnt


def knn_oracle(
    query: np.ndarray, support: np.ndarray, k: int, support_mask: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """k nearest neighbors. query [M,3], support [N,3] -> (d2 [M,k], idx [M,k]).

    Distance ties break toward the lower support index (stable sort),
    matching three_nn_kernel's strict `<` insertion scan.
    """
    d2 = np.sum((query[:, None, :] - support[None, :, :]) ** 2, axis=-1)
    if support_mask is not None:
        d2 = np.where(support_mask.astype(bool)[None, :], d2, np.inf)
    order = np.argsort(d2, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(d2, order, axis=-1), order


def gather_oracle(points: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """points [N,C], idx [...]-> [..., C]."""
    return points[idx]


def three_interpolate_oracle(
    feats: np.ndarray, idx: np.ndarray, weight: np.ndarray
) -> np.ndarray:
    """feats [N,C], idx [M,3], weight [M,3] -> [M,C]."""
    return np.einsum("mkc,mk->mc", feats[idx], weight)


def interp_weights_oracle(d2: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Inverse-distance weights from squared 3-NN distances [M,3] -> [M,3]."""
    recip = 1.0 / (d2 + eps)
    return recip / np.sum(recip, axis=-1, keepdims=True)
