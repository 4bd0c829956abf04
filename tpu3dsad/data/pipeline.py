"""Host-side input pipeline: padding, vote targets, prefetch batching.

The lineage's DataLoader worker processes (SURVEY.md §3.1) become a
numpy-producing thread with double-buffered prefetch; every batch is
fixed-shape (points padded to the config budget, GT boxes padded to
max_boxes) so one XLA program serves the whole epoch.
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Callable, Iterator

import numpy as np


def pad_points(points: np.ndarray, budget: int, rng=None):
    """Pad [N,C] to [budget,C] (repeating nothing — mask marks pads) or
    subsample to the budget if over.

    Returns (points, mask, sel) — sel is the index of each kept row into
    the input (callers subset per-point labels with it)."""
    n = points.shape[0]
    if n >= budget:
        if rng is None:
            sel = np.arange(budget)
        else:
            sel = rng.choice(n, budget, replace=False)
        return points[sel], np.ones(budget, bool), sel
    pad = np.zeros((budget - n, points.shape[1]), points.dtype)
    mask = np.concatenate([np.ones(n, bool), np.zeros(budget - n, bool)])
    return np.concatenate([points, pad]), mask, np.arange(n)


def pad_boxes(arr: np.ndarray, max_boxes: int):
    """Pad a per-box array [G, ...] to [max_boxes, ...]; returns (arr, mask)."""
    g = arr.shape[0]
    if g > max_boxes:
        arr, g = arr[:max_boxes], max_boxes
    out = np.zeros((max_boxes,) + arr.shape[1:], arr.dtype)
    out[:g] = arr
    mask = np.zeros(max_boxes, bool)
    mask[:g] = True
    return out, mask


def candidate_votes(points, votes, vmask, owner, centers, sizes, headings,
                    V: int):
    """Expand single-owner votes [N,3] to lineage GT_VOTE_FACTOR candidates
    [N,V,3] (loss takes the min — losses.py vote_loss).

    Slot 0 keeps the primary offset; slots 1..V-1 take OTHER boxes that
    contain the point under ORIENTED containment (same convention as
    sunrgbd.points_in_oriented_box), in box-index order; unused slots COPY
    the primary offset (never zeros — a zero slot would reward votes that
    stay at the seed). `owner` [N] is the primary box per point (-1 none).
    Fully vectorized — a per-point python loop stalls the 1-core host feed.
    """
    out = np.repeat(votes[:, None, :], V, axis=1)  # [N,V,3]
    if V <= 1 or not len(centers) or not vmask.any():
        return out
    vp = np.nonzero(vmask)[0]
    # separate [n,G] planes, no [n,G,3] stack: the stacked form cost
    # ~9ms/scene at 8k pts and host-bound the 18-class recipe at ~52
    # scenes/s (half the r2 feed rate); this form is ~3x cheaper
    p = points[vp]
    rx = p[:, 0:1] - centers[None, :, 0]  # [n,G]
    ry = p[:, 1:2] - centers[None, :, 1]
    rz = p[:, 2:3] - centers[None, :, 2]
    ch, sh = np.cos(headings)[None, :], np.sin(headings)[None, :]
    half = sizes / 2 + 1e-6
    inside = (
        (np.abs(ch * rx + sh * ry) <= half[None, :, 0])
        & (np.abs(-sh * rx + ch * ry) <= half[None, :, 1])
        & (np.abs(rz) <= half[None, :, 2])
    )  # [n,G]
    inside[np.arange(len(vp)), owner[vp]] = False  # never repeat the owner
    # slot work only for the (few) points actually inside ANOTHER box —
    # the argsort/fancy-index over all voting points was pure overhead
    rows = np.nonzero(inside.any(axis=1))[0]
    if not len(rows):
        return out
    ins = inside[rows]
    # first V-1 remaining containing boxes, box-index order (fewer boxes
    # than slots leaves the tail at the primary copy from np.repeat)
    order = np.argsort(~ins, axis=1, kind="stable")[:, : V - 1]
    kslots = order.shape[1]
    valid_c = np.take_along_axis(ins, order, axis=1)
    off = centers[order] - p[rows][:, None, :]  # [r,k,3]
    sel = vp[rows]
    out[sel, 1 : 1 + kslots] = np.where(
        valid_c[..., None], off, out[sel, :1]
    )
    return out


def recover_owner(points, votes, vmask, centers):
    """Primary owner per point from single-owner votes: the box whose
    center the vote points at (EXACT for votes our loaders/native code
    produce — they always aim at a center; approximate only for arbitrary
    file offsets, whose loaders must not use it). Returns [N] int64, -1
    for non-voting points."""
    owner = np.full(len(points), -1, np.int64)
    if vmask.any() and len(centers):
        tgt = points[vmask] + votes[vmask]
        owner[vmask] = np.argmin(
            np.sum((tgt[:, None, :] - centers[None]) ** 2, -1), axis=1
        )
    return owner


def compact_owner(owner, max_boxes: int) -> np.ndarray:
    """Validate + pack a primary-owner vector into the int8 compact-votes
    wire field (data.compact_votes; decoded on device by
    device_pipeline.decode_compact_votes)."""
    if max_boxes > 127:
        raise ValueError(
            "data.compact_votes packs owners as int8 — "
            f"data.max_boxes={max_boxes} exceeds 127"
        )
    # owners of boxes dropped by pad_boxes truncation can't be represented
    # (the expanded path keeps such votes aimed at the off-roster center);
    # mask those points out of vote supervision instead
    return np.where(owner >= max_boxes, -1, owner).astype(np.int8)


def scene_to_training_dict(points, spec, owner, max_boxes: int,
                           vote_candidates: int = 1):
    """Build the padded training example for one detection scene.

    Vote-target convention (lineage scannet_detection_dataset.__getitem__ /
    loss_helper — SURVEY.md §2.2): every point belonging to an object votes
    for that object's center; non-object points have vote_mask 0. With
    vote_candidates V>1 the targets are [N,V,3] (candidate_votes).
    """
    n = points.shape[0]
    votes = np.zeros((n, 3), np.float32)
    vote_mask = owner >= 0
    votes[vote_mask] = spec.centers[owner[vote_mask]] - points[vote_mask]
    if vote_candidates > 1:
        votes = candidate_votes(
            points, votes, vote_mask, owner,
            spec.centers, spec.sizes, spec.headings, vote_candidates,
        )

    centers, box_mask = pad_boxes(spec.centers, max_boxes)
    sizes, _ = pad_boxes(spec.sizes, max_boxes)
    headings, _ = pad_boxes(spec.headings, max_boxes)
    classes, _ = pad_boxes(spec.classes, max_boxes)

    return {
        "points": points.astype(np.float32),
        "point_mask": np.ones(n, bool),
        "vote_targets": votes,
        "vote_mask": vote_mask,
        "gt_centers": centers.astype(np.float32),
        "gt_sizes": sizes.astype(np.float32),
        "gt_headings": headings.astype(np.float32),
        "gt_classes": classes.astype(np.int32),
        "gt_mask": box_mask,
    }


def iter_val_batches(items, load_fn, batch_size: int):
    """Full-coverage val iteration over a scene list.

    Every item appears exactly once with scene_mask=True; the tail batch is
    padded by wrapping to the front of the list with scene_mask=False so
    batch shapes stay static. (The lineage DataLoader with drop_last simply
    discarded up to batch_size-1 tail scenes from every eval.)
    """
    n = len(items)
    if n == 0:
        return
    for i in range(0, n, batch_size):
        idx = list(range(i, min(i + batch_size, n)))
        mask = np.zeros(batch_size, bool)
        mask[: len(idx)] = True
        loaded = [load_fn(items[k]) for k in idx]
        # pad with a repeat of an already-loaded item: padded slots are
        # masked everywhere (AP filter + detection_loss scene gating), so
        # paying load_fn's full per-scene cost for them would be waste
        while len(loaded) < batch_size:
            loaded.append(loaded[0])
        batch = {k: np.stack([it[k] for it in loaded]) for k in loaded[0]}
        batch["scene_mask"] = mask
        yield batch


class Batcher:
    """Background-thread prefetching iterator over numpy batch dicts."""

    def __init__(
        self,
        make_batch: Callable[[np.random.Generator], dict],
        seed: int = 0,
        prefetch: int = 2,
        num_batches: int | None = None,
    ):
        self._make = make_batch
        self._rng = np.random.default_rng(seed)
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._num = num_batches
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        produced = 0
        while not self._stop.is_set():
            if self._num is not None and produced >= self._num:
                self._q.put(None)
                return
            try:
                batch = self._make(self._rng)
            except BaseException as e:  # surface loader failures, don't hang
                while not self._stop.is_set():
                    try:
                        self._q.put(e, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                return
            produced += 1
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[dict]:
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item  # loader exception, re-raised on the main thread
            yield item

    def close(self):
        self._stop.set()
