"""On-device input pipeline: augmentation and synthetic-scene generation as
jitted TPU programs.

VERDICT r1 #3: the host has ONE core and the host↔device link is the
bottleneck at training scale (config #3 ran 40 scenes/s host-bound vs 78
scenes/s device capacity). Multiprocess loaders can't help a 1-core host —
the TPU-native fix is to move the per-step work OFF the host:

* `augment_batch` — flip/rotate/scale a canonical padded batch on device,
  inside the train step. Vote targets and GT boxes are offsets/poses that
  transform LINEARLY, so augmenting them directly is exactly equivalent to
  the lineage's recompute-votes-after-augment (ownership is invariant under
  a rigid transform + uniform scale). The host then only loads canonical
  scenes (IO-bound, cacheable), and each scene crosses the link once per
  epoch shape, not once per augmented variant.
* `synthetic_detection_batch` — the full procedural scene generator as one
  XLA program (floor + box-surface "furniture" + analytic vote targets),
  device-resident end to end: zero host work, zero link bytes per step.

Semantics mirror data/augment.py::augment_scene and
data/synthetic.py::detection_scene (same distributions, same target
conventions); they are not bit-identical samplers (threefry vs PCG).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _rot_z(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero = jnp.zeros_like(angle)
    one = jnp.ones_like(angle)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )  # [..., 3, 3]


def augment_batch(
    batch: dict,
    key,
    flip_x: bool = True,
    flip_y: bool = True,
    rot_range: float = np.pi / 36,
    scale_range: tuple[float, float] | None = None,
) -> dict:
    """Per-scene flip/rot/scale of a padded detection batch, on device.

    Transforms points, vote_targets ([B,N,3] or [B,N,V,3]), gt_centers,
    gt_headings, gt_sizes consistently; other keys pass through. Feature
    channels (point_features) are pose-invariant and untouched.
    """
    B = batch["points"].shape[0]
    kfx, kfy, kr, ks = jax.random.split(key, 4)

    points = batch["points"]
    votes = batch["vote_targets"]
    vshape = votes.shape
    if votes.ndim == 3:
        votes = votes[:, :, None, :]
    centers = batch["gt_centers"]
    headings = batch["gt_headings"]
    sizes = batch["gt_sizes"]

    def flip_axis(ax, do):
        """Negate coordinate `ax` per scene where `do` [B] is set."""
        nonlocal points, votes, centers, headings
        sgn = jnp.where(do, -1.0, 1.0)[:, None]  # [B,1]
        points = points.at[..., ax].multiply(sgn)
        votes = votes.at[..., ax].multiply(sgn[:, :, None])
        centers = centers.at[..., ax].multiply(sgn)
        # x-flip: h → π−h ; y-flip: h → −h (augment_scene convention)
        headings = jnp.where(
            do[:, None], (np.pi - headings) if ax == 0 else -headings,
            headings,
        )

    if flip_x:
        flip_axis(0, jax.random.bernoulli(kfx, 0.5, (B,)))
    if flip_y:
        flip_axis(1, jax.random.bernoulli(kfy, 0.5, (B,)))

    angle = jax.random.uniform(
        kr, (B,), minval=-rot_range, maxval=rot_range
    )
    r = _rot_z(angle)  # [B,3,3]
    points = jnp.einsum("bnc,bdc->bnd", points, r)
    votes = jnp.einsum("bnvc,bdc->bnvd", votes, r)
    centers = jnp.einsum("bgc,bdc->bgd", centers, r)
    headings = headings + angle[:, None]

    if scale_range is not None:
        s = jax.random.uniform(
            ks, (B, 1, 1), minval=scale_range[0], maxval=scale_range[1]
        )
        points = points * s
        votes = votes * s[..., None]
        centers = centers * s
        sizes = sizes * s

    headings = jnp.mod(headings + np.pi, 2 * np.pi) - np.pi
    out = dict(batch)
    out["points"] = points
    out["vote_targets"] = votes.reshape(vshape)
    out["gt_centers"] = centers
    out["gt_headings"] = headings
    out["gt_sizes"] = sizes
    return out


def expand_votes(points, owner, gt_centers, gt_sizes, gt_headings,
                 gt_valid, vote_candidates: int):
    """Vote targets from per-point primary owners, on device.

    points [B,N,3]; owner [B,N] int (index into the padded GT arrays, <0
    for non-voting points); gt_* [B,G,...]; gt_valid [B,G] bool. Returns
    (vote_targets [B,N,3] or [B,N,V,3] when vote_candidates>1, vote_mask
    [B,N]). Semantics == the host path (scannet.py vote construction +
    pipeline.candidate_votes): slot 0 is the primary owner's center
    offset; slots 1..V-1 take OTHER valid boxes containing the point
    under oriented containment, box-index order, unused slots copying the
    primary. This is the compact-votes wire format's decoder
    (data.compact_votes) and the device_synth target builder.

    Selection is a cumsum rank + one-hot einsum — NOT argsort/gather: a
    [B,N,G] stable sort plus a [B,N,G,3] take_along_axis cost ~0.7s/step
    at config-3 scale (10.7 scenes/s vs 114 — measured,
    bench_train_throughput.py); the fused elementwise chain +
    [B,N,G]x[B,G,3] einsums are ~free.
    """
    owner = owner.astype(jnp.int32)
    centers, sizes, headings = gt_centers, gt_sizes, gt_headings
    G = centers.shape[1]
    vote_mask = owner >= 0
    own = jnp.maximum(owner, 0)
    votes = jnp.where(
        vote_mask[..., None],
        jnp.take_along_axis(centers, own[..., None], axis=1) - points,
        0.0,
    )
    if vote_candidates > 1:
        V = vote_candidates
        ch = jnp.cos(headings)[:, None, :]  # [B,1,G]
        sh = jnp.sin(headings)[:, None, :]
        rx = points[..., 0:1] - centers[..., 0][:, None, :]  # [B,N,G]
        ry = points[..., 1:2] - centers[..., 1][:, None, :]
        lz = points[..., 2:3] - centers[..., 2][:, None, :]
        lx = ch * rx + sh * ry
        ly = -sh * rx + ch * ry
        half = sizes[:, None, :, :] / 2 + 1e-6  # [B,1,G,3]
        inside = (
            (jnp.abs(lx) <= half[..., 0])
            & (jnp.abs(ly) <= half[..., 1])
            & (jnp.abs(lz) <= half[..., 2])
        )  # [B,N,G]
        inside = inside & gt_valid[:, None, :] & vote_mask[:, :, None]
        inside = inside & (jnp.arange(G)[None, None, :] != own[:, :, None])
        # rank of each containing box among this point's OTHER containing
        # boxes, in box-index order (exclusive count of earlier ones)
        ins_i = inside.astype(jnp.int32)
        rank = jnp.cumsum(ins_i, axis=-1) - ins_i
        slots = [votes[:, :, None, :]]
        for v in range(V - 1):
            match = (inside & (rank == v)).astype(points.dtype)  # ≤1 hit
            hasm = jnp.sum(match, -1, keepdims=True) > 0  # [B,N,1]
            cand = jnp.einsum("bng,bgc->bnc", match, centers)
            slots.append(
                jnp.where(hasm, cand - points, votes)[:, :, None, :]
            )
        votes = jnp.concatenate(slots, axis=2)
    return votes.astype(jnp.float32), vote_mask


def decode_compact_votes(batch: dict, vote_candidates: int) -> dict:
    """Replace a batch's `vote_owner` (the compact-votes wire format —
    int8 per point instead of [N,V,3] float32 targets, ~4x fewer feed
    bytes at V=3) with reconstructed `vote_targets`/`vote_mask`. No-op
    for batches already carrying expanded targets."""
    if "vote_owner" not in batch:
        return batch
    out = dict(batch)
    owner = out.pop("vote_owner")
    out["vote_targets"], out["vote_mask"] = expand_votes(
        out["points"], owner, out["gt_centers"], out["gt_sizes"],
        out["gt_headings"], out["gt_mask"], vote_candidates,
    )
    return out


@partial(
    jax.jit,
    static_argnames=("batch_size", "num_points", "num_classes", "max_boxes",
                     "max_objects", "min_objects", "vote_candidates"),
)
def synthetic_detection_batch(
    key,
    batch_size: int,
    num_points: int,
    num_classes: int = 4,
    max_boxes: int = 64,
    max_objects: int = 8,
    min_objects: int = 3,
    room: float = 4.0,
    vote_candidates: int = 1,
):
    """Device-resident detection_batch (data/synthetic.py semantics).

    Every scene has `g ∈ [min_objects, max_objects]` boxes; point slots of
    disabled object slots become extra floor points. Returns the standard
    padded batch dict, all arrays on device.
    """
    from tpu3dsad.data.synthetic import class_mean_sizes

    B, N = batch_size, num_points
    # mirror the host path's pad_boxes truncation: max_boxes below
    # max_objects caps the object count instead of tracing a negative pad
    G = min(max_objects, max_boxes)
    min_objects = min(min_objects, G)
    ks = jax.random.split(key, 12)
    mean_sizes = jnp.asarray(class_mean_sizes(num_classes))

    g = jax.random.randint(ks[0], (B,), min_objects, max_objects + 1)
    obj_valid = jnp.arange(G)[None, :] < g[:, None]  # [B,G]
    classes = jax.random.randint(ks[1], (B, G), 0, num_classes)
    sizes = mean_sizes[classes] * jax.random.uniform(
        ks[2], (B, G, 3), minval=0.8, maxval=1.25
    )
    headings = jax.random.uniform(ks[3], (B, G), minval=-np.pi, maxval=np.pi)
    cxy = jax.random.uniform(
        ks[4], (B, G, 2), minval=-room / 2 + 1, maxval=room / 2 - 1
    )
    centers = jnp.concatenate([cxy, sizes[..., 2:] / 2], -1)  # on the floor

    # point budget: fixed floor block + equal per-slot object blocks
    n_floor = N // 4
    per = (N - n_floor) // G
    n_obj = per * G
    n_floor = N - n_obj  # absorb the remainder into the floor

    fl = jax.random.uniform(
        ks[5], (B, n_floor, 2), minval=-room / 2, maxval=room / 2
    )
    floor = jnp.concatenate(
        [fl, 0.01 * jax.random.normal(ks[6], (B, n_floor, 1))], -1
    )

    # box-surface samples: uniform in the cube, one axis snapped to ±1
    cube = jax.random.uniform(ks[7], (B, G, per, 3), minval=-1.0, maxval=1.0)
    ax = jax.random.randint(ks[8], (B, G, per), 0, 3)
    sign = jnp.where(jax.random.bernoulli(ks[9], 0.5, (B, G, per)), 1.0, -1.0)
    snap = jax.nn.one_hot(ax, 3, dtype=cube.dtype)
    cube = cube * (1 - snap) + sign[..., None] * snap
    local = cube * 0.5 * sizes[:, :, None, :]
    r = _rot_z(headings)  # [B,G,3,3]
    obj_pts = (
        jnp.einsum("bgpc,bgdc->bgpd", local, r) + centers[:, :, None, :]
    )

    # disabled slots: replace with extra floor points (owner = floor)
    extra_fl = jax.random.uniform(
        ks[10], (B, G, per, 2), minval=-room / 2, maxval=room / 2
    )
    extra = jnp.concatenate(
        [extra_fl, 0.01 * jax.random.normal(ks[11], (B, G, per, 1))], -1
    )
    obj_pts = jnp.where(obj_valid[:, :, None, None], obj_pts, extra)

    points = jnp.concatenate([floor, obj_pts.reshape(B, n_obj, 3)], 1)
    owner = jnp.where(obj_valid, jnp.arange(G)[None, :], -1)  # [B,G]
    owner = jnp.concatenate(
        [
            jnp.full((B, n_floor), -1, jnp.int32),
            jnp.repeat(owner, per, axis=1).astype(jnp.int32),
        ],
        1,
    )  # [B,N]

    votes, vote_mask = expand_votes(
        points, owner, centers, sizes, headings, obj_valid, vote_candidates
    )

    pad = max_boxes - G
    z3 = jnp.zeros((B, pad, 3))
    return {
        "points": points.astype(jnp.float32),
        "point_mask": jnp.ones((B, N), bool),
        "vote_targets": votes.astype(jnp.float32),
        "vote_mask": vote_mask,
        "gt_centers": jnp.concatenate([centers, z3], 1).astype(jnp.float32),
        "gt_sizes": jnp.concatenate([sizes, z3], 1).astype(jnp.float32),
        "gt_headings": jnp.concatenate(
            [headings, jnp.zeros((B, pad))], 1
        ).astype(jnp.float32),
        "gt_classes": jnp.concatenate(
            [classes, jnp.zeros((B, pad), jnp.int32)], 1
        ).astype(jnp.int32),
        "gt_mask": jnp.concatenate(
            [obj_valid, jnp.zeros((B, pad), bool)], 1
        ),
    }
