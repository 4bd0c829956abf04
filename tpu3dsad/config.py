"""Frozen-dataclass config system with key=value CLI overrides.

Replaces the lineage's ~30 argparse flags in train.py/eval.py plus the
per-dataset DatasetConfig classes (SURVEY.md §5 "Config / flag system").
Everything that shapes the compiled program (point budgets, proposal count,
radius bank, heading bins) lives here so it is jit-static by construction.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, replace
from typing import Any


@dataclass(frozen=True)
class ModelConfig:
    name: str = "detector"  # 'detector' | 'classifier'
    num_classes: int = 18
    num_heading_bins: int = 12
    num_proposals: int = 256
    vote_factor: int = 1
    # backbone SA pyramid (ScanNet-scale defaults, SURVEY.md §3.3)
    sa_npoints: tuple[int, ...] = (2048, 1024, 512, 256)
    sa_radii: tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    sa_nsamples: tuple[int, ...] = (64, 32, 16, 16)
    sa_channels: tuple[tuple[int, ...], ...] = (
        (64, 64, 128),
        (128, 128, 256),
        (128, 128, 256),
        (128, 128, 256),
    )
    fp_channels: tuple[tuple[int, ...], ...] = ((256, 256), (256, 256))
    seed_feat_dim: int = 256
    # size-adaptive clustering (the 3DSAD delta): bank of grouping radii,
    # one chosen/blended per proposal from predicted size class
    cluster_radius_bank: tuple[float, ...] = (0.15, 0.3, 0.6)
    # giant-cloud (CP) mode: how many leading SA levels run point-sharded
    # over a mesh passed to the model as cp_mesh (docs/context_parallel.md)
    cp_stages: int = 1
    cluster_nsample: int = 16
    # 'adaptive' = 3DSAD radius bank; 'lineage' = fixed-radius VoteNet head
    # (full lineage checkpoints import into this mode for box-level parity)
    proposal_mode: str = "adaptive"
    proposal_radius: float = 0.3  # lineage ProposalModule r
    # proposal-center selection (adaptive head only; the lineage head always
    # uses plain FPS for checkpoint parity): 'fps' = lineage FPS over votes;
    # 'density' = foreground-biased — FPS restricted to the top
    # num_proposals*proposal_candidate_factor votes by local vote density
    # (models/proposal.py::density_biased_fps; VERDICT r3 #4 — in sparse
    # outdoor clouds plain FPS puts ~95% of proposals on background)
    proposal_sampling: str = "fps"
    proposal_density_radius: float = 0.3
    proposal_candidate_factor: int = 4
    # objectness assignment zone (lineage loss_helper NEAR/FAR 0.3/0.6 m —
    # indoor constants; outdoor/KITTI configs must scale them with object
    # size or no proposal ever becomes positive)
    assign_near: float = 0.3
    assign_far: float = 0.6
    # center-chamfer distance unit in meters (losses.center_loss): d²/norm².
    # 1.0 = the lineage indoor recipe (bit-identical). Outdoor configs set
    # ≈ assign_near so car-scale distances don't dominate the loss balance
    center_loss_norm: float = 1.0
    # lineage use_height: append the z-above-floor channel (computed
    # IN-MODEL from the scene floor — models/detector.py)
    append_height: bool = True
    # classifier only: multi-scale grouping (lineage pointnet2_cls_msg —
    # the ModelNet40 91.9% anchor architecture); default SSG
    classifier_msg: bool = False
    dropout: float = 0.5


@dataclass(frozen=True)
class DataConfig:
    name: str = "scannet"  # 'synthetic' | 'modelnet' | 'scannet' | 'sunrgbd'
    # | 'kitti' | 'packed' (memory-mapped pre-frozen scenes, data/packed.py)
    root: str = ""
    num_points: int = 40960
    max_boxes: int = 64
    augment: bool = True
    use_color: bool = False
    # run large-cloud preprocessing FPS (KITTI crop→budget) on the TPU
    device_preproc: bool = False
    # TPU-side pipeline (1-core host / slow link — SURVEY §7 hard part #6):
    # device_augment moves flip/rot/scale into the jitted train step (host
    # loads canonical scenes only); device_synth generates synthetic batches
    # entirely on device (zero host work / link bytes per step)
    device_augment: bool = False
    device_synth: bool = False
    # augmentation: 'auto' applies the dataset's lineage recipe
    # (data/augment.py AUG_PRESETS); 'custom' honors the fields below
    aug_preset: str = "auto"
    aug_flip_x: bool = True
    aug_flip_y: bool = True
    aug_rot_range: float = 0.08726646  # HALF-range ±rad (π/36 = ±5°)
    aug_scale_min: float = 1.0  # min==max==1.0 disables scale jitter
    aug_scale_max: float = 1.0
    # vote candidates per point (lineage GT_VOTE_FACTOR=3 shapes). Points
    # inside several GT boxes carry up to V candidate offsets and the vote
    # loss takes the min (losses.py vote_loss); targets are [N,V,3] with
    # unused slots copying the primary. NOTE: distinct other-box candidates
    # are exact lineage semantics for SUN RGB-D only; lineage ScanNet tiles
    # 3 IDENTICAL copies (== V=1 under min-over-V), so V>1 on ScanNet is a
    # deliberate measured deviation (mAP@0.5 0.162→0.269 — see
    # data/scannet.py). Set 1 for the compact single-owner form ([N,3])
    # and exact lineage-ScanNet loss semantics.
    vote_candidates: int = 3
    # compact-votes wire format (scannet/packed feeds): the loader emits a
    # per-point int8 `vote_owner` instead of the expanded float32
    # [N,(V,)3] targets and the jitted step reconstructs them on device
    # (device_pipeline.expand_votes — same semantics, pinned by test).
    # At 8192 pts / V=3 this cuts host→device feed bytes ~3.4x per scene;
    # the packed leg moved 84 → ~fed-at-capacity scenes/s on the tunnel.
    # KNOWN DIVERGENCE on scenes with more objects than data.max_boxes
    # (ADVICE r3): the int8 owner cannot address a truncated box, so those
    # points DROP vote supervision (owner=-1), while the expanded path keeps
    # their votes aimed at the truncated box's center. In-roster scenes are
    # bitwise identical. Pinned by
    # test_compact_votes.py::test_truncated_owner_drops_supervision.
    compact_votes: bool = False


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    num_epochs: int = 180
    lr: float = 1e-3
    lr_decay_steps: tuple[int, ...] = (80, 120, 160)  # epochs
    lr_decay_rates: tuple[float, ...] = (0.1, 0.1, 0.1)
    weight_decay: float = 0.0
    bn_momentum_init: float = 0.5
    # cap on the flax running-average weight; 0.999 ⇔ the lineage's
    # BN_MOMENTUM_MAX torch-momentum floor of 0.001 (train.py scheduler)
    bn_momentum_max: float = 0.999
    bn_decay_epochs: int = 20  # lineage BN_DECAY_STEP: halve torch-m every N
    grad_clip: float = 0.0
    # train steps fused into ONE device dispatch (lax.scan over a
    # device-resident block of k batches). Per-call tunnel dispatch costs
    # ~30-60ms; at k=1 end-to-end training ran at half the device's measured
    # capacity (VERDICT r2). k>1 amortizes it to ~1/k per step. Blocks never
    # cross epoch boundaries: steps_per_epoch is rounded DOWN to a multiple
    # of k (no remainder single steps — scenes are sampled randomly, so
    # epochs are step-count brackets, nothing is systematically skipped);
    # k itself is clamped to steps_per_epoch, so a tiny dataset with a
    # large k runs k=steps_per_epoch rather than oversampling (ADVICE r4).
    # Resuming a checkpoint under a k that changes the rounded
    # steps_per_epoch remaps epoch boundaries (lr-decay/BN schedules shift);
    # train_detector warns via <ckpt_dir>/train_meta.json.
    steps_per_call: int = 1
    seed: int = 0
    ckpt_dir: str = "./ckpt"
    # checkpoint cadence in epochs (lineage saves every epoch; raise for
    # short-epoch runs where the save dominates — the final epoch always
    # saves regardless)
    ckpt_every: int = 1
    log_every: int = 10
    eval_every: int = 10  # epochs
    profile_dir: str = ""
    tb_dir: str = ""  # optional TensorBoard scalars (lineage TB parity)
    mesh_shape: tuple[int, ...] = (-1,)  # data-parallel axis; -1 = all devices
    mesh_axes: tuple[str, ...] = ("data",)
    # TPU-native default: fp32 tensors, bf16 MXU passes for the MLP matmuls
    # (distance/threshold math is pinned fp32 regardless — ops/xla/common.py).
    # False forces full-fp32 matmuls everywhere (the AP-parity measurement
    # mode, SURVEY.md §7 design invariants).
    bf16_matmul: bool = True


@dataclass(frozen=True)
class EvalConfig:
    nms_iou: float = 0.25
    objectness_thresh: float = 0.05
    ap_iou_threshs: tuple[float, ...] = (0.25, 0.5)
    use_3d_nms: bool = True
    cls_nms: bool = True
    # suppress with oriented BEV IoU (the same IoU AP scores with) instead
    # of the lineage's axis-aligned hulls
    use_oriented_nms: bool = False
    per_class_proposal: bool = True
    conf_thresh: float = 0.05
    # evaluate the best-mAP snapshot (<ckpt_dir>/best, written whenever the
    # train-loop eval improves) instead of the latest rolling checkpoint
    use_best: bool = False


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    ops_impl: str = "xla"  # 'xla' | 'pallas'
    # single-pass approx in-ball member selection (11x faster grouping;
    # membership stays exact-in-ball). Turn off for lineage scan-order parity.
    ops_fast_grouping: bool = True
    # pallas-tier fast selector: 'approx' (lax.approx_max_k, ~99.9% member
    # recall) | 'sorted' (exact kernel on Z-order-sorted views: exact
    # membership/counts, spatial selection order — ops.pallas.ball_query)
    ops_fast_mode: str = "approx"


def _coerce_obj(obj: Any, typ: Any):
    """Coerce an already-parsed python value (from ast.literal_eval) onto the
    annotated config type, recursing through nested tuples."""
    import typing

    origin = typing.get_origin(typ)
    if origin is tuple:
        args = typing.get_args(typ)
        elem = args[0] if args else str
        if not isinstance(obj, (list, tuple)):
            obj = (obj,)  # '(80)' evaluates to a scalar — promote
        return tuple(_coerce_obj(o, elem) for o in obj)
    if typ is bool:
        return bool(obj)
    if typ is int:
        return int(obj)
    if typ is float:
        return float(obj)
    if not isinstance(obj, str):
        # a str-annotated field got a non-string literal (e.g. a typo like
        # train.mesh_axes=(1,2)); silently str()-ing it defers the failure
        # to a confusing mesh-axis lookup — fail at parse time instead
        raise ValueError(
            f"expected a string for this config field, got {obj!r} "
            f"({type(obj).__name__}) — quote it if it is meant as a name"
        )
    return obj


def _coerce(val: str, typ: Any):
    import typing

    origin = typing.get_origin(typ)
    if origin is tuple:
        args = typing.get_args(typ)
        elem = args[0] if args else str
        s = val.strip()
        if s in ("()", ""):
            return ()
        # literal_eval handles NESTED tuples (and spaces) correctly — the
        # old strip-and-split silently flattened '((16,16),(16,32))' into
        # singleton tuples. Unquoted strings (mesh_axes=data) aren't python
        # literals; those fall back to the flat split below.
        import ast

        try:
            obj = ast.literal_eval(s)
        except (ValueError, SyntaxError):
            # unquoted strings (mesh_axes=data) aren't python literals —
            # fall through to the flat split. Note: only the PARSE failure
            # falls through; a type mismatch inside _coerce_obj (e.g.
            # mesh_axes=(1,2)) raises loudly.
            parts = [p for p in s.strip("()[] ").split(",") if p.strip()]
            return tuple(_coerce(p.strip(), elem) for p in parts)
        return _coerce_obj(obj, typ)
    if typ is bool or typ == "bool":
        return val.lower() in ("1", "true", "yes", "on")
    if typ is int or typ == "int":
        return int(val)
    if typ is float or typ == "float":
        return float(val)
    return val


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply 'section.key=value' (or 'key=value' for top-level) overrides."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, val = ov.split("=", 1)
        path = key.split(".")
        cfg = _set_path(cfg, path, val)
    return cfg


def _set_path(obj, path, val):
    import typing

    name = path[0]
    if name not in {f.name for f in fields(obj)}:
        valid = [f.name for f in fields(obj)]
        raise ValueError(f"unknown config key {name!r}; valid: {valid}")
    if len(path) == 1:
        # resolve postponed (string) annotations to real types
        typ = typing.get_type_hints(type(obj))[name]
        return replace(obj, **{name: _coerce(val, typ)})
    return replace(obj, **{name: _set_path(getattr(obj, name), path[1:], val)})


def parse_cli(argv: list[str]) -> Config:
    from tpu3dsad.presets import expand

    return apply_overrides(Config(), expand([a for a in argv if "=" in a]))


def describe(cfg: Config) -> str:
    return "\n".join(
        f"{sec.name}: {getattr(cfg, sec.name)}" for sec in dataclasses.fields(cfg)
    )
