"""Named config presets: bundles of `section.key=value` overrides.

The lineage encodes per-dataset recipes in argparse defaults + wiki
commands; here they are data (inspectable, testable) applied BEFORE the
user's own overrides, so `python train.py preset=outdoor train.lr=5e-4`
starts from the outdoor recipe and then adjusts it.

Presets carry only what DIFFERS from the dataclass defaults (which are
the ScanNet-scale indoor recipe, SURVEY.md §3.3).
"""

from __future__ import annotations

PRESETS: dict[str, list[str]] = {
    # benchmark config #2 scale: SUN RGB-D (20k pts, 10 classes)
    "sunrgbd": [
        "data.name=sunrgbd",
        "data.num_points=20480",
        "model.num_classes=10",
    ],
    # benchmark config #3: ScanNet V2 (40k pts, 18 classes) == the
    # dataclass defaults; listed so `preset=scannet` is valid and explicit
    "scannet": [
        "data.name=scannet",
    ],
    # benchmark config #4: KITTI-style outdoor. Indoor constants do not
    # transfer: SA radii/assign zone/radius bank scale to car size, the
    # center chamfer is measured in assign_near units
    # (model.center_loss_norm — losses.py), and gradients are clipped
    # against sparse-positive noise. Converged on the synthetic-outdoor
    # set (docs/experiments/README.md r3 KITTI rows).
    "outdoor": [
        "data.name=kitti",
        "data.num_points=16384",
        "data.max_boxes=16",
        "model.num_classes=3",
        "model.sa_radii=(0.8,1.6,3.2,6.4)",
        "model.sa_npoints=(2048,1024,512,256)",
        "model.cluster_radius_bank=(0.4,0.8,1.6)",
        "model.assign_near=1.5",
        "model.assign_far=3.0",
        "model.center_loss_norm=1.5",
        "train.grad_clip=1.0",
        "train.lr_decay_steps=(450,750,1000)",
        "train.lr_decay_rates=(0.3,0.3,0.3)",
        "train.num_epochs=1200",
    ],
    # benchmark config #1: PointNet++ SSG classifier, 1024-pt clouds
    "classifier": [
        "model.name=classifier",
        "data.num_points=1024",
    ],
}


def expand(overrides: list[str]) -> list[str]:
    """Expand any `preset=<name>` items in place (preset overrides first,
    then everything the user wrote after it — later wins)."""
    out: list[str] = []
    for ov in overrides:
        if ov.startswith("preset="):
            name = ov.split("=", 1)[1]
            if name not in PRESETS:
                raise ValueError(
                    f"unknown preset {name!r}; available: {sorted(PRESETS)}"
                )
            out.extend(PRESETS[name])
        else:
            out.append(ov)
    return out
