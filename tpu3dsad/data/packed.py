"""Packed memory-mapped dataset format — the real-data input pipeline at
training scale (ROADMAP #6; SURVEY.md §7 hard part #6).

The per-scene .npy loaders (scannet/sunrgbd/kitti) do real work per scene:
file reads, instance→box matching, vote-target construction, KITTI
crop+FPS. Packing runs that work ONCE and freezes the padded, fixed-shape
training dicts into flat binaries — after that, a training batch is a
fancy-index over OS-page-cached memmaps (microseconds, zero Python per
point) and augmentation runs on device (`data.device_augment`, which
operates on exactly these padded dicts).

Layout of a packed split directory:

  header.json          {"num_scenes": S, "keys": {name: {"shape": [...],
                        "dtype": "float32"}}, "class_names": [...],
                        "mean_sizes": [[...]], "pack_seed": int}
  <key>.npy            npy array [S, *shape] of dtype, C-order

Use:
  python -m tpu3dsad.data.packed data.name=scannet data.root=/d/scannet \
      out=/d/scannet_packed            # convert (train + val)
  python train.py model.name=detector data.name=packed \
      data.root=/d/scannet_packed ...  # train from the packed form

Determinism: scene i is loaded with np.random.default_rng(pack_seed + i),
so a pack is reproducible and testable against the source loader.
"""

from __future__ import annotations

import json
import os

import numpy as np

from tpu3dsad.config import Config
from tpu3dsad.data.pipeline import iter_val_batches

_HEADER = "header.json"


def _scene_lists(dataset):
    """(train_items, val_items) across the three loader families."""
    if hasattr(dataset, "train_scans"):
        return dataset.train_scans, dataset.val_scans
    return dataset.train_items, dataset.val_items


def pack_split(dataset, items, out_dir: str, pack_seed: int = 0,
               source_dataset: str = "") -> int:
    """Freeze `items` (list of (dir, id) pairs) into `out_dir`. Returns the
    scene count (0 ⇒ nothing written — empty splits produce no directory)."""
    if not items:
        return 0
    os.makedirs(out_dir, exist_ok=True)
    mm, keys = {}, None
    for i, it in enumerate(items):
        scene = dataset._load_scene(
            *it, np.random.default_rng(pack_seed + i), False
        )
        if keys is None:
            keys = {
                k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                for k, v in scene.items()
            }
            for k, v in scene.items():
                mm[k] = np.lib.format.open_memmap(
                    os.path.join(out_dir, f"{k}.npy"),
                    mode="w+",
                    dtype=v.dtype,
                    shape=(len(items),) + v.shape,
                )
        if set(scene) != set(keys):
            raise ValueError(
                f"scene {it} keys {sorted(scene)} != first scene's "
                f"{sorted(keys)} — mixed datasets cannot pack"
            )
        for k, v in scene.items():
            mm[k][i] = v
    for m in mm.values():
        m.flush()
    header = {
        "num_scenes": len(items),
        "keys": keys,
        "class_names": list(dataset.class_names),
        "mean_sizes": np.asarray(dataset.mean_sizes).tolist(),
        "pack_seed": pack_seed,
        # remembered so device augmentation applies the SOURCE dataset's
        # lineage recipe (augment.resolve_aug), not a generic default
        "source_dataset": source_dataset,
    }
    with open(os.path.join(out_dir, _HEADER), "w") as f:
        json.dump(header, f)
    return len(items)


def pack_dataset(dataset, out_root: str, pack_seed: int = 0,
                 source_dataset: str = "") -> dict:
    """Pack both splits under `<out_root>/{train,val}`. Returns counts.

    source_dataset defaults to the dataset's own config name so device
    augmentation later resolves the right lineage preset."""
    if not source_dataset:
        source_dataset = getattr(
            getattr(dataset, "cfg", None), "data", None
        ) and dataset.cfg.data.name or ""
    train_items, val_items = _scene_lists(dataset)
    return {
        "train": pack_split(
            dataset, train_items, os.path.join(out_root, "train"), pack_seed,
            source_dataset=source_dataset,
        ),
        "val": pack_split(
            dataset, val_items, os.path.join(out_root, "val"), pack_seed,
            source_dataset=source_dataset,
        ),
    }


class PackedSplit:
    """Memory-mapped view of one packed split."""

    def __init__(self, path: str):
        with open(os.path.join(path, _HEADER)) as f:
            self.header = json.load(f)
        self.num_scenes = self.header["num_scenes"]
        self._arr = {
            k: np.load(os.path.join(path, f"{k}.npy"), mmap_mode="r")
            for k in self.header["keys"]
        }

    def __len__(self):
        return self.num_scenes

    def scene(self, i: int) -> dict:
        return {k: a[i] for k, a in self._arr.items()}

    def gather(self, idx) -> dict:
        """Batch dict for scene indices `idx` — one bulk copy per key."""
        idx = np.asarray(idx)
        return {k: a[idx] for k, a in self._arr.items()}


class PackedDetectionDataset:
    """Registry adapter (`data.name=packed`): the standard dataset protocol
    over `<data.root>/{train,val}` packed splits."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        root = cfg.data.root
        train_dir = os.path.join(root, "train")
        if not os.path.isfile(os.path.join(train_dir, _HEADER)):
            raise FileNotFoundError(
                f"data.root={root!r} has no packed train split — create one "
                "with python -m tpu3dsad.data.packed (see module docstring)"
            )
        self.train = PackedSplit(train_dir)
        val_dir = os.path.join(root, "val")
        self.val = (
            PackedSplit(val_dir)
            if os.path.isfile(os.path.join(val_dir, _HEADER))
            else None
        )
        h = self.train.header
        # the packed scenes' origin — drives the device-augmentation preset
        self.source_dataset = h.get("source_dataset") or "scannet"
        self.class_names = h["class_names"]
        self.num_classes = len(self.class_names)
        self.mean_sizes = np.asarray(h["mean_sizes"], np.float32)
        n_pts = h["keys"]["points"]["shape"][0]
        if n_pts != cfg.data.num_points:
            raise ValueError(
                f"packed split holds {n_pts}-point scenes but "
                f"data.num_points={cfg.data.num_points} — repack or match"
            )
        if "gt_centers" in h["keys"]:
            n_boxes = h["keys"]["gt_centers"]["shape"][0]
            if n_boxes != cfg.data.max_boxes:
                raise ValueError(
                    f"packed split holds {n_boxes}-box scenes but "
                    f"data.max_boxes={cfg.data.max_boxes} — repack or match"
                )
        has_feats = "point_features" in h["keys"]
        if cfg.data.use_color != has_feats:
            raise ValueError(
                f"packed split was built {'with' if has_feats else 'without'} "
                f"point_features but data.use_color={cfg.data.use_color} — "
                "repack or match"
            )

    def steps_per_epoch(self, batch_size: int) -> int:
        return max(1, len(self.train) // batch_size)

    def train_batch(self, rng: np.random.Generator, batch_size: int) -> dict:
        picks = rng.choice(
            len(self.train), batch_size, replace=len(self.train) < batch_size
        )
        return self.train.gather(picks)

    def val_batches(self, rng: np.random.Generator, batch_size: int):
        split = self.val or self.train
        yield from iter_val_batches(
            list(range(len(split))), lambda i: split.scene(i), batch_size
        )


def device_prefetch(batches, mesh=None, depth: int = 2,
                    stacked: bool = False):
    """Double-buffered host→device feed: keep `depth` batches' transfers
    dispatched ahead of the consumer so the copy of batch i+1 overlaps the
    train step on batch i (JAX dispatch is async; yielding only after the
    next transfer is enqueued is what creates the overlap window).

    stacked=True marks [k, B, ...] step-block leaves (train.steps_per_call):
    the batch dim to shard over the data axis is then axis 1, with the
    leading k (scan) axis replicated."""
    from collections import deque

    import jax.numpy as jnp

    from tpu3dsad.parallel import shard_batch

    q: deque = deque()
    for b in batches:
        if mesh is not None:
            # device_put accepts numpy directly: sharding at transfer time,
            # not land-on-device-0-then-reshard (halves link volume)
            d = shard_batch(b, mesh, batch_axis_index=1 if stacked else 0)
        else:
            d = {k: jnp.asarray(v) for k, v in b.items()}
        q.append(d)
        if len(q) > depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def main(argv):
    from tpu3dsad.config import parse_cli

    out = None
    rest = []
    for a in argv:
        if a.startswith("out="):
            out = a[len("out=") :]
        else:
            rest.append(a)
    if not out:
        raise SystemExit(
            "usage: python -m tpu3dsad.data.packed data.name=<ds> "
            "data.root=<src> out=<dst> [overrides...]"
        )
    cfg = parse_cli(rest)
    from tpu3dsad.data import get_dataset

    counts = pack_dataset(get_dataset(cfg), out,
                          source_dataset=cfg.data.name)
    print(json.dumps({"packed": counts, "out": out}))


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
