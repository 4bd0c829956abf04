"""Packed-vs-loader HOST feed cost at config-#3 scale (ROADMAP #6).

Fabricates a ScanNet-layout dataset (40960-pt scenes on disk) and times
host-side batch assembly: the per-scene .npy loader (file reads +
instance->box matching + vote targets + augmentation) vs the packed
memory-mapped form (fancy-index over page-cached mmaps; augmentation
moves on-device). The host side is what packing exists to fix — the
sandbox's 1-core host and ~50MB/s device tunnel otherwise bound training.

(An end-to-end TPU comparison in this sandbox is NOT informative: both
feeds saturate the tunnel's ~72MB/epoch batch transfer + per-epoch
checkpoint save identically, hiding the host-side difference that
dominates on real hosts feeding 8 chips.)
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-side measurement

import numpy as np

from tpu3dsad.config import parse_cli
from tpu3dsad.data.packed import pack_dataset
from tpu3dsad.data.registry import get_dataset

ROOT = tempfile.mkdtemp(prefix="packed_bench_")
N_SCENES, N_PTS, B = 32, 40960, 8
rng = np.random.default_rng(0)
d = os.path.join(ROOT, "src", "train")
os.makedirs(d)
for i in range(N_SCENES):
    verts = np.concatenate(
        [rng.uniform(-3, 3, (N_PTS, 3)), rng.uniform(0, 255, (N_PTS, 3))], 1
    ).astype(np.float32)
    ins = rng.integers(0, 6, N_PTS)
    sem = np.where(ins > 0, 5, 0)
    bbox = np.array(
        [[0.5, 0.5, 0.5, 1, 1, 1, 5], [-1, -1, 0.4, 1, 1, 0.8, 4]],
        np.float32,
    )
    np.save(f"{d}/s{i:04d}_vert.npy", verts)
    np.save(f"{d}/s{i:04d}_ins_label.npy", ins)
    np.save(f"{d}/s{i:04d}_sem_label.npy", sem)
    np.save(f"{d}/s{i:04d}_bbox.npy", bbox)

base = ["model.name=detector", f"data.num_points={N_PTS}",
        "data.max_boxes=64", "data.name=scannet", f"data.root={ROOT}/src"]

ds = get_dataset(parse_cli(base + ["data.augment=true"]))
r = np.random.default_rng(1)
ds.train_batch(r, B)  # warm file cache
t0 = time.perf_counter()
for _ in range(4):
    ds.train_batch(r, B)
t_loader = (time.perf_counter() - t0) / 4

t0 = time.perf_counter()
pack_dataset(get_dataset(parse_cli(base + ["data.augment=false"])),
             f"{ROOT}/packed", source_dataset="scannet")
t_pack = time.perf_counter() - t0

pds = get_dataset(parse_cli(
    ["model.name=detector", f"data.num_points={N_PTS}", "data.max_boxes=64",
     "data.name=packed", f"data.root={ROOT}/packed"]))
pds.train_batch(r, B)  # warm page cache
t0 = time.perf_counter()
for _ in range(4):
    pds.train_batch(r, B)
t_packed = (time.perf_counter() - t0) / 4

print(f"one-time pack: {t_pack:.1f}s for {N_SCENES} scenes")
print(f"host batch assembly (b={B}, {N_PTS} pts): "
      f"loader+augment {t_loader * 1e3:.0f} ms, "
      f"packed mmap {t_packed * 1e3:.0f} ms -> {t_loader / t_packed:.1f}x")
print(f"host-sustainable: loader {B / t_loader:.0f} scenes/s, "
      f"packed {B / t_packed:.0f} scenes/s")
shutil.rmtree(ROOT)
