"""Packed-vs-loader training feed at config-#3 scale (real TPU).

Fabricates a 64-scene ScanNet-layout dataset (40960-pt scenes on disk),
then times detector training fed by (a) the per-scene .npy loader with
host augmentation and (b) the packed memory-mapped form with on-device
augmentation — the ROADMAP #6 machinery, end to end on hardware."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu3dsad.config import parse_cli
from tpu3dsad.data.packed import pack_dataset
from tpu3dsad.data.registry import get_dataset

ROOT = tempfile.mkdtemp(prefix="packed_bench_")
N_SCENES, N_PTS = 64, 40960
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
        [[0.5, 0.5, 0.5, 1, 1, 1, 5], [-1, -1, 0.4, 1, 1, 0.8, 4],
         [1.5, -1.5, 0.3, 0.8, 0.8, 0.6, 7]], np.float32,
    )
    np.save(f"{d}/scene{i:04d}_vert.npy", verts)
    np.save(f"{d}/scene{i:04d}_ins_label.npy", ins)
    np.save(f"{d}/scene{i:04d}_sem_label.npy", sem)
    np.save(f"{d}/scene{i:04d}_bbox.npy", bbox)

base = [
    "model.name=detector", "model.num_classes=18",
    f"data.num_points={N_PTS}", "data.max_boxes=64",
    "train.batch_size=8", "train.num_epochs=4", "train.eval_every=1000",
    "train.log_every=1000", "ops_impl=pallas",
]

t0 = time.time()
cfg = parse_cli(base + ["data.name=scannet", f"data.root={ROOT}/src",
                        "data.augment=false"])
pack_dataset(get_dataset(cfg), f"{ROOT}/packed", source_dataset="scannet")
print(f"pack time: {time.time() - t0:.1f}s for {N_SCENES} scenes", flush=True)


def run(tag, overrides, ckpt):
    from tpu3dsad.train_detector import run_detector

    cfg = parse_cli(base + overrides + [f"train.ckpt_dir={ckpt}"])
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_detector(cfg)
    rates = [json.loads(line)["scenes_per_sec"]
             for line in buf.getvalue().splitlines()
             if "scenes_per_sec" in line]
    print(f"{tag:40s} epochs {['%.1f' % r for r in rates]} -> steady "
          f"{np.median(rates[1:]):.1f} scenes/s", flush=True)


run("per-scene loader + host augment",
    ["data.name=scannet", f"data.root={ROOT}/src", "data.augment=true"],
    f"{ROOT}/ck1")
run("packed mmap + device augment",
    ["data.name=packed", f"data.root={ROOT}/packed",
     "data.device_augment=true"],
    f"{ROOT}/ck2")
shutil.rmtree(ROOT)
