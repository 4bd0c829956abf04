"""End-to-end training throughput sweep over (num_points, batch, k).

VERDICT r2 #1: one jitted step per host call left training dispatch-bound
(~30-60ms/call through the axon tunnel). train.steps_per_call=k fuses k
steps into one dispatch; this harness measures the REAL train loop
(train_detector.run_detector — device_synth feed, logging, checkpointing)
at each point and prints steady-state scenes/s, so the PARITY numbers come
from the actual CLI path, not a stripped-down loop.

Run on the real TPU: python bench/bench_train_throughput.py [quick]
"""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.train_detector import run_detector

SWEEP = [
    # (num_points, batch, k) — config-#3 scale (40960), config-#5 (20480),
    # and the 8192-pt recipe scale where the per-call dispatch share is
    # largest (shortest device step)
    (40960, 8, 1),
    (40960, 8, 16),
    (40960, 32, 8),
    (20480, 32, 1),
    (20480, 32, 8),
    (20480, 32, 16),
    (8192, 8, 1),
    (8192, 8, 8),
    (8192, 8, 16),
    # large-batch rows: the FPS pick loop is shared across all rows of a
    # batch group (per-scene pick cost drops ~6x from b=8 to b=32), but
    # measured throughput is WORSE (113 vs 136 scenes/s): the O(B·M·N)
    # grouping selector + grouped-MLP/bwd work scales linearly with B and
    # becomes the binder once FPS amortizes. b=8 stays the best per-scene
    # config at 8192 pts.
    (8192, 32, 8),
    (8192, 32, 16),
]


def run_one(num_points, batch, k, epochs=4):
    ov = [
        "model.name=detector", "data.name=synthetic",
        f"data.num_points={num_points}", "data.max_boxes=64",
        "model.num_classes=18", "data.device_synth=true",
        f"train.batch_size={batch}", f"train.steps_per_call={k}",
        f"train.num_epochs={epochs}", "train.eval_every=1000",
        "train.ckpt_every=1000", "train.log_every=100000",
        "train.ckpt_dir=/tmp/bench_tt_ckpt", "ops_impl=pallas",
    ]
    cfg = apply_overrides(Config(), ov)
    import shutil

    shutil.rmtree("/tmp/bench_tt_ckpt", ignore_errors=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_detector(cfg)
    rows = [
        json.loads(line)
        for line in buf.getvalue().splitlines()
        if line.startswith("{") and "scenes_per_sec" in line
    ]
    # first epoch carries compile; steady state = the later epochs
    steady = [r["scenes_per_sec"] for r in rows[1:]] or [
        r["scenes_per_sec"] for r in rows
    ]
    return max(steady), rows


def main():
    quick = "quick" in sys.argv[1:]
    sweep = SWEEP[:2] if quick else SWEEP
    results = []
    for num_points, batch, k in sweep:
        sps, rows = run_one(num_points, batch, k)
        rec = {
            "num_points": num_points, "batch": batch, "k": k,
            "scenes_per_sec": sps,
            "epochs": [r["scenes_per_sec"] for r in rows],
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
