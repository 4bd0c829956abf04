"""Demo entry point: run the detector on one scene and dump the boxes.

Lineage: demo.py (SURVEY.md §2.2 "Eval / demo CLIs").
Usage: python demo.py train.ckpt_dir=./ckpt [out=/tmp/demo] [overrides]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad import train_lib
from tpu3dsad.config import parse_cli
from tpu3dsad.data import get_dataset
from tpu3dsad.eval.parse import parse_predictions
from tpu3dsad.train_detector import build_detector


def main(argv):
    from tpu3dsad.utils.platform import force_platform_from_env

    force_platform_from_env()  # TPU3DSAD_PLATFORM=cpu|axon, pre-backend-init
    out_dir = "/tmp/tpu3dsad_demo"
    rest = []
    for a in argv:
        if a.startswith("out="):
            out_dir = a.split("=", 1)[1]
        else:
            rest.append(a)
    cfg = parse_cli(rest)
    dataset = get_dataset(cfg)
    model = build_detector(cfg, dataset.mean_sizes)

    rng = np.random.default_rng(7)
    batch_np = dataset.train_batch(rng, 1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    tx = train_lib.make_optimizer(cfg.train, 100)
    state = train_lib.create_state(
        model,
        lambda k: model.init(
            k, batch["points"], batch.get("point_features"),
            mask=batch["point_mask"], train=False,
        ),
        tx,
        jax.random.key(0),
    )
    state, step = train_lib.restore_checkpoint(
        cfg.train.ckpt_dir, state, for_eval=True,
        use_best=cfg.eval.use_best,
    )

    end_points = jax.jit(
        lambda s, b: model.apply(
            {"params": s.params, "batch_stats": s.batch_stats},
            b["points"], b.get("point_features"),
            mask=b["point_mask"], train=False,
        )
    )(state, batch)
    parsed = parse_predictions(
        end_points, model._mean_sizes(), cfg.model.num_heading_bins, cfg.eval
    )

    os.makedirs(out_dir, exist_ok=True)
    keep = np.asarray(parsed["keep"])[0]
    dets = []
    for p in np.nonzero(keep)[0]:
        dets.append(
            {
                "center": np.asarray(parsed["center"])[0, p].tolist(),
                "size": np.asarray(parsed["size"])[0, p].tolist(),
                "heading": float(np.asarray(parsed["heading"])[0, p]),
                "class": int(np.asarray(parsed["sem_cls"])[0, p]),
                "score": float(np.asarray(parsed["obj_prob"])[0, p]),
            }
        )
    with open(os.path.join(out_dir, "detections.json"), "w") as f:
        json.dump({"ckpt_step": step, "detections": dets}, f, indent=1)
    np.save(os.path.join(out_dir, "points.npy"), batch_np["points"][0])

    from tpu3dsad.utils.dump import dump_results

    dump_results(out_dir, batch_np, parsed, scene=0)
    print(f"wrote {len(dets)} detections to {out_dir}/ (json + ply + obj)")


if __name__ == "__main__":
    main(sys.argv[1:])
