"""demo.py CLI smoke: the default (use_best=false) path must run end to end
(regression: a function-local `import os` in the use_best branch shadowed
the module import and crashed every default invocation)."""

import json
import sys


def test_demo_cli_default_path(tmp_path):
    sys.path.insert(0, "/root/repo")
    import demo

    demo.main([
        f"out={tmp_path}", "model.name=detector", "data.name=synthetic",
        "data.num_points=512", "data.max_boxes=8", "model.num_classes=4",
        "model.sa_npoints=(128,64,32,16)", "model.sa_nsamples=(8,8,4,4)",
        "model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
        "model.fp_channels=((32,32),(32,32))", "model.seed_feat_dim=32",
        "model.num_proposals=16", "model.cluster_nsample=4",
        f"train.ckpt_dir={tmp_path}/no_ckpt",
    ])
    out = json.load(open(tmp_path / "detections.json"))
    assert out["ckpt_step"] == 0  # no checkpoint: random weights
    assert isinstance(out["detections"], list)
    assert (tmp_path / "points.ply").exists() or (
        tmp_path / "points.npy"
    ).exists()
