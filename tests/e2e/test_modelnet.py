"""ModelNet-style classification loader on a fabricated fixture."""

import numpy as np

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.modelnet import ModelNetClassificationDataset


def _write(root, split, n_items=6, n=300, nc=3):
    d = root / split
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n_items):
        np.save(d / f"obj{i}_pts.npy", rng.standard_normal((n, 3)).astype(np.float32) * 5)
        np.save(d / f"obj{i}_label.npy", np.int64(i % nc))


def test_modelnet_loader(tmp_path, rng):
    _write(tmp_path, "train")
    _write(tmp_path, "test", n_items=4)
    cfg = apply_overrides(
        Config(),
        ["data.name=modelnet", f"data.root={tmp_path}", "data.num_points=128"],
    )
    ds = ModelNetClassificationDataset(cfg)
    assert ds.num_classes == 3
    b = ds.train_batch(rng, 4)
    assert b["points"].shape == (4, 128, 3)
    assert b["labels"].shape == (4,)
    # unit-sphere normalization bound (augment scale jitter ≤ 1.25 + jitter)
    assert np.linalg.norm(b["points"], axis=-1).max() < 1.4
    vb = list(ds.val_batches(rng, 2))
    assert len(vb) == 2
    assert np.linalg.norm(vb[0]["points"], axis=-1).max() <= 1.0 + 1e-5


def test_classifier_cli_evals_modelnet_val(tmp_path, capsys):
    """run_classifier must report held-out accuracy on the modelnet val
    split (the lineage ModelNet40 anchor is a val-acc metric)."""
    import json

    from train import run_classifier

    _write(tmp_path / "data", "train")
    _write(tmp_path / "data", "test", n_items=5)  # odd: exercises tail pad
    cfg = apply_overrides(
        Config(),
        [
            "model.name=classifier",
            "data.name=modelnet",
            f"data.root={tmp_path / 'data'}",
            "data.num_points=64",
            "model.sa_npoints=(32,16,8)",
            "model.sa_nsamples=(8,8,4)",
            "train.batch_size=8",
            "train.num_epochs=1",
            "train.eval_every=1",
            f"train.ckpt_dir={tmp_path / 'ckpt'}",
        ],
    )
    run_classifier(cfg)
    evals = [
        json.loads(line)
        for line in capsys.readouterr().out.splitlines()
        if '"eval/val_acc"' in line
    ]
    assert len(evals) == 1
    # 5 val items scored exactly once despite the padded tail batch
    assert evals[0]["eval/n_scenes"] == 5
    assert 0.0 <= evals[0]["eval/val_acc"] <= 1.0
