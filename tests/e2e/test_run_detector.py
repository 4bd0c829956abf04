"""run_detector CLI loop end-to-end on tiny synthetic config (covers the
Batcher prefetch, checkpointing, epoch eval and JSONL logging)."""

import json

import pytest

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.train_detector import run_detector


@pytest.mark.slow
def test_run_detector_one_epoch(tmp_path, capsys):
    cfg = apply_overrides(
        Config(),
        [
            "model.name=detector",
            "data.name=synthetic",
            "data.num_points=512",
            "data.max_boxes=8",
            "model.num_classes=4",
            "model.sa_npoints=(128,64,32,16)",
            "model.sa_nsamples=(8,8,4,4)",
            "model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
            "model.fp_channels=((32,32),(32,32))",
            "model.seed_feat_dim=32",
            "model.num_proposals=16",
            "model.cluster_nsample=4",
            "train.batch_size=8",
            "train.num_epochs=1",
            "train.eval_every=1",
            "train.log_every=4",
            f"train.ckpt_dir={tmp_path}/ckpt",
        ],
    )
    run_detector(cfg)
    out = capsys.readouterr().out.strip().splitlines()
    records = [json.loads(l) for l in out if l.startswith("{")]
    assert any("scenes_per_sec" in r for r in records)
    assert any("eval/mAP@0.25" in r for r in records)
    assert any("per_class@0.25" in r for r in records)
    assert (tmp_path / "ckpt").exists()


@pytest.mark.slow
def test_run_detector_with_color(tmp_path, capsys):
    """use_color=true through the REAL entrypoint: init must see the same
    feature channels the train step applies with (regression: the example
    init once omitted point_features → ScopeParamShapeError)."""
    from tests.e2e.test_datasets import _write_scannet

    _write_scannet(tmp_path / "data", scans=8, n=300)
    cfg = apply_overrides(
        Config(),
        [
            "model.name=detector",
            "data.name=scannet",
            f"data.root={tmp_path}/data",
            "data.num_points=256",
            "data.max_boxes=8",
            "data.use_color=true",
            "model.sa_npoints=(64,32,16,8)",
            "model.sa_nsamples=(8,8,4,4)",
            "model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
            "model.fp_channels=((32,32),(32,32))",
            "model.seed_feat_dim=32",
            "model.num_proposals=16",
            "model.cluster_nsample=4",
            "train.batch_size=8",
            "train.num_epochs=1",
            "train.eval_every=5",
            "train.log_every=1",
            f"train.ckpt_dir={tmp_path}/ckpt",
        ],
    )
    run_detector(cfg)
    out = capsys.readouterr().out.strip().splitlines()
    records = [json.loads(l) for l in out if l.startswith("{")]
    assert any("train/loss" in r for r in records)


@pytest.mark.slow
def test_profile_dir_writes_trace(tmp_path):
    """train.profile_dir captures the first executed epoch and closes the
    trace (SURVEY §5 tracing; regression: a resumed run with zero remaining
    epochs left the trace open)."""
    cfg = apply_overrides(
        Config(),
        [
            "model.name=detector", "data.name=synthetic",
            "data.num_points=512", "data.max_boxes=8", "model.num_classes=4",
            "model.sa_npoints=(128,64,32,16)", "model.sa_nsamples=(8,8,4,4)",
            "model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
            "model.fp_channels=((32,32),(32,32))", "model.seed_feat_dim=32",
            "model.num_proposals=16", "model.cluster_nsample=4",
            "train.batch_size=8", "train.num_epochs=1",
            "train.eval_every=100", f"train.ckpt_dir={tmp_path}/ckpt",
            f"train.profile_dir={tmp_path}/profile",
        ],
    )
    from tpu3dsad.train_detector import run_detector

    run_detector(cfg)
    import glob

    assert glob.glob(str(tmp_path / "profile" / "**" / "*"), recursive=True)
