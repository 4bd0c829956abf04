"""Separable shape-family classifier benchmark (VERDICT r3 #6):
the generator must emit valid raw-ModelNet OFF trees that round-trip
through preproc_modelnet → the modelnet loader, with families that are
geometrically distinct (a nearest-centroid-on-shape-statistics baseline
already separates them far above chance — if THAT fails, no classifier
claim is falsifiable)."""

import numpy as np
import pytest

from tpu3dsad.data.preproc_modelnet import export_all, read_off, sample_mesh
from tpu3dsad.data.synthetic_shapes import (
    SHAPE_CLASSES,
    generate,
    make_shape,
)


def test_meshes_are_valid_and_sampleable(rng):
    for fam in SHAPE_CLASSES:
        v, f = make_shape(fam, np.random.default_rng(3))
        assert len(v) >= 4 and len(f) >= 4
        assert f.min() >= 0 and f.max() < len(v)
        pts = sample_mesh(v, f, 512, np.random.default_rng(0))
        assert pts.shape == (512, 3)
        assert np.isfinite(pts).all()
        # non-degenerate: real 3D extent
        assert (pts.max(0) - pts.min(0)).min() > 0.01, fam


def test_off_roundtrip(tmp_path):
    from tpu3dsad.data.synthetic_shapes import write_off

    v, f = make_shape("table", np.random.default_rng(1))
    p = str(tmp_path / "t.off")
    write_off(p, v, f)
    v2, f2 = read_off(p)
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_generate_feeds_preproc_and_loader(tmp_path):
    raw = str(tmp_path / "raw")
    counts = generate(raw, per_class=3, test_per_class=2, seed=0)
    assert counts == {"train": 30, "test": 20}

    npy = str(tmp_path / "npy")
    written = export_all(raw, npy, num_points=1024)
    assert written["train"] == 30 and written["val"] == 20
    assert written["layout"] == "off"

    from tpu3dsad.config import Config, apply_overrides
    from tpu3dsad.data.modelnet import ModelNetClassificationDataset

    cfg = apply_overrides(
        Config(),
        ["data.name=modelnet", f"data.root={npy}", "data.num_points=256",
         "data.augment=false"],
    )
    ds = ModelNetClassificationDataset(cfg)
    assert ds.num_classes == 10
    b = ds.train_batch(np.random.default_rng(0), 4)
    assert b["points"].shape == (4, 256, 3)
    # loader normalizes to the unit sphere
    assert np.linalg.norm(b["points"], axis=-1).max() <= 1.0 + 1e-5


def test_generation_is_seeded(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate(a, per_class=2, test_per_class=1, seed=7)
    generate(b, per_class=2, test_per_class=1, seed=7)
    pa = a + "/torus/train/torus_0001.off"
    pb = b + "/torus/train/torus_0001.off"
    assert open(pa).read() == open(pb).read()


def test_families_are_separable_by_simple_statistics():
    """Falsifiability floor: a nearest-centroid classifier on crude shape
    statistics (normalized-cloud moments + radial histogram) must already
    beat 60% across 10 classes (chance = 10%). The trained SSG/MSG
    network target is ≥90% (docs/experiments row, trained on TPU)."""

    def feats(pts):
        pts = pts - pts.mean(0)
        pts = pts / max(np.linalg.norm(pts, axis=1).max(), 1e-9)
        r = np.linalg.norm(pts, axis=1)
        hist = np.histogram(r, bins=12, range=(0, 1))[0] / len(pts)
        cov = np.cov(pts.T)
        eig = np.sort(np.linalg.eigvalsh(cov))
        ext = np.sort(pts.max(0) - pts.min(0))
        zhist = np.histogram(pts[:, 2], bins=8, range=(-1, 1))[0] / len(pts)
        return np.concatenate(
            [hist, eig, eig[:2] / (eig[2] + 1e-9), ext, zhist,
             [np.abs(pts[:, 2]).mean()]]
        )

    rngs = np.random.default_rng(11)
    train_f, train_y, test_f, test_y = [], [], [], []
    for ci, fam in enumerate(SHAPE_CLASSES):
        for i in range(15):
            v, f = make_shape(fam, np.random.default_rng(100 + ci * 50 + i))
            pts = sample_mesh(v, f, 1024, rngs)
            (train_f if i < 10 else test_f).append(feats(pts))
            (train_y if i < 10 else test_y).append(ci)
    train_f, test_f = np.asarray(train_f), np.asarray(test_f)
    train_y, test_y = np.asarray(train_y), np.asarray(test_y)
    cents = np.stack([train_f[train_y == c].mean(0) for c in range(10)])
    sd = train_f.std(0) + 1e-6
    pred = np.argmin(
        np.linalg.norm((test_f[:, None] - cents[None]) / sd, axis=-1), axis=1
    )
    acc = float((pred == test_y).mean())
    # measured 0.96 at authoring time; 0.8 leaves slack for sampler drift
    assert acc >= 0.8, acc
