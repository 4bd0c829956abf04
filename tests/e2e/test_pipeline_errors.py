"""Batcher failure propagation + KITTI FPS-cache invalidation."""

import numpy as np
import pytest

from tpu3dsad.data.pipeline import Batcher


def test_batcher_propagates_loader_exception():
    def bad_make(rng):
        raise FileNotFoundError("scene gone")

    b = Batcher(bad_make, prefetch=1)
    with pytest.raises(FileNotFoundError, match="scene gone"):
        next(iter(b))
    b.close()


def test_batcher_finite_stream():
    b = Batcher(lambda rng: {"x": rng.random(3)}, num_batches=3)
    out = list(b)
    assert len(out) == 3
    b.close()


def test_kitti_fps_cache_invalidation(tmp_path, rng):
    from tpu3dsad.config import Config, apply_overrides
    from tpu3dsad.data.registry import get_dataset

    d = tmp_path / "train"
    d.mkdir(parents=True)

    def write_scene(n):
        pc = np.stack(
            [rng.uniform(1, 60, n), rng.uniform(-30, 30, n),
             rng.uniform(-2, 0.5, n), rng.random(n)], 1
        ).astype(np.float32)
        np.save(d / "000000_pc.npy", pc)
        np.save(
            d / "000000_bbox.npy",
            np.array([[5, 0, 0, 3, 1.5, 1.5, 0.2, 0]], np.float32),
        )

    write_scene(900)
    cfg = apply_overrides(
        Config(),
        ["data.name=kitti", f"data.root={tmp_path}", "data.num_points=256",
         "data.max_boxes=4", "data.augment=false"],
    )
    ds = get_dataset(cfg)
    b1 = ds.train_batch(rng, 1)
    caches = list(d.glob("*_fpscache_*.npy"))
    assert len(caches) == 1
    stale = np.load(caches[0]).copy()

    # re-extract the scene with a different size: stale cache must not apply
    write_scene(700)
    ds2 = get_dataset(cfg)
    b2 = ds2.train_batch(rng, 1)  # would IndexError with stale indices
    fresh = np.load(caches[0])
    assert fresh[0] != stale[0]  # cache was rewritten for the new cloud
    assert b2["points"].shape == b1["points"].shape


def test_batcher_error_with_full_queue_does_not_hang_close():
    """Regression: a loader failure while the queue is full used to block
    forever in q.put(e); close() must stop the worker and the error must
    still surface if the consumer drains."""
    import threading
    import time

    from tpu3dsad.data.pipeline import Batcher

    calls = {"n": 0}

    def make(rng):
        calls["n"] += 1
        if calls["n"] <= 2:
            return {"x": calls["n"]}  # fills the prefetch=1 queue (+1 in put)
        raise RuntimeError("loader exploded")

    b = Batcher(make, prefetch=1)
    time.sleep(0.3)  # worker fills the queue then hits the exception path
    b.close()
    b._thread.join(timeout=5.0)
    assert not b._thread.is_alive(), "worker thread leaked after close()"


def test_batcher_error_delivered_to_consumer():
    from tpu3dsad.data.pipeline import Batcher

    def make(rng):
        raise RuntimeError("bad scene")

    b = Batcher(make, prefetch=2)
    try:
        import pytest

        with pytest.raises(RuntimeError, match="bad scene"):
            next(iter(b))
    finally:
        b.close()
