"""Fast-grouping selector comparison on the real TPU: approx_max_k vs the
Z-order-sorted exact kernel vs the unsorted exact kernel.

The exact kernel's AABB tile skip (ops/pallas/ball_query.py::_tile_skip)
only pays when inputs are spatially sorted — unsorted clouds put points
near every center into every tile. This harness measures all three at the
model's grouping shapes on clustered (surface-like) clouds, R reps inside
one dispatched scan so the ~30ms tunnel floor amortizes (raise
TPU3DSAD_BENCH_R to shrink the residual dispatch share per rep).

Run: python bench/bench_sorted_grouping.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad.ops.pallas.ball_query import (
    ball_query as pallas_bq,
    sorted_ball_query,
)
from tpu3dsad.ops.xla.ball_query import ball_query as xla_bq

print("devices:", jax.devices())

R = int(os.environ.get("TPU3DSAD_BENCH_R", "8"))


def clustered(rng, B, N, num_blobs=24, sigma=0.25, spread=3.0):
    """Surface-like clustered scene (uniform clouds understate the skip)."""
    blobs = rng.uniform(-spread, spread, (B, num_blobs, 3)).astype(np.float32)
    pick = rng.integers(0, num_blobs, (B, N))
    return (blobs[np.arange(B)[:, None], pick]
            + rng.normal(0, sigma, (B, N, 3)).astype(np.float32))


@partial(jax.jit, static_argnames=("fn_name", "radius", "k"))
def run(xyz, centers, fn_name, radius, k):
    fn = {
        "approx": partial(xla_bq, exact=False),
        "sorted": sorted_ball_query,
        "exact": pallas_bq,
    }[fn_name]

    def body(acc, i):
        pts = xyz + i.astype(jnp.float32) * 1e-7
        idx, cnt = fn(pts, centers, radius, k)
        return acc + jnp.sum(idx[:, 0, 0]) + jnp.sum(cnt[:, 0]), None

    acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(R))
    return acc


def timed(fn, reps=5):
    np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    cases = [
        # (name, B, N, M, K, r) — the detector's grouping shapes
        ("SA1 infer (b=32, 20480->2048, K=64, r=0.2)", 32, 20480, 2048, 64, 0.2),
        ("SA1 train (b=8, 40960->2048, K=64, r=0.2)", 8, 40960, 2048, 64, 0.2),
        ("SA2 (b=8, 2048->1024, K=32, r=0.4)", 8, 2048, 1024, 32, 0.4),
        ("dense r=0.8 (b=8, 20480->2048, K=64)", 8, 20480, 2048, 64, 0.8),
    ]
    for name, B, N, M, K, r in cases:
        xyz = jnp.asarray(clustered(rng, B, N))
        centers = xyz[:, :M]
        out = {}
        for mode in ("approx", "sorted", "exact"):
            out[mode] = timed(lambda m=mode: run(xyz, centers, m, r, K)) / R * 1e3
        print(
            f"{name:46s} approx {out['approx']:7.2f} ms | "
            f"sorted {out['sorted']:7.2f} ms "
            f"({out['approx'] / out['sorted']:4.2f}x) | "
            f"exact-unsorted {out['exact']:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
