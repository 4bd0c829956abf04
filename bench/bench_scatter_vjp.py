"""Scatter-add vs one-hot-matmul (MXU) for the group/gather VJPs (real TPU).

bench_train_decompose.py attributed ~28ms of the 66ms config-3 train step
to the backward pass, and sa1_grad showed a single group() VJP scatter-add
costs ~45ms in isolation at [B=8, N=40960] with 1M update rows. XLA
scatter on TPU serializes per update row; the MXU alternative computes
  grad_src[b,n,c] = sum_u onehot(idx[b,u]==n) * g[b,u,c]
as a (tiled) matmul. Summation order differs from XLA's scatter, but the
lineage CUDA bwd uses atomicAdd (nondeterministic order), so neither is
more "exact".

Shapes: the real VJPs the train step replays.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

# per-rep time = true device time + dispatch/R; run with R=64 to expose
# how much of the small-shape "floor" is the ~30ms tunnel dispatch
R = int(os.environ.get("TPU3DSAD_BENCH_R", "8"))


def timed(fn, reps=5):
    np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@partial(jax.jit, static_argnames=("N",))
def run_scatter(idx, g, N):
    """XLA scatter-add: [B,U] idx, [B,U,C] g -> [B,N,C]."""
    B, U, C = g.shape

    def body(acc, i):
        gi = g + i.astype(jnp.float32) * 1e-9
        out = jnp.zeros((B, N, C), jnp.float32)
        out = out.at[
            jnp.arange(B)[:, None], idx
        ].add(gi)
        return acc + jnp.sum(out[:, 0]), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
    return acc


@partial(jax.jit, static_argnames=("N", "nt", "mode"))
def run_matmul(idx, g, N, nt=2048, mode="bf16"):
    """One-hot matmul scatter, tiled over N so the onehot never exceeds
    [B, U, nt]. mode: bf16 | fp32 (default precision) | high (bf16_3x)."""
    B, U, C = g.shape
    dt = jnp.bfloat16 if mode == "bf16" else jnp.float32
    prec = jax.lax.Precision.HIGH if mode == "high" else None

    def body(acc, i):
        gi = (g + i.astype(jnp.float32) * 1e-9).astype(dt)
        outs = []
        for t0 in range(0, N, nt):
            oh = (idx[:, :, None] == jnp.arange(t0, t0 + nt)[None, None, :])
            outs.append(
                jnp.einsum(
                    "bun,buc->bnc", oh.astype(dt), gi,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            )
        out = jnp.concatenate(outs, axis=1)
        return acc + jnp.sum(out[:, 0]), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
    return acc


@partial(jax.jit, static_argnames=("N",))
def run_pallas(idx, g, N):
    """Pallas one-hot-tiles-in-VMEM kernel (ops/pallas/scatter.py)."""
    from tpu3dsad.ops.pallas.scatter import scatter_rows

    def body(acc, i):
        gi = g + i.astype(jnp.float32) * 1e-9
        out = scatter_rows(gi, idx, N)
        return acc + jnp.sum(out[:, 0]), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
    return acc


def main():
    rng = np.random.default_rng(0)
    cases = [
        # (name, B, U, N, C) — U = M*K update rows
        ("sa1-color (2048*64 -> 40960, C=6)", 8, 2048 * 64, 40960, 6),
        ("sa2 (1024*32 -> 2048, C=131)", 8, 1024 * 32, 2048, 131),
        ("sa3 (512*16 -> 1024, C=259)", 8, 512 * 16, 1024, 259),
        ("fp/gather (2048 -> 40960, C=3)", 8, 2048, 40960, 3),
    ]
    for name, B, U, N, C in cases:
        idx = jnp.asarray(rng.integers(0, N, (B, U)), jnp.int32)
        g = jnp.asarray(rng.normal(size=(B, U, C)).astype(np.float32))
        ts = timed(lambda: run_scatter(idx, g, N)) / R * 1e3
        tm = timed(lambda: run_matmul(idx, g, N)) / R * 1e3
        tm32 = timed(lambda: run_matmul(idx, g, N, mode="fp32")) / R * 1e3
        th = timed(lambda: run_matmul(idx, g, N, mode="high")) / R * 1e3
        tp = timed(lambda: run_pallas(idx, g, N)) / R * 1e3
        print(
            f"{name:38s} scatter {ts:7.2f} ms | mm-bf16 {tm:6.2f} ms "
            f"({ts / tm:4.1f}x) | mm-fp32 {tm32:6.2f} ms | mm-high {th:6.2f} ms"
            f" | pallas {tp:6.2f} ms ({th / tp:4.1f}x vs high)",
            flush=True,
        )


if __name__ == "__main__":
    main()
