"""FPS kernel per-pick cost breakdown (real TPU).

Where does the ~9-15us/pick go? Variants of the production kernel body with
parts removed, timed at two M values so the marginal per-pick cost
(t(M2)-t(M1))/(M2-M1) cancels the per-call dispatch floor:

  full      production body (extract coords, d2+min, max, tie-min, store)
  unroll4   same body, fori_loop(..., unroll=4) — loop-turnaround share
  noext     coords from the loop counter (no onehot extraction sweeps)
  notie     tie-min reduction replaced by an elementwise index derivation
  nomax     max AND tie reductions removed (chain = extract + d2/min only)
  elem      elementwise d2+min+store only (no reductions, no extraction)
  empty     loop body only writes the counter (turnaround + store floor)

Each variant keeps a true loop-carried dependence so the compiler cannot
hoist or collapse iterations.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())


def _body_parts(x, y, z, lane, n, variant):
    """Returns (pick_fn, step_fn) closing over the planes."""

    def extract(last):
        onehot = (lane == last).astype(jnp.float32)
        lx = jnp.sum(x * onehot, axis=1, keepdims=True)
        ly = jnp.sum(y * onehot, axis=1, keepdims=True)
        lz = jnp.sum(z * onehot, axis=1, keepdims=True)
        return lx, ly, lz

    def fake_coords(i, last):
        # depends on i and (cheaply) on last so nothing hoists
        f = (i.astype(jnp.float32) + last.astype(jnp.float32) * 1e-9) * 1e-4
        return f, f + 1e-4, f + 2e-4

    return extract, fake_coords


def make_kernel(variant, npoint, n):
    def kernel(xyz_ref, dist0_ref, idx_ref, dist_ref):
        x = xyz_ref[0, :, :]
        y = xyz_ref[1, :, :]
        z = xyz_ref[2, :, :]
        bp = x.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        extract, fake_coords = _body_parts(x, y, z, lane, n, variant)

        dist_ref[:, :] = dist0_ref[:, :]
        idx_ref[0, 0, :] = jnp.zeros((bp,), jnp.int32)

        def body(i, last):
            if variant == "empty":
                nxt = (last + 1) % jnp.int32(n)
                idx_ref[0, pl.ds(i, 1), :] = nxt.reshape(1, bp)
                return nxt
            if variant in ("noext", "notie", "nomax", "elem"):
                lx, ly, lz = fake_coords(i, last)
                lx = jnp.broadcast_to(lx, (bp, 1))
                ly = jnp.broadcast_to(ly, (bp, 1))
                lz = jnp.broadcast_to(lz, (bp, 1))
            else:
                lx, ly, lz = extract(last)
            d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
            dist = jnp.minimum(dist_ref[:, :], d2)
            dist_ref[:, :] = dist
            if variant in ("nomax", "elem"):
                # keep a data dependence on dist without a cross-lane reduce:
                # read one lane back (dynamic-slice col 0)
                best = dist[:, :1]
                nxt = (best.astype(jnp.int32) + i) % jnp.int32(n)
            else:
                best = jnp.max(dist, axis=1, keepdims=True)
                if variant == "notie":
                    nxt = (best.astype(jnp.int32) + i) % jnp.int32(n)
                else:
                    nxt = jnp.min(
                        jnp.where(dist == best, lane, jnp.int32(n)),
                        axis=1,
                        keepdims=True,
                    )
            idx_ref[0, pl.ds(i, 1), :] = nxt.reshape(1, bp).astype(jnp.int32)
            return nxt

        if variant == "unroll4":
            # manual 4x unroll (Mosaic fori_loop supports only unroll=1/full)
            def body4(j, last):
                i0 = 1 + j * 4
                for off in range(4):
                    last = body(i0 + off, last)
                return last

            jax.lax.fori_loop(
                0, (npoint - 1) // 4, body4, jnp.zeros((bp, 1), jnp.int32)
            )
        else:
            jax.lax.fori_loop(1, npoint, body, jnp.zeros((bp, 1), jnp.int32))

    return kernel


@partial(jax.jit, static_argnames=("variant", "npoint", "reps"))
def run(xyz_t, dist0, variant, npoint, reps=5):
    """reps kernel invocations inside ONE dispatched program (inputs
    perturbed per rep so nothing CSEs) — amortizes the ~30ms tunnel floor."""
    _, Bp, Np = xyz_t.shape
    kernel = make_kernel(variant, npoint, Np)

    def call(xt):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(
                    (3, Bp, Np), lambda g: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((Bp, Np), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, npoint, Bp), lambda g: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((1, npoint, Bp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((Bp, Np), jnp.float32)],
        )(xt, dist0)

    def body(r, acc):
        return acc + jnp.sum(call(xyz_t + r.astype(jnp.float32) * 1e-7))

    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def timed(fn, reps=7):
    fn()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    M1, M2, R = 512, 4096, 5
    for Bp, Np in [(8, 20480), (16, 20480)]:
        xyz = rng.uniform(-4, 4, (3, Bp, Np)).astype(np.float32)
        xyz_t = jnp.asarray(xyz)
        dist0 = jnp.full((Bp, Np), np.inf, np.float32)
        print(
            f"\n=== Bp={Bp} Np={Np} (marginal us/pick, {R} in-program reps, "
            f"M {M1}->{M2}) ==="
        )
        for variant in ["full", "unroll4", "noext", "notie", "nomax", "elem", "empty"]:
            t1 = timed(lambda: run(xyz_t, dist0, variant, M1, R))
            t2 = timed(lambda: run(xyz_t, dist0, variant, M2, R))
            per = (t2 - t1) / (R * (M2 - M1)) * 1e6
            print(
                f"{variant:8s}  t({M1})={t1*1e3:7.2f}ms  t({M2})={t2*1e3:7.2f}ms"
                f"  marginal={per:6.2f} us/pick"
            )


if __name__ == "__main__":
    main()
