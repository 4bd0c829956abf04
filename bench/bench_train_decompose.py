"""Train-step stage decomposition at config-#3 scale (real TPU).

The k-sweep (bench_train_throughput.py) showed training is device-bound at
~58-67ms/step (b=8) with step time nearly independent of N. This harness
attributes that floor: each stage runs R times inside ONE dispatched
lax.scan (inputs perturbed per rep so nothing hoists), so the ~30ms tunnel
floor is paid once per measurement, not per rep.

Stages:
  step     full production train step (fwd + bwd + adam)
  fwdloss  forward + detection loss (no grad)
  fwd      forward only (train=False)
  fps_all  the model's five FPS calls at their real shapes
           (N->2048->1024->512->256 chain + votes 1024->256)
  sa1_grp  SA1 fast grouping (ball query + gather-group) at N x 2048, K=64

Run: python bench/bench_train_decompose.py [N] [B]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad import ops
from tpu3dsad import train_lib
from tpu3dsad.config import Config, apply_overrides

print("devices:", jax.devices())

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40960
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
# Raise R (e.g. 64) to shrink the residual dispatch share per rep:
# per-rep time = true device time + dispatch/R, so comparing R=8 vs R=64
# also MEASURES the dispatch floor instead of assuming it.
R = int(os.environ.get("TPU3DSAD_BENCH_R", "8"))

cfg = apply_overrides(Config(), [
    "model.name=detector", f"data.num_points={N}", "data.max_boxes=64",
    "model.num_classes=18", f"train.batch_size={B}", "ops_impl=pallas",
])
train_lib.apply_runtime_config(cfg)

from tpu3dsad.data.device_pipeline import synthetic_detection_batch
from tpu3dsad.train_detector import build_detector

model = build_detector(cfg)
key = jax.random.key(0)
batch = jax.jit(partial(
    synthetic_detection_batch, batch_size=B, num_points=N,
    num_classes=18, max_boxes=64, vote_candidates=cfg.data.vote_candidates,
))(key)

tx = train_lib.make_optimizer(cfg.train, 100)
state = train_lib.create_state(
    model,
    lambda k: model.init(k, batch["points"], None,
                         mask=batch["point_mask"], train=False),
    tx, jax.random.key(0),
)

step_body, _ = train_lib._make_detector_step_body(model, cfg)
mean_sizes = model._mean_sizes()
bank = tuple(cfg.model.cluster_radius_bank)


def perturb(b, i):
    return dict(b, points=b["points"] + i.astype(jnp.float32) * 1e-7)


@jax.jit
def run_step(state, batch, key):
    def body(carry, i):
        st = carry
        st, metrics = step_body(st, perturb(batch, i),
                                jax.random.fold_in(key, i), 0.9)
        return st, metrics["loss"]

    st, losses = jax.lax.scan(body, state, jnp.arange(R))
    return jnp.sum(losses)


from tpu3dsad.losses import detection_loss


@jax.jit
def run_fwdloss(state, batch, key):
    def body(acc, i):
        b = perturb(batch, i)
        end_points, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            b["points"], None, mask=b["point_mask"], train=True,
            bn_momentum=0.9, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(key, i)},
        )
        loss, _ = detection_loss(
            end_points, b, mean_sizes, cfg.model.num_heading_bins, bank)
        return acc + loss, None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
    return acc


@jax.jit
def run_fwd(state, batch):
    def body(acc, i):
        b = perturb(batch, i)
        end_points = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            b["points"], None, mask=b["point_mask"], train=False,
        )
        return acc + jnp.sum(end_points["objectness_scores"]), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
    return acc


@jax.jit
def run_fps_all(batch):
    mask = batch["point_mask"]

    def body(acc, i):
        pts = batch["points"] + i.astype(jnp.float32) * 1e-7
        acc2 = jnp.int32(0)
        idx = ops.furthest_point_sample(pts, 2048, mask=mask)
        p1 = ops.gather(pts, idx)
        idx = ops.furthest_point_sample(p1, 1024)
        p2 = ops.gather(p1, idx)
        idx = ops.furthest_point_sample(p2, 512)
        p3 = ops.gather(p2, idx)
        idx = ops.furthest_point_sample(p3, 256)
        acc2 = acc2 + jnp.sum(idx)
        # votes FPS (proposal stage): 1024 -> 256
        votes = p2 + 0.01
        idx = ops.furthest_point_sample(votes, 256)
        acc2 = acc2 + jnp.sum(idx)
        return acc + acc2, None

    acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(R))
    return acc


@jax.jit
def run_sa1_grp(batch):
    mask = batch["point_mask"]

    def body(acc, i):
        pts = batch["points"] + i.astype(jnp.float32) * 1e-7
        centers = pts[:, :2048]
        idx, cnt = ops.ball_query(pts, centers, radius=0.2, nsample=64,
                                  mask=mask)
        grouped = ops.group(pts, idx)
        return acc + jnp.sum(grouped[:, 0, 0]) + jnp.sum(cnt), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
    return acc


@jax.jit
def run_sa1_full(batch):
    """SA1 in isolation: fused query_and_group + 3-layer MLP + masked max
    (the real SA1 shapes: N x 2048, K=64, MLP 64-64-128, bf16 matmuls)."""
    mask = batch["point_mask"]
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    w1 = jax.random.normal(k1, (4, 64), jnp.float32) * 0.1
    w2 = jax.random.normal(k2, (64, 64), jnp.float32) * 0.1
    w3 = jax.random.normal(k3, (64, 128), jnp.float32) * 0.1

    def sa1(pts, feats, ws):
        centers = pts[:, :2048]
        grouped, _, gmask = ops.query_and_group(
            pts, centers, radius=0.2, nsample=64,
            features=feats, mask=mask)
        h = grouped.astype(jnp.bfloat16)
        for w in ws:
            h = jax.nn.relu(h @ w.astype(jnp.bfloat16))
        h = jnp.where(gmask[..., None], h.astype(jnp.float32), -jnp.inf)
        return jnp.max(h, axis=2)

    def body(acc, i):
        pts = batch["points"] + i.astype(jnp.float32) * 1e-7
        feats = jnp.ones(pts.shape[:2] + (1,), jnp.float32)
        out = sa1(pts, feats, (w1, w2, w3))
        return acc + jnp.sum(out[:, 0, 0]), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
    return acc


@jax.jit
def run_sa1_grad(batch):
    """Same SA1, fwd+bwd w.r.t. weights AND input features (the scatter-add
    VJP of group at [B,N,C] — what SA2-4/FP replay at smaller N)."""
    mask = batch["point_mask"]
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    w1 = jax.random.normal(k1, (4, 64), jnp.float32) * 0.1
    w2 = jax.random.normal(k2, (64, 64), jnp.float32) * 0.1
    w3 = jax.random.normal(k3, (64, 128), jnp.float32) * 0.1

    def sa1(pts, feats, ws):
        centers = pts[:, :2048]
        grouped, _, gmask = ops.query_and_group(
            pts, centers, radius=0.2, nsample=64,
            features=feats, mask=mask)
        h = grouped.astype(jnp.bfloat16)
        for w in ws:
            h = jax.nn.relu(h @ w.astype(jnp.bfloat16))
        h = jnp.where(gmask[..., None], h.astype(jnp.float32), -jnp.inf)
        return jnp.sum(jnp.max(h, axis=2))

    def body(acc, i):
        pts = batch["points"] + i.astype(jnp.float32) * 1e-7
        feats = jnp.ones(pts.shape[:2] + (1,), jnp.float32)
        val, grads = jax.value_and_grad(
            lambda f, ws: sa1(pts, f, ws), argnums=(0, 1)
        )(feats, (w1, w2, w3))
        return acc + val + jnp.sum(grads[0][:, 0]), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
    return acc


@jax.jit
def run_loss_only(state, batch):
    """detection_loss alone, replayed on ONE set of end_points (computed
    in-program, outside the scan) with the batch perturbed per rep — the
    fwdloss-minus-fwd residual also folds in train=True BN bookkeeping, so
    this is the honest loss-stage figure."""
    end_points = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["points"], None, mask=batch["point_mask"], train=False,
    )

    def body(acc, i):
        b = dict(batch,
                 gt_centers=batch["gt_centers"] + i.astype(jnp.float32) * 1e-7)
        loss, _ = detection_loss(
            end_points, b, mean_sizes, cfg.model.num_heading_bins, bank)
        return acc + loss, None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
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
    print(f"config: N={N} B={B} R={R} (per-rep ms below; dispatch floor "
          f"amortized over {R} reps)")
    rows = [
        ("step", lambda: run_step(state, batch, key)),
        ("fwdloss", lambda: run_fwdloss(state, batch, key)),
        ("fwd", lambda: run_fwd(state, batch)),
        ("fps_all", lambda: run_fps_all(batch)),
        ("sa1_grp", lambda: run_sa1_grp(batch)),
        ("sa1_full", lambda: run_sa1_full(batch)),
        ("sa1_grad", lambda: run_sa1_grad(batch)),
        ("loss", lambda: run_loss_only(state, batch)),
    ]
    out = {}
    for name, fn in rows:
        t = timed(fn)
        out[name] = t / R * 1e3
        print(f"{name:8s}  {t / R * 1e3:7.2f} ms/rep", flush=True)
    print(f"\nbwd+adam (step - fwdloss): {out['step'] - out['fwdloss']:.2f} ms")
    print(f"loss-only (fwdloss - fwd):  {out['fwdloss'] - out['fwd']:.2f} ms")
    print(f"fps share of fwd:           {out['fps_all'] / out['fwd'] * 100:.0f}%")
    print(f"sa1 grouping share of fwd:  {out['sa1_grp'] / out['fwd'] * 100:.0f}%")


if __name__ == "__main__":
    main()
