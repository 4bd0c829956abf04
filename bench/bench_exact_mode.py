"""Exact-parity-mode cost at training scale: full detector train step with
exact scan-order grouping (Pallas kernel) + fp32 matmuls vs the fast
production mode (approx grouping + bf16). Run on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad import ops, train_lib
from tpu3dsad.config import Config, ModelConfig, TrainConfig
from tpu3dsad.data.synthetic import detection_batch
from tpu3dsad.models.detector import SizeAdaptiveDetector

B, N, NC = 8, 20480, 10
rng = np.random.default_rng(0)
b = detection_batch(rng, B, N, NC, max_boxes=64)
bj = {k: jnp.asarray(v) for k, v in b.items()}


def step_time(fast: bool, bf16: bool, label: str):
    ops.set_default_impl("pallas")
    ops.set_fast_grouping(fast)
    if not bf16:
        jax.config.update("jax_default_matmul_precision", "highest")
    else:
        jax.config.update("jax_default_matmul_precision", None)
    cfg = Config(model=ModelConfig(num_classes=NC),
                 train=TrainConfig(batch_size=B, bf16_matmul=bf16))
    model = SizeAdaptiveDetector(cfg.model)
    v = jax.jit(lambda k: model.init(
        k, bj["points"], mask=bj["point_mask"], train=False))(jax.random.key(0))
    tx = train_lib.make_optimizer(cfg.train, 100)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=v["params"],
        batch_stats=v["batch_stats"], tx=tx)
    train_step, _ = train_lib.make_detector_steps(model, cfg)
    state, m = train_step(state, bj, jax.random.key(1), 0.9)
    np.asarray(m["loss"])
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        state, m = train_step(state, bj, jax.random.key(1), 0.9)
        np.asarray(m["loss"])
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{label:44s} {t * 1e3:7.1f} ms/step  {B / t:6.1f} scenes/s",
          flush=True)
    return t


t_fast = step_time(True, True, "production (approx grouping, bf16 matmul)")
t_exact = step_time(False, True, "exact grouping (Pallas kernel), bf16")
t_parity = step_time(False, False, "full parity (exact grouping, fp32 matmul)")
print(f"exact-grouping premium: {t_exact / t_fast:.2f}x  "
      f"full-parity premium: {t_parity / t_fast:.2f}x", flush=True)
