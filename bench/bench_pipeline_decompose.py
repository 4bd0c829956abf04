"""Decompose the b=32 full-pipeline headline into stage costs on the real
TPU: backbone / +voting+proposal / +decode+NMS, plus the dominant ops
standalone (Pallas FPS, fast grouping). Guides where headline time goes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad import ops
from tpu3dsad.config import EvalConfig, ModelConfig
from tpu3dsad.eval.parse import parse_predictions
from tpu3dsad.models.detector import SizeAdaptiveDetector

ops.set_fast_grouping(True)
ops.set_default_impl("pallas")

B, N = 32, 20480
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(-3, 3, (B, N, 3)).astype(np.float32))
mask = jnp.ones((B, N), bool)

cfg = ModelConfig(num_classes=10)
model = SizeAdaptiveDetector(cfg)
variables = jax.jit(lambda k: model.init(k, pts, mask=mask, train=False))(
    jax.random.key(0)
)
eval_cfg = EvalConfig()
mean_sizes = model._mean_sizes()


def timeit(fn, *args, reps=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e3


# stage variants (each its own jitted program; deltas = stage costs).
# Outputs reduce to a SCALAR on device: fetching full tensors through the
# axon tunnel (~50MB/s) would swamp compute (seed_features alone is 33MB).
full = jax.jit(lambda p, m: jnp.sum(parse_predictions(
    model.apply(variables, p, mask=m, train=False),
    mean_sizes, cfg.num_heading_bins, eval_cfg)["keep"]))
fwd_only = jax.jit(lambda p, m: jnp.sum(model.apply(
    variables, p, mask=m, train=False)["objectness_scores"]))

# standalone backbone (fresh params — same cost profile as the detector's)
from tpu3dsad.models.backbone import PointNet2Backbone

bb_model = PointNet2Backbone(cfg)
bb_vars = jax.jit(
    lambda k: bb_model.init(k, pts, None, mask=mask, train=False)
)(jax.random.key(1))
bb_j = jax.jit(lambda p, m: jnp.sum(bb_model.apply(
    bb_vars, p, None, mask=m, train=False)["seed_features"]))

# dominant standalone ops at SA1 scale
fps_j = jax.jit(lambda p, m: jnp.sum(ops.furthest_point_sample(p, 2048, mask=m)))
# under jit: the eager kernel call at b=32 hits the documented operand-
# layout VMEM quirk (docs/kernel_notes.md)
centers = jax.jit(
    lambda p, m: ops.gather(p, ops.furthest_point_sample(p, 2048, mask=m))
)(pts, mask)
grp_j = jax.jit(lambda p, c, m: jnp.sum(ops.query_and_group(
    p, c, 0.2, 64, mask=m, exact=False)[0]))

# dispatch floor: trivial jitted program + fetch
floor_j = jax.jit(lambda p: jnp.sum(p))

rows = [
    ("dispatch floor (sum fetch)", timeit(floor_j, pts)),
    ("backbone only", timeit(bb_j, pts, mask)),
    ("forward (bb+vote+proposal)", timeit(fwd_only, pts, mask)),
    ("full (fwd+decode+NMS)", timeit(full, pts, mask)),
    ("FPS 20480->2048 standalone", timeit(fps_j, pts, mask)),
    ("fast grouping SA1 standalone", timeit(grp_j, pts, centers, mask)),
]
for name, t in rows:
    print(f"{name:32s} {t:7.1f} ms", flush=True)
