"""Density-biased proposal sampling under data-parallel sharding: the
selection (per-scene top-C by vote density → FPS) is row-local, so the
DP-sharded forward must pick the same proposal INDICES as the unsharded
program."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad.config import Config, ModelConfig, apply_overrides
from tpu3dsad.data.synthetic import detection_batch
from tpu3dsad.models.detector import SizeAdaptiveDetector
from tpu3dsad.parallel import make_mesh, shard_batch


def test_dp_density_sampling_bitwise():
    cfg = apply_overrides(
        Config(model=ModelConfig(
            num_classes=4, sa_npoints=(64, 32, 16, 8),
            sa_nsamples=(8, 8, 4, 4),
            sa_channels=((16, 16), (16, 32), (16, 32), (16, 32)),
            fp_channels=((32, 32), (32, 32)), seed_feat_dim=32,
            num_proposals=8, cluster_nsample=4,
        )),
        ["model.proposal_sampling=density",
         "model.proposal_density_radius=0.5"],
    )
    model = SizeAdaptiveDetector(cfg.model)
    rng = np.random.default_rng(0)
    b = detection_batch(rng, 8, 256, 4, max_boxes=8)
    pts = jnp.asarray(b["points"])
    mask = jnp.asarray(b["point_mask"])
    v = jax.jit(lambda k: model.init(k, pts, mask=mask, train=False))(
        jax.random.key(0)
    )
    want = jax.jit(lambda p, m: model.apply(v, p, mask=m, train=False))(
        pts, mask
    )

    mesh = make_mesh((-1,), ("data",))
    sb = shard_batch({"points": pts, "point_mask": mask}, mesh)
    got = jax.jit(lambda p, m: model.apply(v, p, mask=m, train=False))(
        sb["points"], sb["point_mask"]
    )
    # indices (the sampler's decision) must agree exactly; the CENTERS are
    # gathers of vote_xyz, which drifts ~1e-7 between the sharded and
    # unsharded programs (SPMD matmul partitioning upstream in the voting
    # MLP — same caveat as __graft_entry__'s cp comparison), so allclose
    np.testing.assert_array_equal(
        np.asarray(got["proposal_inds"]), np.asarray(want["proposal_inds"])
    )
    np.testing.assert_allclose(
        np.asarray(got["proposal_xyz"]), np.asarray(want["proposal_xyz"]),
        rtol=1e-5, atol=1e-6,
    )
