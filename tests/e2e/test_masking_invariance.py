"""Whole-detector masking invariance (SURVEY.md §4.3): padding the input
cloud with garbage points must not change any decoded output."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad.config import ModelConfig
from tpu3dsad.models.detector import SizeAdaptiveDetector


def test_detector_outputs_invariant_to_padding(rng):
    cfg = ModelConfig(
        num_classes=4,
        sa_npoints=(128, 64, 32, 16),
        sa_nsamples=(8, 8, 4, 4),
        sa_channels=((16, 16), (16, 32), (16, 32), (16, 32)),
        fp_channels=((32, 32), (32, 32)),
        seed_feat_dim=32,
        num_proposals=16,
        cluster_nsample=4,
    )
    B, N, PAD = 2, 512, 256
    xyz = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    garbage = 100.0 + rng.uniform(-1, 1, (B, PAD, 3)).astype(np.float32)
    padded = np.concatenate([xyz, garbage], 1)
    mask_base = np.ones((B, N), bool)
    mask_pad = np.concatenate([mask_base, np.zeros((B, PAD), bool)], 1)

    model = SizeAdaptiveDetector(cfg)
    variables = jax.jit(
        lambda k: model.init(
            k, jnp.asarray(xyz), mask=jnp.asarray(mask_base), train=False
        )
    )(jax.random.key(0))

    apply = jax.jit(
        lambda x, m: model.apply(variables, x, mask=m, train=False)
    )
    base = apply(jnp.asarray(xyz), jnp.asarray(mask_base))
    pad = apply(jnp.asarray(padded), jnp.asarray(mask_pad))

    for key in ("proposal_xyz", "center", "objectness_scores",
                "sem_cls_scores", "scale_logits", "heading_scores",
                "size_scores", "vote_xyz"):
        np.testing.assert_allclose(
            np.asarray(base[key]), np.asarray(pad[key]), atol=2e-4,
            err_msg=key,
        )
    # seed indices must point at the same (real) input points
    np.testing.assert_array_equal(
        np.asarray(base["seed_inds"]), np.asarray(pad["seed_inds"])
    )
