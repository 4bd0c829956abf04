"""Three-interpolate — pure-XLA reference implementation.

Inverse-distance-weighted 3-NN feature interpolation used by the feature
propagation layers; semantics per the lineage CUDA kernel (SURVEY.md §2.1,
pointnet2/_ext_src/src/interpolate_gpu.cu). The backward pass (scatter-add
into the support features) is XLA's native gather VJP.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu3dsad.ops.xla.group import group


def interp_weights(d2: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance weights from squared 3-NN distances [B,M,3]."""
    recip = 1.0 / (d2 + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def three_interpolate(
    feats: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """feats [B,N,C], idx [B,M,3], weight [B,M,3] -> [B,M,C]."""
    gathered = group(feats, idx)  # [B, M, 3, C]
    return jnp.einsum(
        "bmkc,bmk->bmc", gathered, weight, preferred_element_type=jnp.float32
    )
