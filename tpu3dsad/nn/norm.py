"""Masked BatchNorm with call-time momentum.

The lineage schedules BN momentum during training (train.py BNMomentumScheduler:
torch-momentum 0.5 halved every N epochs — SURVEY.md §5 config; in flax
convention running_avg_weight = 1 - torch_momentum, i.e. 0.5 → 0.999+).
flax.linen.BatchNorm fixes momentum at module construction, which would force
a recompile per schedule step; this variant takes momentum as a traced scalar
so the whole schedule lives inside one compiled train step.

Statistics are masked: padded rows contribute neither mean nor variance.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all axes but the last, mask-aware, dynamic momentum."""

    epsilon: float = 1e-5  # torch BatchNorm default, for weight-import parity
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool, momentum=0.9, mask=None):
        """x [..., C]; mask [...] bool (True = real row); momentum is the
        weight of the OLD running average (flax convention)."""
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                mean = jnp.mean(x, axis=reduce_axes)
                var = jnp.var(x, axis=reduce_axes)
            else:
                m = mask.astype(x.dtype)[..., None]
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=reduce_axes) / cnt
                var = jnp.sum(m * (x - mean) ** 2, axis=reduce_axes) / cnt
            if not self.is_initializing():
                mom = jnp.asarray(momentum, x.dtype)
                ra_mean.value = mom * ra_mean.value + (1.0 - mom) * mean
                ra_var.value = mom * ra_var.value + (1.0 - mom) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
