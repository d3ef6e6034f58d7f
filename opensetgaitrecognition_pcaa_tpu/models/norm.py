"""BatchNorm with exact torch semantics, for parity with the reference.

The reference normalizes with torch ``BatchNorm{1,2}d`` defaults
(momentum 0.1, eps 1e-5) throughout the encoder backbone and mean learner
(``models.py:29,71,428-437``). flax's stock ``nn.BatchNorm`` differs in two
parity-relevant details, so we implement our own ~30-line module:

- torch normalizes the batch with the **biased** variance but accumulates the
  **unbiased** variance into the running estimate;
- torch's ``momentum`` is the weight of the *new* batch statistic
  (``new = (1-m)·old + m·batch``), the opposite convention of flax.

Normalization is always over every axis except the trailing channel axis —
with the framework's channels-last layout this single module covers the
reference's BatchNorm2d over (B, T, N), BatchNorm1d over (B, T), and
BatchNorm1d over (B,) uses.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class TorchBatchNorm(nn.Module):
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        # Statistics always in float32; the normalized output keeps the
        # input dtype (bf16 in → bf16 out halves HBM traffic on the huge
        # per-point activations while stats/params stay exact).
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean((xf - mean) ** 2, axis=reduce_axes)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        out = (xf - mean) * (inv * scale) + bias
        return out.astype(x.dtype)
