"""Per-class prior-centroid network.

Oracle: reference ``GaussianMeanLearner`` (``models.py:424-443``) — MLP
one-hot → 16 → 32 → 64 → latent_dim with BatchNorm+ELU between layers.

Parity quirk (verified against torch: ``Variable(z0 + mus)`` detaches):
in PCAA variant 1 the mean learner is placed in the discriminator's
optimizer (``PCAA_ablation.py:108-112``) but the prior sample ``z`` is
wrapped in ``Variable(...)`` (``PCAA_ablation.py:186-188``), which cuts the
graph — so **its parameters never receive gradients and stay at
initialization**; only its BatchNorm *running statistics* update, because it
runs in train mode each D-step. The saved "learned" centroids
(``PCAA_ablation.py:369-376``) are computed in train mode on the identity
one-hot batch, i.e. normalized by that batch's own statistics. ORCED, by
contrast, trains it for real through the KL term (``train_ORCED.py:152,166``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from opensetgaitrecognition_pcaa_tpu.models.layers import TorchDense
from opensetgaitrecognition_pcaa_tpu.models.norm import TorchBatchNorm


class GaussianMeanLearner(nn.Module):
    latent_dim: int = 32

    @nn.compact
    def __call__(self, onehot: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = onehot
        for w in (16, 32, 64):
            h = TorchDense(w)(h)
            h = TorchBatchNorm()(h, use_running_average=not train)
            h = nn.elu(h)
        return TorchDense(self.latent_dim)(h)
