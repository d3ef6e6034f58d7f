"""OR-CED baseline: VAE-style encoder/decoder.

Oracles: ``ORCEDEncoder`` (``models.py:446-500``) and ``ORCEDDecoder``
(``models.py:503-545``). Same gait backbone as PCAA; heads are plain Dense
layers (no ELU on μ/logvar/classifier outputs, unlike CGEncoder's quirk).

The reparametrization ``z = μ + ε·exp(0.5·logvar)`` samples ε **always** —
the reference's ``torch.randn_like`` runs in eval mode too
(``models.py:494-496``), so inference latents are stochastic; callers thread
an explicit ``'reparam'`` PRNG stream.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from opensetgaitrecognition_pcaa_tpu.models.layers import GaitBackbone, TorchDense


class ORCEDEncoder(nn.Module):
    n_out_labels: int
    sup_latent_dim: int = 32
    pointnet_out_dim: int = 1024
    dtc_filters: tuple = (16, 32, 64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, eps: jnp.ndarray = None):
        """``eps``: optional externally-supplied reparam draw ``(B, latent)``
        replacing the ``'reparam'`` PRNG sample — the replay path for
        common-random-numbers parity runs (``tools/parity_twin_orced.py``
        records the reference's ``torch.randn_like`` values and feeds them
        here)."""
        feats = GaitBackbone(
            self.pointnet_out_dim, self.dtc_filters, dtype=self.dtype
        )(x, train)
        mu = TorchDense(self.sup_latent_dim, name="MLP_mu")(feats)
        logvar = TorchDense(self.sup_latent_dim, name="MLP_logvar")(feats)
        if eps is None:
            eps = jax.random.normal(self.make_rng("reparam"), logvar.shape)
        z = mu + eps * jnp.exp(0.5 * logvar)
        logits = TorchDense(self.n_out_labels, name="MLP_classification")(z)
        return logits, z, mu, logvar


class ORCEDDecoder(nn.Module):
    """Same 5-layer MLP decoder shape as CGDecoder but 32-d input
    (reference ``models.py:503-545``; hidden sizes from DEC_MLP_SIZE)."""

    nsteps: int = 30
    nmax_points: int = 150
    nfeatures: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        size = self.nsteps * self.nfeatures * self.nmax_points
        for s in (size // 16, size // 8, size // 4, size // 2):
            z = nn.elu(TorchDense(s, dtype=self.dtype)(z))
        z = TorchDense(size, dtype=self.dtype)(z)
        # reconstructions leave the decoder in f32 (Chamfer in bf16 loses
        # precision in the min-reductions)
        z = z.astype(jnp.float32)
        return z.reshape(z.shape[0], self.nsteps, self.nmax_points, self.nfeatures)
