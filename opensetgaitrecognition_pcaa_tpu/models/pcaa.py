"""PCAA model family: conditional adversarial autoencoder components.

Oracles: ``CGEncoder`` (``models.py:232-292``), ``CGDecoder``
(``models.py:340-385``), ``CGDiscriminator`` (``models.py:405-421``), and the
per-variant projection heads built inline in the training scripts
(``PCAA_ablation.py:778-786``).

Preserved parity quirks (SURVEY.md §7.3):
- ELU is applied to the classifier logits (``models.py:271-277``) before CE;
- the decoder constructs BatchNorm layers it never calls in ``forward``
  (``models.py:353-371`` vs ``373-385``) — so this decoder simply has none;
- the decoder has **no** output activation (unlike the dead legacy Decoder's
  Tanh).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from opensetgaitrecognition_pcaa_tpu.models.layers import GaitBackbone, TorchDense


class CGEncoder(nn.Module):
    """Gait encoder → (class scores, 32-d latent).

    Returns ``(out_classes, sup_fv)`` where ``sup_fv`` is the latent *before*
    the optional projection head (reference ``models.py:279-292``).

    Input ``(B, T, N, C)`` channels-last.
    """

    n_out_labels: int
    sup_latent_dim: int = 32
    pointnet_out_dim: int = 1024
    dtc_filters: tuple = (16, 32, 64, 128, 256, 512)
    use_projection_head: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        feats = GaitBackbone(
            self.pointnet_out_dim, self.dtc_filters, dtype=self.dtype
        )(x, train)
        sup_fv = nn.elu(TorchDense(self.sup_latent_dim, name="MLP_sup1")(feats))
        h = sup_fv
        if self.use_projection_head:
            h = nn.elu(
                TorchDense(self.sup_latent_dim // 2, name="MLP_head")(h)
            )
        # Quirk preserved: ELU on the classification logits (models.py:271-277).
        out_classes = nn.elu(TorchDense(self.n_out_labels, name="MLP_sup2")(h))
        return out_classes, sup_fv


class CGDecoder(nn.Module):
    """Latent → reconstructed point-cloud sequence ``(B, T, N, C)``.

    5-layer MLP, sizes S/16 → S/8 → S/4 → S/2 → S with
    S = T·C·nmax (reference ``models.py:340-385``); ELU between layers, no
    norm, no output activation. The flat output is reshaped channels-last
    (the reference reshapes to torch's ``(B, C, T, N)``; the permutation is
    absorbed by the learned final layer, so reconstructions are equivalent).
    """

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


class CGDiscriminator(nn.Module):
    """Conditional WGAN critic: (latent ⊕ one-hot label) → scalar logit.

    MLP (32+n) → 64 → 32 → 1 with ELU between (reference
    ``models.py:405-421``). Returns ``(B, 1)``.
    """

    @nn.compact
    def __call__(self, z: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
        h = jnp.concatenate([z, onehot], axis=-1)
        h = nn.elu(TorchDense(64)(h))
        h = nn.elu(TorchDense(32)(h))
        return TorchDense(1)(h)


class ProjectionHead(nn.Module):
    """Single Dense + ELU head (reference ``PCAA_ablation.py:778-786``).

    Decoder head: latent→2·latent, as in the reference. Discriminator head:
    the reference DECLARES 2·latent→latent but feeds it the latent-dim
    ``sup_fv`` (``PCAA_ablation.py:783-786`` vs ``:934-936``), so its
    ``proj_head_on_discriminator`` path can never execute; here the head is
    built latent→latent so the option actually works (documented
    deviation — no reference numbers exist for this path)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.elu(TorchDense(self.features)(x))
