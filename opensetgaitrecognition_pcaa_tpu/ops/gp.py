"""WGAN gradient penalty via native double differentiation.

Behavioral oracle: the inline penalty in the reference training loops
(``PCAA_ablation.py:939-966``, ``train_AAE.py:198-221``): interpolate
between prior samples ``z`` and (detached) encoder codes, take the critic's
gradient w.r.t. the interpolates, and penalize ``(||grad||_2 - 1)²``.

In torch this needs ``autograd.grad(create_graph=True)``; in JAX it is just
``jax.grad`` composed under the outer ``jax.grad`` of the discriminator loss
— XLA differentiates through it natively (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gradient_penalty(
    critic: Callable[[jnp.ndarray], jnp.ndarray],
    z: jnp.ndarray,
    codes: jnp.ndarray,
    alphas: jnp.ndarray,
) -> jnp.ndarray:
    """Standard (two-sided) WGAN-GP term: ``(||grad||_2 - 1)²`` — the
    reference's exact form (NOT the one-sided ``relu(||g|| - 1)²`` variant;
    "fixing" this would silently break training parity).

    :param critic: maps ``(B, D)`` latents to ``(B,)`` (or ``(B, 1)``) logits.
        Conditioning (the one-hot label concat) is closed over by the caller.
    :param z: ``(B, D)`` prior samples (real side).
    :param codes: ``(B, D)`` encoder codes (fake side; caller stop-gradients).
    :param alphas: ``(B, 1)`` or ``(B, D)`` interpolation coefficients. The
        reference draws ``(BATCH_SIZE, 1)`` uniforms repeated across D
        (``PCAA_ablation.py:945-949``) — pass the equivalent.
    """
    interpolates = z + alphas * (codes - z)

    def critic_sum(x):
        return jnp.sum(critic(x))

    # Per-sample input gradients: the critic is per-sample, so the gradient
    # of the summed output w.r.t. the batched input is exactly the stack of
    # per-sample gradients (same as torch's grad_outputs=ones trick).
    grads = jax.grad(critic_sum)(interpolates)
    slopes = jnp.sqrt(jnp.sum(grads**2, axis=1) + 1e-12)
    return jnp.mean((slopes - 1.0) ** 2)
