"""Sequence Chamfer distance on TPU.

Behavioral oracle: reference ``SeqChamferLoss`` (``utils.py:88-132``) —
bidirectional sum-of-min-squared-distances between two point-cloud
sequences, averaged over batch and time (or per-sample over time only).

TPU design: the pairwise squared-distance matrix is built with the
``xxᵀ + yyᵀ − 2xyᵀ`` matmul trick so the O(N²·C) work lands on the MXU as a
batched ``(N, C) @ (C, N)`` contraction; min-reductions run on the VPU. For
the reference shapes (T=30, N=150) the full ``(B, T, N, N)`` tensor is small
enough that XLA keeps the fusion tight; a Pallas tiled variant for larger N
lives in ``ops/pallas/chamfer_kernel.py``.

Layout: canonical ``(B, T, N, C)`` (channels last) — no permutes needed,
unlike the reference which transposes from torch's ``(B, C, T, N)``
(``utils.py:114-115``).
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_sq_dists(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances, ``(..., N, C) x (..., M, C) -> (..., N, M)``."""
    xx = jnp.sum(x * x, axis=-1)
    yy = jnp.sum(y * y, axis=-1)
    xy = jnp.einsum(
        "...nc,...mc->...nm", x, y, preferred_element_type=jnp.float32
    )
    return xx[..., :, None] + yy[..., None, :] - 2.0 * xy


def seq_chamfer(
    preds: jnp.ndarray, gts: jnp.ndarray, avg_out: bool = True
) -> jnp.ndarray:
    """Chamfer distance over point-cloud sequences.

    :param preds: ``(B, T, N, C)`` reconstructed sequences.
    :param gts: ``(B, T, M, C)`` ground-truth sequences.
    :param avg_out: if True return the scalar mean over (batch, time) —
        reference ``utils.py:98-105``; if False return ``(B,)`` per-sample
        means over time (used by ORCED inference, ``inference_ORCED.py:293``).
    """
    # P[b, t, i, j] = ||gts[b,t,i] - preds[b,t,j]||²  (reference builds
    # P = batch_pairwise_dist(gts, preds), utils.py:99).
    p = pairwise_sq_dists(gts, preds)
    # min over gt points for each pred point, summed over pred points …
    loss_1 = jnp.sum(jnp.min(p, axis=2), axis=2)  # (B, T)
    # … and min over pred points for each gt point, summed over gt points.
    loss_2 = jnp.sum(jnp.min(p, axis=3), axis=2)  # (B, T)
    total = loss_1 + loss_2
    if avg_out:
        return jnp.mean(total)
    return jnp.mean(total, axis=1)
