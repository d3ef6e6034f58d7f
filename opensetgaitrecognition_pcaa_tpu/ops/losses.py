"""Training losses: cross-entropy, conditional-Gaussian KL, mined triplet.

All are pure jittable JAX functions over fixed shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy (torch ``CrossEntropyLoss`` semantics).

    Note the reference feeds ELU-activated classifier outputs into CE
    (``models.py:271-277`` — a preserved quirk of the *model*, not of this
    loss; the loss itself is standard log-softmax CE).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def cg_kl_divergence(
    mu: jnp.ndarray, logvar: jnp.ndarray, mu_k: jnp.ndarray
) -> jnp.ndarray:
    """KL( N(mu, e^logvar) || N(mu_k, I) ), summed over dims, batch-averaged.

    Reference ``CG_kl_divergence`` (``utils.py:72-85``), eq. (6) of the
    CGDL open-set paper.
    """
    per_sample = -0.5 * jnp.sum(
        1.0 + logvar - (mu - mu_k) ** 2 - jnp.exp(logvar), axis=1
    )
    return jnp.mean(per_sample)


def multi_similarity_mine(
    embeddings: jnp.ndarray, labels: jnp.ndarray, epsilon: float = 0.1
):
    """Multi-Similarity pair mining (Wang et al., CVPR 2019) on cosine sims.

    Replaces ``pytorch_metric_learning.miners.MultiSimilarityMiner`` (used at
    reference ``train_ORCED.py:30,162``), which has no JAX port. Returns
    boolean masks over the ``(B, B)`` pair grid instead of index lists so the
    whole computation stays fixed-shape for jit:

    - positive pair (i, j), y_i == y_j, kept iff
      ``sim_ij < max_k{sim_ik : y_k != y_i} + epsilon``;
    - negative pair (i, k), y_i != y_k, kept iff
      ``sim_ik > min_j{sim_ij : y_j == y_i, j != i} - epsilon``.
    """
    sim = embeddings @ embeddings.T  # cosine similarity on normalized inputs
    n = embeddings.shape[0]
    eye = jnp.eye(n, dtype=bool)
    same = labels[:, None] == labels[None, :]
    pos_mask = same & ~eye
    neg_mask = ~same

    neg_inf = jnp.float32(-jnp.inf)
    pos_inf = jnp.float32(jnp.inf)
    hardest_neg = jnp.max(jnp.where(neg_mask, sim, neg_inf), axis=1)  # (B,)
    easiest_pos = jnp.min(jnp.where(pos_mask, sim, pos_inf), axis=1)  # (B,)

    keep_pos = pos_mask & (sim < (hardest_neg[:, None] + epsilon))
    keep_neg = neg_mask & (sim > (easiest_pos[:, None] - epsilon))
    # Anchors with no valid counterpart produce -inf/inf sentinels above;
    # comparisons against them are False, so the masks stay well-defined.
    return keep_pos, keep_neg


def triplet_loss_with_ms_miner(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 0.5,
    epsilon: float = 0.1,
) -> jnp.ndarray:
    """Triplet-margin loss over Multi-Similarity-mined hard pairs.

    Equivalent of the reference's
    ``TripletMarginLoss(margin)(normalized_fvs, labels, miner(...))``
    (``train_ORCED.py:30-34,161-163``): pairs from the MS miner are expanded
    into all (anchor, kept-pos, kept-neg) triplets sharing the anchor, and
    the loss is the mean over triplets of
    ``relu(d(a,p) - d(a,n) + margin)`` with euclidean distances, averaged
    over the *violating* (non-zero) triplets — pytorch_metric_learning's
    default ``AvgNonZeroReducer`` semantics.

    Expects pre-normalized embeddings (the reference L2-normalizes before
    both mining and the loss, ``train_ORCED.py:161``).
    """
    keep_pos, keep_neg = multi_similarity_mine(embeddings, labels, epsilon)

    sq = (
        jnp.sum(embeddings**2, axis=1)[:, None]
        + jnp.sum(embeddings**2, axis=1)[None, :]
        - 2.0 * embeddings @ embeddings.T
    )
    dist = jnp.sqrt(jnp.maximum(sq, 0.0) + 1e-16)

    # triplet grid (a, p, n): valid iff pair (a,p) kept-pos and (a,n) kept-neg
    valid = keep_pos[:, :, None] & keep_neg[:, None, :]
    viol = jax.nn.relu(dist[:, :, None] - dist[:, None, :] + margin)
    viol = jnp.where(valid, viol, 0.0)
    n_nonzero = jnp.sum(viol > 0)
    return jnp.where(
        n_nonzero > 0, jnp.sum(viol) / jnp.maximum(n_nonzero, 1), 0.0
    )
