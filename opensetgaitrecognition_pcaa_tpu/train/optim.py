"""Memory-traffic-aware Adam for HBM-bound steps.

The PCAA V4 step is dominated by HBM traffic on the 215M-param decoder
(CLAUDE.md perf notes): every step reads+writes both Adam moments. optax's
``adam(mu_dtype=...)`` lets the FIRST moment be bf16 (validated +8% in
round 1) but pins the second moment to the param dtype. This module is an
optax-compatible Adam whose moments can EACH be stored in a narrower dtype,
with all arithmetic still performed in f32:

- ``mu`` in bf16: same as optax's ``mu_dtype`` (validated).
- ``nu`` in bf16: ~0.4% relative storage noise on the second-moment EMA,
  halved again by the sqrt in the update — negligible against Adam's eps
  floor. Saves another read+write of a param-sized f32 tree per step
  (~1.7 GB/step at reference dims).

Equivalence to ``optax.adam`` at f32/f32 is oracle-tested
(``tests/test_train.py``); the bf16-nu quality gate is the same synthetic
valid-accuracy check used for the bf16 compute path.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ScaleByAdamLowmemState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def _cast(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


def scale_by_adam_lowmem(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[Any] = None,
    nu_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with independently narrow moment storage.

    Arithmetic is f32 (moments are upcast before the EMA and the update);
    only the *stored* trees carry ``mu_dtype`` / ``nu_dtype``.
    """

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return ScaleByAdamLowmemState(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1

        def upd_mu(g, m):
            m32 = m.astype(jnp.float32)
            return (1 - b1) * g.astype(jnp.float32) + b1 * m32

        def upd_nu(g, v):
            v32 = v.astype(jnp.float32)
            g32 = g.astype(jnp.float32)
            return (1 - b2) * (g32 * g32) + b2 * v32

        # update computed from the PRE-cast f32 moments, cast at store —
        # exactly optax.scale_by_adam's order (its cast happens after the
        # update is formed), so f32/f32 and bf16-mu match optax.adam.
        mu32 = jax.tree_util.tree_map(upd_mu, updates, state.mu)
        nu32 = jax.tree_util.tree_map(upd_nu, updates, state.nu)

        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def adam_step(m, v):
            return (m / c1) / (jnp.sqrt(v / c2) + eps)

        new_updates = jax.tree_util.tree_map(adam_step, mu32, nu32)
        return new_updates, ScaleByAdamLowmemState(
            count, _cast(mu32, mu_dtype), _cast(nu32, nu_dtype)
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adam_lowmem(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[Any] = None,
    nu_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Adam == ``optax.adam`` at default dtypes; narrow-moment variant
    otherwise. Update sign/scale contract identical to ``optax.adam``."""
    return optax.chain(
        scale_by_adam_lowmem(
            b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype, nu_dtype=nu_dtype
        ),
        optax.scale(-learning_rate),
    )


class ScaleByAdamFactoredState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    # per-leaf: either a full `nu` array (small/1-D leaves) or a
    # {"r": row-EMA, "c": col-EMA} dict (big 2-D leaves)
    nu: Any


# 2-D leaves at least this big store a factored second moment. 2^20 f32
# elements = 4 MB — below it the traffic saving is irrelevant.
_FACTORED_MIN_ELEMS = 1 << 20


def scale_by_adam_factored(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[Any] = None,
    min_elems: int = _FACTORED_MIN_ELEMS,
) -> optax.GradientTransformation:
    """Adam with an Adafactor-style FACTORED second moment on big matrices.

    Why: the PCAA step is HBM-bound on decoder optimizer traffic
    (PERF_ROOFLINE.md). Narrowing ``nu`` to bf16 (``adam_lowmem``) saves the
    same bytes but measurably degrades training: with b2=0.99 the per-step
    EMA increment (1-b2)·g² is only ~2.5× bf16's 2⁻⁸ relative resolution,
    so v updates partially round away. Factoring instead keeps f32
    precision in a rank-1 approximation (Shazeer & Stern, Adafactor,
    arXiv:1804.04235 §3):

        R = b2·R + (1−b2)·row_sum(g²+ε₂)   (shape: rows)
        C = b2·C + (1−b2)·col_sum(g²+ε₂)   (shape: cols)
        v̂_ij = R_i·C_j / Σ_i R_i

    eliminating the param-sized v read+write entirely (27k floats replace
    162M on the big decoder matrix). ``mu`` and bias correction stay
    exactly Adam's — this is Adam with approximated curvature denominator,
    NOT full Adafactor (no update clipping / relative step sizes).

    Small or non-2-D leaves keep an exact f32 ``nu`` (bitwise
    ``adam_lowmem`` semantics for them).
    """
    eps2 = 1e-30  # Adafactor's regularization constant epsilon_1

    def _factored(p):
        return p.ndim == 2 and p.size >= min_elems

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )

        def init_nu(p):
            if _factored(p):
                return {
                    "r": jnp.zeros((p.shape[0],), jnp.float32),
                    "c": jnp.zeros((p.shape[1],), jnp.float32),
                }
            return jnp.zeros_like(p)

        nu = jax.tree_util.tree_map(init_nu, params)
        return ScaleByAdamFactoredState(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def upd_mu(g, m):
            return (1 - b1) * g.astype(jnp.float32) + b1 * m.astype(jnp.float32)

        mu32 = jax.tree_util.tree_map(upd_mu, updates, state.mu)

        def upd(g, m32, v):
            g32 = g.astype(jnp.float32)
            if isinstance(v, dict):  # factored leaf
                sq = g32 * g32 + eps2
                r = b2 * v["r"] + (1 - b2) * jnp.sum(sq, axis=1)
                c = b2 * v["c"] + (1 - b2) * jnp.sum(sq, axis=0)
                # v̂ = outer(r, c) / sum(r); fold 1/c2 bias correction in
                vhat = (r[:, None] / (c2 * jnp.sum(r))) * c[None, :]
                new_v = {"r": r, "c": c}
            else:
                new_v = b2 * v + (1 - b2) * (g32 * g32)
                vhat = new_v / c2
            step = (m32 / c1) / (jnp.sqrt(vhat) + eps)
            return step, new_v

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(mu32)
        flat_v = treedef.flatten_up_to(state.nu)
        stepped = [upd(g, m, v) for g, m, v in zip(flat_g, flat_m, flat_v)]
        new_updates = jax.tree_util.tree_unflatten(treedef, [s for s, _ in stepped])
        new_nu = jax.tree_util.tree_unflatten(treedef, [v for _, v in stepped])
        return new_updates, ScaleByAdamFactoredState(
            count, _cast(mu32, mu_dtype), new_nu
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adam_factored(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[Any] = None,
    min_elems: int = _FACTORED_MIN_ELEMS,
) -> optax.GradientTransformation:
    """Adam with factored second moment on big 2-D leaves (see
    ``scale_by_adam_factored``); exact Adam elsewhere."""
    return optax.chain(
        scale_by_adam_factored(
            b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype, min_elems=min_elems
        ),
        optax.scale(-learning_rate),
    )
