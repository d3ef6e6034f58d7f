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
