"""Shared inference machinery: batched encoder passes on device.

The reference evaluates open-set scores **one crop at a time** in a python
loop (``inference_PCAA.py:195-221``) — thousands of tiny forward passes.
Here every split is encoded in one jitted ``lax.scan`` over fixed-size
chunks (pad + mask), so the whole likelihood pass is a handful of device
executions regardless of split size.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def batched_apply(
    fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, ...]],
    x: np.ndarray,
    batch_size: int = 256,
):
    """Apply ``fn`` over ``x`` in fixed-size chunks inside one jitted scan.

    ``fn`` maps ``(B, ...) -> tuple of (B, ...)`` arrays. ``x`` is padded to
    a multiple of ``batch_size`` (padding rows are discarded from outputs).
    """
    n = x.shape[0]
    steps = -(-n // batch_size)
    pad = steps * batch_size - n
    xp = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0) if pad else x
    xp = jnp.asarray(xp).reshape((steps, batch_size) + x.shape[1:])

    @jax.jit
    def run(xs):
        def body(_, chunk):
            return None, fn(chunk)

        _, outs = jax.lax.scan(body, None, xs)
        return outs

    outs = jax.device_get(run(xp))
    return tuple(o.reshape((-1,) + o.shape[2:])[:n] for o in outs)
