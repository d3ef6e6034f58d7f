"""Shared inference machinery: batched encoder passes on device.

The reference evaluates open-set scores **one crop at a time** in a python
loop (``inference_PCAA.py:195-221``) — thousands of tiny forward passes.
Here every split is encoded in one jitted ``lax.scan`` over fixed-size
chunks (pad + mask), so the whole likelihood pass is a handful of device
executions regardless of split size.

IMPORTANT: model parameters must be passed through ``params`` (explicit jit
arguments), never closed over by ``fn`` — closure arrays become jaxpr
*constants*, and with the 215M-parameter PCAA decoder that embeds ~860 MB
into every compile (catastrophic over the axon remote-compile tunnel;
observed 30+ min per inference pass before this was fixed).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def chunk_rows(
    x: np.ndarray, batch_size: int, pad_to_steps: int = 0
) -> np.ndarray:
    """Pad ``x`` to a multiple of ``batch_size`` (repeating the last row) and
    reshape to ``(steps, batch_size, ...)`` — THE chunking policy of
    ``batched_apply``. Aux per-sample arrays that must stay row-aligned with
    ``x`` through a ``batched_apply`` scan (e.g. the ORCED CRN replay's eps
    stream, ``infer/orced.py::_orced_pass``) must be chunked with this same
    function (including ``pad_to_steps``).

    ``pad_to_steps``: pad up to at least this many chunks (ignored if the
    natural count is already larger). Callers running several splits of
    different sizes through the same ``fn`` pad all of them to the LARGEST
    split's step count so every pass reuses ONE compiled scan — each
    distinct step count is otherwise a separate XLA compile over the axon
    tunnel (the dominant cost of full-dims ORCED TPU inference; breakdown
    in PERF_ROOFLINE.md)."""
    n = x.shape[0]
    steps = max(-(-n // batch_size), pad_to_steps)
    pad = steps * batch_size - n
    xp = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0) if pad else x
    return np.asarray(xp).reshape((steps, batch_size) + x.shape[1:])


def batched_apply(
    fn: Callable[..., Tuple[jnp.ndarray, ...]],
    x: np.ndarray,
    batch_size: int = 256,
    params: Any = None,
    with_index: bool = False,
    pad_to_steps: int = 0,
):
    """Apply ``fn(chunk, params)`` over ``x`` in fixed-size chunks inside one
    jitted scan.

    ``fn`` maps ``(B, ...), params -> tuple of (B, ...)`` arrays. ``x`` is
    padded to a multiple of ``batch_size`` (padding rows are discarded from
    outputs). ``params`` is any pytree of arrays threaded through jit as a
    real argument (see module docstring for why this is mandatory).

    ``with_index=True`` calls ``fn(chunk, params, step_idx)`` instead, so
    stochastic passes can fold the chunk index into their PRNG key (fresh
    noise per chunk rather than the same noise rows repeating every
    ``batch_size`` samples).

    The jitted runner is cached ON the ``fn`` object: callers that pass a
    STABLE ``fn`` object (e.g. a per-model ``lru_cache``-d closure, see
    ``infer/pcaa.py::_encode_fn`` — the lru_cache's strong ref keeps the
    entry alive) reuse the XLA compile across repeated same-shape calls —
    seed loops in the parity tools were paying a full recompile per call
    otherwise. A fresh closure per call still works and recompiles as
    before; once the caller drops it, the runner (and its compiled
    executables, decoder-scale for PCAA) is collectable rather than pinned
    in a process-lifetime cache.
    """
    n = x.shape[0]
    xp = jnp.asarray(chunk_rows(np.asarray(x), batch_size, pad_to_steps))
    outs = jax.device_get(_runner(fn, with_index)(xp, params))
    return tuple(o.reshape((-1,) + o.shape[2:])[:n] for o in outs)


def _runner(fn, with_index: bool):
    # The cache lives ON the fn object (not in a module-level dict): the
    # jitted runner's closure references fn, so any external cache —
    # even a WeakKeyDictionary, whose values strongly reference keys —
    # would pin dropped closures (and their decoder-scale executables)
    # for the life of the process. As an attribute, the runner dies
    # exactly when its fn does.
    by_flag = getattr(fn, "_osgr_runners", None)
    run = None if by_flag is None else by_flag.get(with_index)
    if run is not None:
        return run

    @jax.jit
    def run(xs, params):
        def body(_, step_and_chunk):
            step_idx, chunk = step_and_chunk
            if with_index:
                return None, fn(chunk, params, step_idx)
            return None, fn(chunk, params)

        _, outs = jax.lax.scan(body, None, (jnp.arange(xs.shape[0]), xs))
        return outs

    try:
        if by_flag is None:
            by_flag = fn._osgr_runners = {}
        by_flag[with_index] = run
    except (AttributeError, TypeError):
        pass  # fn doesn't take attributes (e.g. a builtin): uncached
    return run
