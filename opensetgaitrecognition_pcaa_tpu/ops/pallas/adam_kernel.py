"""Pallas TPU kernel: fused Adam update (read g,w,m,v → write w,m,v).

Why: the PCAA V4 step is HBM-bound and its single largest component is the
generator Adam update — 9.81 ms at 533 GB/s (PERF_ROOFLINE.md), ~1.5× the
5.2 GB analytic traffic minimum, because the optax path materializes the
``updates`` tree between ``scale_by_adam`` and ``apply_updates`` (an extra
param-sized f32 write+read per step on a 217.7M-param tree). This kernel
performs the whole update for one leaf in a single pass:

    m' = b1·m + (1−b1)·g
    v' = b2·v + (1−b2)·g²
    w' = w − (lr/c1)·m' / (sqrt(v'/c2) + eps)        c_i = 1 − b_i^t

with every block read once from HBM and written once.
Arithmetic is f32 regardless of storage dtype — identical to
``train/optim.py::adam_lowmem`` (m/v may be stored bf16) and to
``optax.adam`` at f32 storage, up to one float re-association in the
bias-corrected quotient (tolerance-tested against the optax oracle in
``tests/test_optim.py``).

Only ≥``_MIN_KERNEL_ELEMS`` 2-D leaves go through the kernel (the four big
decoder matrices are 215.1M of the 217.7M generator params); small/odd
leaves take an XLA path with the same formula. Scalars (bias corrections,
lr) enter via SMEM as a (1, 2) array (Mosaic: scalars must be 2-D in SMEM).

The reference has no analogue — its optimizer is ``torch.optim.Adam``
(``PCAA_ablation.py:820-833``); this is TPU-side engineering for the same
mathematical update.

MEASURED (v5e, B=16, bf16 compute, 2026-08-16): **slower than the XLA
path** — 580 vs 837 w/s (and 645 vs 920 w/s with bf16 nu). Moving the
update out of the jitted step's XLA graph forces the full gradient tree to
materialize at the pallas_call boundary (inside XLA the update fuses with
the gradient-producing matmuls' epilogues) and serializes a ~1300-step
elementwise grid behind the rest of the step. The optax path's ~1.5×
"excess" traffic in PERF_ROOFLINE.md is evidently already paid for by that
fusion/overlap. Kept behind ``Config.FUSED_ADAM`` (default OFF) as a
measured negative result — same status as the fused train-mode PointNet
(``ops/pallas/pointnet_train.py``).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Leaves smaller than this use plain XLA (kernel launch/edge overhead wins
# nothing on a few MB). 2^21 elems = 8 MB f32.
_MIN_KERNEL_ELEMS = 1 << 21

_BLOCK_R = 256
_BLOCK_C = 512


def _adam_block_kernel(s_ref, g_ref, w_ref, m_ref, v_ref, w_out, m_out, v_out, *, b1, b2, eps):
    s1 = s_ref[0, 0]  # lr / (1 - b1^t)
    s2 = s_ref[0, 1]  # 1 / (1 - b2^t)
    g = g_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    m = m_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    m2 = b1 * m + (1.0 - b1) * g
    v2 = b2 * v + (1.0 - b2) * (g * g)
    w2 = w - (s1 * m2) / (jnp.sqrt(v2 * s2) + eps)
    w_out[...] = w2.astype(w_out.dtype)
    m_out[...] = m2.astype(m_out.dtype)
    v_out[...] = v2.astype(v_out.dtype)


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps"))
def _adam_leaf_pallas(g, w, m, v, scalars, *, b1, b2, eps):
    R, C = w.shape
    br, bc = min(_BLOCK_R, R), min(_BLOCK_C, C)
    grid = (pl.cdiv(R, br), pl.cdiv(C, bc))
    blk = lambda: pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct(w.shape, w.dtype),
        jax.ShapeDtypeStruct(m.shape, m.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    )
    return pl.pallas_call(
        functools.partial(_adam_block_kernel, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            blk(),  # g
            blk(),  # w
            blk(),  # m
            blk(),  # v
        ],
        out_specs=(blk(), blk(), blk()),
        out_shape=out_shapes,
        # NO input_output_aliases: aliasing changes nothing for bandwidth
        # (same bytes in/out either way), only for transient HBM capacity
        # (~1.3 GB at reference dims, fine in 16 GB), and it breaks the
        # interpret-mode lowering whenever blocks don't divide the array
        # ("type of return operand ... doesn't match function result type"),
        # which these decoder shapes never do (18000 % 128 != 0).
    )(scalars, g, w, m, v)


def _adam_leaf_xla(g, w, m, v, s1, s2, *, b1, b2, eps):
    g32 = g.astype(jnp.float32)
    m2 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
    v2 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)
    w2 = w.astype(jnp.float32) - (s1 * m2) / (jnp.sqrt(v2 * s2) + eps)
    return w2.astype(w.dtype), m2.astype(m.dtype), v2.astype(v.dtype)


def fused_adam_tree_update(
    grads: Any,
    count: jnp.ndarray,
    mu: Any,
    nu: Any,
    params: Any,
    *,
    lr: float,
    b1: float,
    b2: float,
    eps: float = 1e-8,
    use_pallas: Optional[bool] = None,
    min_kernel_elems: int = _MIN_KERNEL_ELEMS,
):
    """One Adam step over a whole param tree; returns (params', count', mu',
    nu'). Storage dtypes of ``mu``/``nu`` are preserved leaf-by-leaf
    (bf16 moments stay bf16; arithmetic is f32 — ``adam_lowmem`` semantics).
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    count2 = count + 1
    t = count2.astype(jnp.float32)
    c1 = 1.0 - b1**t
    c2 = 1.0 - b2**t
    s1 = lr / c1
    s2 = 1.0 / c2
    scalars = jnp.stack([s1, s2]).reshape(1, 2).astype(jnp.float32)

    leaves_g, treedef = jax.tree_util.tree_flatten(grads)
    leaves_w = treedef.flatten_up_to(params)
    leaves_m = treedef.flatten_up_to(mu)
    leaves_v = treedef.flatten_up_to(nu)

    new_w, new_m, new_v = [], [], []
    for g, w, m, v in zip(leaves_g, leaves_w, leaves_m, leaves_v):
        if use_pallas and w.ndim == 2 and w.size >= min_kernel_elems:
            w2, m2, v2 = _adam_leaf_pallas(g, w, m, v, scalars, b1=b1, b2=b2, eps=eps)
        else:
            w2, m2, v2 = _adam_leaf_xla(g, w, m, v, s1, s2, b1=b1, b2=b2, eps=eps)
        new_w.append(w2)
        new_m.append(m2)
        new_v.append(v2)
    return (
        jax.tree_util.tree_unflatten(treedef, new_w),
        count2,
        jax.tree_util.tree_unflatten(treedef, new_m),
        jax.tree_util.tree_unflatten(treedef, new_v),
    )
