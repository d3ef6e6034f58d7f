"""Pallas TPU kernel: fused eval-mode PointNet stack + point pooling.

The inference hot path runs the 4-layer per-point MLP (4→D/2→D/2→D→D) over
every point of every frame and then mean-pools the point axis
(``models.py:100-105,242-243``). In eval mode BatchNorm is a per-channel
affine (running stats are constants), so each layer folds into a single
``W', b'`` — the whole stack becomes 4 fused (matmul → affine-ELU) hops.

This kernel keeps one frame's point matrix AND all four folded weight
matrices resident in VMEM, computes the full chain, and writes only the
pooled ``(1, D)`` row per frame. HBM traffic falls from
``O(B·T·N·D)`` activations × layers (the XLA path materializes each layer)
to ``B·T·N·C_in`` in + ``B·T·D`` out + the weights once.

Used by the batched inference passes (SURVEY.md §5 "fuse per-point MLP over
N points + masked mean-pooling into one Pallas kernel"); training mode
(batch-stat BN) keeps the XLA path, whose inter-layer global reductions
cannot fuse this way.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_batchnorm(
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold eval-mode BatchNorm into the preceding dense layer.

    ``BN(xW + b) = (xW + b − μ)·γ/√(σ²+ε) + β = x(W·s) + (b − μ)·s + β``
    with ``s = γ/√(σ²+ε)``.
    """
    s = scale / jnp.sqrt(var + eps)
    return kernel * s[None, :], (bias - mean) * s + bn_bias


_FRAMES_PER_STEP = 8  # sublane-aligned output tile (8, D)


def _elu(x: jnp.ndarray) -> jnp.ndarray:
    """ELU without expm1 (unimplemented in the Mosaic TPU lowering)."""
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _pointnet_kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, out_ref, *,
                     precision=None):
    """8 frames per step: (8, N, C) → pooled (8, D).

    The 8 frames' points are flattened into one (8·N, C) row block so each
    layer is a single MXU matmul; the per-frame mean is a reshape + axis
    reduction at the end, all in VMEM.

    ``precision``: forwarded to the MXU matmuls. DEFAULT (single bf16
    passes) is the only setting that reaches this kernel — HIGHEST is
    routed to the folded-XLA fallback by ``pointnet_pool_infer`` (the
    multi-pass f32 schedule OOMs the 16 MiB scoped VMEM at reference dims;
    see that guard's comment).
    """
    frames, n, c = x_ref.shape
    h = x_ref[:].reshape(frames * n, c)
    for w, b in ((w1, b1), (w2, b2), (w3, b3), (w4, b4)):
        h = jax.lax.dot_general(
            h,
            w[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        h = _elu(h + b[:])
    out_ref[:] = jnp.mean(h.reshape(frames, n, -1), axis=1)


# Largest single-step working set verified on a real v5e (2026-08-16 drive):
# N=2048 at D=1024 (fps·N·D·4 = 64 MiB nominal — Mosaic tiles/spills
# internally and matches XLA bit-for-bit through N=2048). The guard is
# pinned AT that tested ceiling: beyond it the fused path is unproven, and
# the folded-XLA fallback is the same math, so there is nothing to gain
# from admitting untested sizes.
_WORKSET_BUDGET_BYTES = 64 * 1024 * 1024
_MIN_GRID_STEPS = 4  # grid < 4 crashes the Mosaic compile on this toolchain


def fits_vmem(n: int, c: int, d: int, fps: int = _FRAMES_PER_STEP) -> bool:
    """Whether the fused kernel handles this N/D (else: folded-XLA fallback).

    Empirically calibrated on a real v5e (see drive log in git history /
    RESULTS_SYNTHETIC.md): the Mosaic compiler tiles the chain's wide
    intermediate internally, so N=150..2048 at D=1024 all compile AND match
    the XLA reference exactly; the budget equals that largest tested
    working set. (An analytic 16 MiB VMEM model would wrongly reject even
    the known-good reference dims.) ``c`` (input width) is accepted for
    call-site symmetry but doesn't enter the estimate — the D-wide
    intermediate dominates the working set at any plausible C.
    """
    return fps * n * d * 4 <= _WORKSET_BUDGET_BYTES


def _pointnet_pool_xla(
    x: jnp.ndarray, folded: Dict[str, jnp.ndarray], precision=None
) -> jnp.ndarray:
    """Folded-XLA fallback: identical math, per-layer activations in HBM."""
    h = x.astype(jnp.float32)
    for i in range(1, 5):
        h = jax.nn.elu(
            jnp.einsum(
                "btnc,cd->btnd",
                h,
                folded[f"w{i}"].astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            + folded[f"b{i}"].astype(jnp.float32)
        )
    return jnp.mean(h, axis=2)


def _is_highest(precision) -> bool:
    """True when ``precision`` requests full-f32 multi-pass MXU matmuls."""
    if precision is None:
        return False
    if isinstance(precision, tuple):
        return any(_is_highest(p) for p in precision)
    if isinstance(precision, str):
        return precision.lower() == "highest"
    return precision == jax.lax.Precision.HIGHEST


def pointnet_pool_infer(
    x: jnp.ndarray, folded: Dict[str, jnp.ndarray], precision=None
) -> jnp.ndarray:
    """Fused eval PointNet+pool: ``(B, T, N, C) → (B, T, D)``.

    ``folded``: dict with ``w1..w4`` / ``b1..b4`` — BN-folded layer weights
    (see :func:`fold_batchnorm`). Self-guarding: point counts whose working
    set exceeds VMEM fall back to the folded-XLA path.
    """
    b, t, n, c = x.shape
    d = folded["w4"].shape[1]
    f_steps = -(-(b * t) // _FRAMES_PER_STEP)
    # grid < _MIN_GRID_STEPS crashes the real Mosaic compile (observed on
    # v5e: grids 1-3 → tpu_compile_helper exit 1; 4+ fine) — CPU interpret
    # mode is unaffected, so that guard only bites on hardware. Over-budget
    # N falls back everywhere — same math either way.
    # HIGHEST precision also falls back: the multi-pass f32 MXU schedule
    # needs split-operand scratch that ~3×es the kernel's scoped-VMEM
    # working set (measured: 23.96 MiB vs the 16 MiB limit at the reference
    # dims N=150/D=1024/8-frame tiles — Mosaic stack OOM at compile), while
    # the folded-XLA chain takes `precision` natively and the exact-parity
    # eval pass that requests it is tunnel-dispatch-bound anyway.
    on_hw = jax.devices()[0].platform != "cpu"
    if (
        (on_hw and f_steps < _MIN_GRID_STEPS)
        or not fits_vmem(n, c, d)
        or _is_highest(precision)
    ):
        return _pointnet_pool_xla(x, folded, precision)
    f = b * t
    fps = _FRAMES_PER_STEP
    f_pad = -(-f // fps) * fps
    xf = x.reshape(f, n, c).astype(jnp.float32)
    if f_pad != f:
        xf = jnp.concatenate(
            [xf, jnp.zeros((f_pad - f, n, c), jnp.float32)], axis=0
        )

    weight_specs = []
    weight_args = []
    for i in range(1, 5):
        w = folded[f"w{i}"].astype(jnp.float32)
        bb = folded[f"b{i}"].astype(jnp.float32).reshape(1, -1)
        weight_specs += [
            pl.BlockSpec(w.shape, lambda i_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bb.shape, lambda i_: (0, 0), memory_space=pltpu.VMEM),
        ]
        weight_args += [w, bb]

    out = pl.pallas_call(
        functools.partial(_pointnet_kernel, precision=precision),
        grid=(f_pad // fps,),
        in_specs=[
            pl.BlockSpec(
                (fps, n, c), lambda i_: (i_, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        + weight_specs,
        out_specs=pl.BlockSpec(
            (fps, d), lambda i_: (i_, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((f_pad, d), jnp.float32),
    )(xf, *weight_args)
    return out[:f].reshape(b, t, d)


def folded_pointnet_params(pn_params: Dict, pn_stats: Dict) -> Dict[str, jnp.ndarray]:
    """Fold a PointNetBlock's flax variables into kernel weights.

    ``pn_params``/``pn_stats``: the ``PointNetBlock_0`` subtrees of the
    encoder's params / batch_stats collections.
    """
    out = {}
    for i in range(4):
        dense = pn_params[f"TorchDense_{i}"]
        bn = pn_params[f"TorchBatchNorm_{i}"]
        stats = pn_stats[f"TorchBatchNorm_{i}"]
        w, b = fold_batchnorm(
            dense["kernel"],
            dense["bias"],
            bn["scale"],
            bn["bias"],
            stats["mean"],
            stats["var"],
        )
        out[f"w{i + 1}"] = w
        out[f"b{i + 1}"] = b
    return out
