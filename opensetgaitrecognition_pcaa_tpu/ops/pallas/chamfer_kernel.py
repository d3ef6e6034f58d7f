"""Pallas TPU kernel: fused sequence-Chamfer distance.

The XLA path (``ops/chamfer.py``) materializes the ``(B, T, N, M)`` pairwise
distance tensor in HBM between the matmul and the min-reductions — 43 MB at
reference shapes, growing quadratically with cloud size (the framework's
production target allows N ≫ 150). This kernel fuses the distance matmul
and both min-reductions per ``(b, t)`` frame entirely in VMEM: HBM traffic
is just the two point clouds in and one scalar out per frame.

Forward only, wrapped in ``jax.custom_vjp``: the backward recomputes the
(argmin-hard) gradients with standard XLA ops — Chamfer's VJP needs the
argmin picks, which are cheap to rebuild and would otherwise have to be
stored. ``avg_out`` semantics match ``seq_chamfer`` (reference
``utils.py:98-107``).

MEASURED (v5e, B=16, T=30): forward — 2.89 vs 2.93 ms at N=150 and 3.06 vs
3.38 ms at N=512 (Pallas vs XLA; the fusion wins more as N grows);
forward+backward — the scatter-add recompute backward is slower than XLA's
native VJP (6.7 vs 5.1 ms at N=150), so the TRAINING path keeps
``ops/chamfer.py`` and this kernel serves forward-only consumers (e.g.
ORCED's per-sample reconstruction errors) and large-N inference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_FRAMES_PER_STEP = 8  # sublane-aligned output tile (Mosaic requires 8×…)


def _chamfer_frame_kernel(x_ref, y_ref, out_ref):
    """8 frames per step: bidirectional sum-of-min squared distances.

    x_ref: (8, N, C) gt points; y_ref: (8, M, C) pred points; out_ref: (8, 1).
    The per-frame N×M distance matrices live only in VMEM/registers.
    """
    frames = x_ref.shape[0]

    def frame_loss(fi, _):
        x = x_ref[fi]
        y = y_ref[fi]
        # Augmented-feature trick: fold the squared norms into the matmul so
        # the full distance matrix is ONE contraction — Mosaic cannot
        # relayout the (N,1)+(1,M) rank-1 broadcasts the naive xxᵀ+yyᵀ−2xyᵀ
        # formulation needs:
        #   [-2x, ‖x‖², 1] · [y, 1, ‖y‖²]ᵀ = ‖x‖² + ‖y‖² − 2x·y
        ones_x = jnp.ones((x.shape[0], 1), jnp.float32)
        ones_y = jnp.ones((y.shape[0], 1), jnp.float32)
        x_aug = jnp.concatenate(
            [-2.0 * x, jnp.sum(x * x, axis=1, keepdims=True), ones_x], axis=1
        )
        y_aug = jnp.concatenate(
            [y, ones_y, jnp.sum(y * y, axis=1, keepdims=True)], axis=1
        )
        p = jax.lax.dot_general(
            x_aug,
            y_aug,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, M) squared distances
        # keep reductions 2-D: Mosaic cannot relayout the 1-D intermediates
        loss_1 = jnp.sum(jnp.min(p, axis=0, keepdims=True))  # min over gt
        loss_2 = jnp.sum(jnp.min(p, axis=1, keepdims=True))  # min over pred
        # fori_loop (not unroll) so the (N, M) buffer is reused per frame —
        # 8 unrolled copies blow the 16 MB VMEM budget at N=1024. Vector
        # store: Mosaic cannot store scalars to VMEM.
        out_ref[pl.ds(fi, 1), :] = (loss_1 + loss_2).reshape(1, 1)
        return 0

    jax.lax.fori_loop(0, frames, frame_loss, 0)


def _chamfer_frames(gts_flat: jnp.ndarray, preds_flat: jnp.ndarray) -> jnp.ndarray:
    """→ (F,) per-frame chamfer sums for flattened (F, N, C) clouds."""
    f, n, c = gts_flat.shape
    m = preds_flat.shape[1]
    fps = _FRAMES_PER_STEP
    f_pad = -(-f // fps) * fps
    if f_pad != f:
        pad = ((0, f_pad - f), (0, 0), (0, 0))
        gts_flat = jnp.pad(gts_flat, pad)
        preds_flat = jnp.pad(preds_flat, pad)
    out = pl.pallas_call(
        _chamfer_frame_kernel,
        grid=(f_pad // fps,),
        in_specs=[
            pl.BlockSpec((fps, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fps, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fps, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),
    )(gts_flat, preds_flat)
    return out[:f, 0]


def _forward(preds: jnp.ndarray, gts: jnp.ndarray) -> jnp.ndarray:
    b, t = gts.shape[0], gts.shape[1]
    per_frame = _chamfer_frames(
        gts.reshape((b * t,) + gts.shape[2:]).astype(jnp.float32),
        preds.reshape((b * t,) + preds.shape[2:]).astype(jnp.float32),
    )
    return per_frame.reshape(b, t)


@jax.custom_vjp
def _chamfer_bt(preds, gts):
    """(B, T) per-frame chamfer sums, Pallas forward / XLA backward."""
    return _forward(preds, gts)


def _chamfer_bt_fwd(preds, gts):
    return _forward(preds, gts), (preds, gts)


def _chamfer_bt_bwd(res, g):
    preds, gts = res
    # Recompute distances + argmins with XLA ops to form the exact VJP of
    # min/sum: for each pred point j its nearest gt i* contributes
    # 2(y_j − x_{i*}); for each gt point i its nearest pred j* contributes
    # 2(x_i − y_{j*}) (and the mirrored terms for gts).
    x = gts.astype(jnp.float32)
    y = preds.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=-1)
    yy = jnp.sum(y * y, axis=-1)
    xy = jnp.einsum("btnc,btmc->btnm", x, y, preferred_element_type=jnp.float32)
    p = xx[..., :, None] + yy[..., None, :] - 2.0 * xy  # (B,T,N,M)

    n, m = x.shape[2], y.shape[2]
    i_star = jnp.argmin(p, axis=2)  # (B,T,M) nearest gt per pred
    j_star = jnp.argmin(p, axis=3)  # (B,T,N) nearest pred per gt

    g = g[..., None, None]  # (B,T,1,1) broadcast over points and channels

    x_near = jnp.take_along_axis(x, i_star[..., None], axis=2)  # (B,T,M,C)
    y_near = jnp.take_along_axis(y, j_star[..., None], axis=2)  # (B,T,N,C)

    # loss_1 terms (min over gt, summed over preds)
    d_y_1 = 2.0 * (y - x_near) * g
    # loss_2 terms (min over preds, summed over gts)
    d_x_2 = 2.0 * (x - y_near) * g

    # d loss_1 / d x: −2(y_j − x_{i*}) accumulated at i*
    bt_shape = x.shape[:2]
    d_x_1 = jnp.zeros_like(x)
    d_x_1 = d_x_1.at[
        jnp.arange(bt_shape[0])[:, None, None],
        jnp.arange(bt_shape[1])[None, :, None],
        i_star,
    ].add(-d_y_1)
    # d loss_2 / d y: −2(x_i − y_{j*}) accumulated at j*
    d_y_2 = jnp.zeros_like(y)
    d_y_2 = d_y_2.at[
        jnp.arange(bt_shape[0])[:, None, None],
        jnp.arange(bt_shape[1])[None, :, None],
        j_star,
    ].add(-d_x_2)

    d_preds = (d_y_1 + d_y_2).astype(preds.dtype)
    d_gts = (d_x_1 + d_x_2).astype(gts.dtype)
    return d_preds, d_gts


_chamfer_bt.defvjp(_chamfer_bt_fwd, _chamfer_bt_bwd)


# Above this many points per cloud the per-frame (N, M) distance matrix plus
# operands no longer fit the ~16 MB VMEM budget at 8 frames/step; fall back
# to the XLA path (a frame-tiled variant is the TODO for larger clouds).
_MAX_FUSED_POINTS = 640


def seq_chamfer_pallas(
    preds: jnp.ndarray, gts: jnp.ndarray, avg_out: bool = True
) -> jnp.ndarray:
    """Drop-in for ``ops.chamfer.seq_chamfer`` with the fused Pallas forward."""
    # Small grids are FINE for this kernel: the sibling pointnet kernel's
    # grids 1-3 Mosaic crash does NOT reproduce here — bench.py's fused
    # parity case runs (4, 6, N, 4) = grid 3 on the real chip every round
    # (BENCH_r02+ pallas_parity chamfer_fused_n150=true), and grid-1/2
    # shapes are exercised by the same check since round 3. No grid guard.
    if max(preds.shape[2], gts.shape[2]) > _MAX_FUSED_POINTS:
        from opensetgaitrecognition_pcaa_tpu.ops.chamfer import seq_chamfer

        return seq_chamfer(preds, gts, avg_out=avg_out)
    total = _chamfer_bt(preds, gts)
    if avg_out:
        return jnp.mean(total)
    return jnp.mean(total, axis=1)
