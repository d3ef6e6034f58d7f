"""Pallas TPU kernels: fused train-mode PointNet stack + point pooling.

Train-mode BatchNorm needs global batch statistics between layers, so the
eval-mode whole-stack fusion (``pointnet_infer.py``) is impossible — but the
per-layer HBM traffic can still be halved. The XLA schedule per layer is

    matmul → write y → read y (stats) → read y, write a (normalize+ELU)
    → next matmul reads a                                   ≈ 4 accesses/tensor

This pipeline's schedule is

    kernel_k: read y_{k-1} (normalize+ELU on the fly) → matmul → write y_k
              while accumulating Σy_k, Σy_k² per channel in VMEM scratch
                                                            ≈ 2 accesses/tensor

The per-point activations at reference dims are 73–295 MB per layer.

MEASURED RESULT (v5e, reference dims, bf16): the full train step runs at
707 w/s through this pipeline vs 848 w/s through the XLA path — XLA's own
fusion of matmul+BN+ELU with bf16 activations is already near
bandwidth-optimal here, and this pipeline's backward recomputes the
normalize+ELU that XLA's autodiff caches. The kernel stays in-tree
(correctness- and gradient-parity tested) behind ``Config.FUSED_POINTNET``
(default off); revisit if a Pallas backward with fused dgrad/wgrad lands.

The whole stack is wrapped in ``jax.custom_vjp``:
- forward: 4 fused kernels + a pooling kernel; residuals are the raw
  pre-BN outputs ``y_k`` (which the forward writes anyway) and the batch
  statistics;
- backward: exact train-mode BN backward (μ, σ² differentiated as functions
  of the batch) composed with the matmul VJPs, in plain XLA — verified
  against autodiff of the unfused stack to float tolerance.

Returns (pooled (B,T,D), new running stats) matching
``PointNetBlock`` + mean-pool semantics (reference ``models.py:82-105,242``).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_ROWS = 256  # row tile; keeps x/y/w tiles + double-buffering in VMEM at C=1024 f32


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _elu_grad_from_out(bn_out):
    """d ELU/d x expressed from the BN output value (pre-activation)."""
    return jnp.where(bn_out > 0, 1.0, jnp.exp(jnp.minimum(bn_out, 0.0)))


def _layer_kernel(
    x_ref, w_ref, b_ref, affine_ref, y_ref, stats_ref, acc_ref
):
    """One fused layer step over a row tile.

    x_ref: (R, C_in) raw previous-layer output (or the input for layer 0);
    affine_ref: (5, C_in) rows = (mean, inv_sigma, gamma, beta, act_flag)
    of the PREVIOUS layer's BN — identity with act_flag=0 for layer 0 (the
    raw input enters the first matmul unactivated, models.py:100-105);
    y_ref: (R, C_out) raw output; stats_ref: (2, C_out) final Σy/Σy²;
    acc_ref: (2, C_out) f32 scratch accumulator.
    """
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    x = x_ref[:].astype(jnp.float32)
    mean = affine_ref[0, :]
    inv = affine_ref[1, :]
    gamma = affine_ref[2, :]
    beta = affine_ref[3, :]
    act_flag = affine_ref[4, :]  # 0 → passthrough (layer 0), 1 → BN+ELU
    h_lin = (x - mean) * (inv * gamma) + beta
    h = jnp.where(act_flag > 0, _elu(h_lin), h_lin)

    y = jax.lax.dot_general(
        h.astype(w_ref.dtype),
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:]
    # activations stored in the kernel storage dtype (bf16 halves the HBM
    # traffic these kernels exist to save); stats accumulate in f32
    y_ref[:] = y.astype(y_ref.dtype)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[0, :] += jnp.sum(y, axis=0)
    acc_ref[1, :] += jnp.sum(y * y, axis=0)

    @pl.when(i == n_steps - 1)
    def _():
        stats_ref[:] = acc_ref[:]


def _fused_layer(x, w, b, affine, rows_valid, store_dtype):
    """x: (R_pad, C_in) → (y (R_pad, C_out) in ``store_dtype``, sums (2, C_out)).

    ``rows_valid`` rows are real; padding rows are zeros and the caller
    corrects the statistics (their constant contribution is subtracted on
    host — see ``_stats_from_sums``).
    """
    r_pad, c_in = x.shape
    c_out = w.shape[1]
    bb = b.reshape(1, -1)
    grid = r_pad // _ROWS
    w = w.astype(store_dtype)  # matmul operand dtype; f32 accumulation
    y, stats = pl.pallas_call(
        _layer_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, c_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, c_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, c_out), store_dtype),
            jax.ShapeDtypeStruct((2, c_out), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, c_out), jnp.float32)],
    )(x, w, bb, affine)
    return y, stats


def _identity_affine(c):
    return jnp.stack(
        [jnp.zeros(c), jnp.ones(c), jnp.ones(c), jnp.zeros(c), jnp.zeros(c)]
    ).astype(jnp.float32)


def _affine_rows(mean, var, gamma, beta):
    inv = jax.lax.rsqrt(var + _EPS)
    return jnp.stack(
        [mean, inv, gamma, beta, jnp.ones_like(mean)]
    ).astype(jnp.float32)


def _pool_kernel(y_ref, affine_ref, out_ref):
    """Final normalize+ELU + per-frame mean over points.

    y_ref: (F_TILE, N, D) raw last-layer outputs; out_ref: (F_TILE, D).
    """
    frames, n, d = y_ref.shape
    y = y_ref[:].reshape(frames * n, d).astype(jnp.float32)
    mean = affine_ref[0, :]
    inv = affine_ref[1, :]
    gamma = affine_ref[2, :]
    beta = affine_ref[3, :]
    h = _elu((y - mean) * (inv * gamma) + beta)  # last layer always activates
    out_ref[:] = jnp.mean(h.reshape(frames, n, d), axis=1)


def _fused_pool(y, affine, b, t, n):
    d = y.shape[-1]
    fps = 8
    f = b * t
    f_pad = -(-f // fps) * fps
    yf = y.reshape(f, n, d)
    if f_pad != f:
        yf = jnp.concatenate([yf, jnp.zeros((f_pad - f, n, d), yf.dtype)])
    out = pl.pallas_call(
        _pool_kernel,
        grid=(f_pad // fps,),
        in_specs=[
            pl.BlockSpec((fps, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fps, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, d), jnp.float32),
    )(yf, affine)
    return out[:f].reshape(b, t, d)


def _stats_from_sums(sums, n_valid, n_pad_rows, y_pad):
    """Batch mean/biased-var from kernel sums, corrected for padding rows.

    Row-padding makes every padded row of each layer a *constant* vector
    (zeros entering layer 0 become ``b₀``, which then propagates through
    each activation+matmul). The kernels count those rows in the sums;
    subtract their exact contribution ``n_pad_rows · y_pad``.
    """
    s1, s2 = sums[0], sums[1]
    if n_pad_rows:
        s1 = s1 - n_pad_rows * y_pad
        s2 = s2 - n_pad_rows * y_pad * y_pad
    mean = s1 / n_valid
    var = jnp.maximum(s2 / n_valid - mean * mean, 0.0)
    return mean, var


def _forward_impl(x, params: Sequence[Tuple], b, t, n, store_dtype=jnp.float32):
    """Runs the fused chain. Returns (pooled, ys, means, vars)."""
    rows = b * t * n
    r_pad = -(-rows // _ROWS) * _ROWS
    c_in0 = x.shape[-1]
    xf = x.reshape(rows, c_in0).astype(store_dtype)
    if r_pad != rows:
        xf = jnp.concatenate([xf, jnp.zeros((r_pad - rows, c_in0), store_dtype)])

    ys: List = []
    means: List = []
    variances: List = []
    affine = _identity_affine(c_in0)
    pad_act = jnp.zeros(c_in0)  # padded rows enter layer 0 as zeros
    h_in = xf
    for li, (w, bvec, gamma, beta) in enumerate(params):
        y, sums = _fused_layer(h_in, w, bvec, affine, rows, store_dtype)
        y_pad = pad_act @ w + bvec  # the constant each padded row became
        mean, var = _stats_from_sums(sums, rows, r_pad - rows, y_pad)
        ys.append(y)
        means.append(mean)
        variances.append(var)
        affine = _affine_rows(mean, var, gamma, beta)
        inv = jax.lax.rsqrt(var + _EPS)
        pad_act = _elu((y_pad - mean) * (inv * gamma) + beta)
        h_in = y

    pooled = _fused_pool(ys[-1][:rows], affine, b, t, n)
    return pooled, ys, means, variances


def _normalize_elu(y, mean, var, gamma, beta):
    inv = jax.lax.rsqrt(var + _EPS)
    return _elu((y - mean) * (inv * gamma) + beta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def pointnet_pool_train(x, params, b, t, n, store_dtype=jnp.float32):
    """Fused train-mode PointNet stack + mean-pool: ``(B,T,N,C) → (B,T,D)``.

    :param params: tuple of 4 layer tuples ``(W (Cin,Cout), b (Cout,),
        gamma (Cout,), beta (Cout,))``.
    :param store_dtype: dtype of the stored per-point activations (bf16
        halves the traffic that dominates this stage; stats/normalization
        stay f32).
    :returns: (pooled (B,T,D), batch_means tuple, batch_vars tuple) — the
        caller folds means/vars into the running statistics.
    """
    pooled, _, means, variances = _forward_impl(x, params, b, t, n, store_dtype)
    return pooled, tuple(means), tuple(variances)


def _fwd(x, params, b, t, n, store_dtype):
    pooled, ys, means, variances = _forward_impl(x, params, b, t, n, store_dtype)
    return (pooled, tuple(means), tuple(variances)), (
        x,
        params,
        ys,
        means,
        variances,
    )


def _bwd(b, t, n, store_dtype, res, cotangents):
    g_pooled = cotangents[0]  # gradients w.r.t. means/vars outputs are unused
    x, params, ys, means, variances = res
    rows = b * t * n

    # mean-pool backward: distribute over the N points of each frame
    d = ys[-1].shape[-1]
    g_h = jnp.broadcast_to(
        (g_pooled / n)[:, :, None, :], (b, t, n, d)
    ).reshape(rows, d)

    g_params = []
    for li in range(len(params) - 1, -1, -1):
        w, bvec, gamma, beta = params[li]
        y = ys[li][:rows].astype(jnp.float32)
        mean, var = means[li], variances[li]
        inv = jax.lax.rsqrt(var + _EPS)
        x_hat = (y - mean) * inv
        bn_out = x_hat * gamma + beta
        g_bn = g_h * _elu_grad_from_out(bn_out)

        g_gamma = jnp.sum(g_bn * x_hat, axis=0)
        g_beta = jnp.sum(g_bn, axis=0)
        # train-mode BN backward (μ, σ² are batch functions):
        m = rows
        g_y = (
            inv
            * gamma
            * (g_bn - g_beta / m - x_hat * (g_gamma / m))
        )

        # matmul backward: y = h_prev @ w + b
        if li == 0:
            h_prev = x.reshape(rows, -1).astype(jnp.float32)
        else:
            h_prev = _normalize_elu(
                ys[li - 1][:rows].astype(jnp.float32),
                means[li - 1],
                variances[li - 1],
                params[li - 1][2],
                params[li - 1][3],
            )
        # wgrad/dgrad in the storage dtype with f32 accumulation
        g_w = jnp.einsum(
            "rc,rd->cd",
            h_prev.astype(store_dtype),
            g_y.astype(store_dtype),
            preferred_element_type=jnp.float32,
        )
        g_b = jnp.sum(g_y, axis=0)
        g_params.append((g_w, g_b, g_gamma, g_beta))
        dgrad = jnp.einsum(
            "rd,cd->rc",
            g_y.astype(store_dtype),
            w.astype(store_dtype),
            preferred_element_type=jnp.float32,
        )
        if li > 0:
            g_h = dgrad
        else:
            g_x = dgrad.reshape(x.shape).astype(x.dtype)

    return g_x, tuple(reversed(g_params))


pointnet_pool_train.defvjp(_fwd, _bwd)
