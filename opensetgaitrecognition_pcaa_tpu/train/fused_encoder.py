"""Functional train-mode CGEncoder forward with the fused PointNet kernel.

A pure function of the encoder's flax variable tree that reproduces
``CGEncoder.apply(..., train=True, mutable=['batch_stats'])`` exactly
(tested), but routes the per-point MLP stack + point pooling through the
fused Pallas pipeline (``ops/pallas/pointnet_train.py``) — halving HBM
traffic on the largest tensors of the training step.

Differentiation: the whole function is differentiable w.r.t. the ``params``
subtree through plain dict reads, so ``jax.grad``/``jax.vjp`` return
gradients in the exact flax tree structure — the trainer swaps this in for
``encoder.apply`` with no other changes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from opensetgaitrecognition_pcaa_tpu.ops.pallas.pointnet_train import (
    pointnet_pool_train,
)

_EPS = 1e-5
_MOMENTUM = 0.1


def _bn_train(x, scale, bias, reduce_axes):
    """Train-mode BN (torch semantics) → (out, batch_mean, batch_var)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=reduce_axes)
    var = jnp.mean((xf - mean) ** 2, axis=reduce_axes)
    inv = jax.lax.rsqrt(var + _EPS)
    out = (xf - mean) * (inv * scale) + bias
    return out.astype(x.dtype), mean, var


def _update_running(rs_mean, rs_var, mean, var, n):
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1 - _MOMENTUM) * rs_mean + _MOMENTUM * mean
    new_var = (1 - _MOMENTUM) * rs_var + _MOMENTUM * unbiased
    return new_mean, new_var


def fused_train_encoder_apply(
    params: Dict,
    batch_stats: Dict,
    x: jnp.ndarray,
    *,
    use_projection_head: bool,
    dilations=(1, 2, 4, 1, 2, 4),
    store_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """→ (logits, sup_fv, new_batch_stats); train-mode CGEncoder forward."""
    b, t, n, _ = x.shape
    bb_p = params["GaitBackbone_0"]
    bb_s = batch_stats["GaitBackbone_0"]
    pn_p = bb_p["PointNetBlock_0"]
    pn_s = bb_s["PointNetBlock_0"]

    # --- fused PointNet + pooling (Pallas) ------------------------------
    kparams = tuple(
        (
            pn_p[f"TorchDense_{i}"]["kernel"],
            pn_p[f"TorchDense_{i}"]["bias"],
            pn_p[f"TorchBatchNorm_{i}"]["scale"],
            pn_p[f"TorchBatchNorm_{i}"]["bias"],
        )
        for i in range(4)
    )
    pooled, pn_means, pn_vars = pointnet_pool_train(
        x, kparams, b, t, n, store_dtype
    )

    # fresh containers, same leaves; per-BN entries replaced below
    new_stats = jax.tree_util.tree_map(lambda a: a, batch_stats)
    n_rows = b * t * n
    for i in range(4):
        rs = pn_s[f"TorchBatchNorm_{i}"]
        m2, v2 = _update_running(
            rs["mean"], rs["var"], pn_means[i], pn_vars[i], n_rows
        )
        new_stats["GaitBackbone_0"]["PointNetBlock_0"][f"TorchBatchNorm_{i}"] = {
            "mean": m2,
            "var": v2,
        }

    # --- causal dilated TCN (tiny tensors; plain XLA) --------------------
    h = pooled  # (B, T, D)
    tcb_p = bb_p["TemporalConvBlock_0"]
    tcb_s = bb_s["TemporalConvBlock_0"]
    for i, dilation in enumerate(dilations):
        layer = tcb_p[f"CausalDilatedConv1d_{i}"]
        kernel = layer["Conv_0"]["kernel"]
        k = kernel.shape[0]
        pad = (k - 1) * dilation
        hp = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
        h = (
            jax.lax.conv_general_dilated(
                hp,
                kernel,
                window_strides=(1,),
                padding="VALID",
                rhs_dilation=(dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            + layer["Conv_0"]["bias"]
        )
        bn = layer["TorchBatchNorm_0"]
        h, mean, var = _bn_train(h, bn["scale"], bn["bias"], reduce_axes=(0, 1))
        h = jax.nn.elu(h)
        rs = tcb_s[f"CausalDilatedConv1d_{i}"]["TorchBatchNorm_0"]
        m2, v2 = _update_running(rs["mean"], rs["var"], mean, var, b * t)
        new_stats["GaitBackbone_0"]["TemporalConvBlock_0"][
            f"CausalDilatedConv1d_{i}"
        ]["TorchBatchNorm_0"] = {"mean": m2, "var": v2}

    feats = jnp.mean(h.astype(jnp.float32), axis=1)

    # --- heads ------------------------------------------------------------
    sup1 = params["MLP_sup1"]
    sup_fv = jax.nn.elu(feats @ sup1["kernel"] + sup1["bias"])
    hh = sup_fv
    if use_projection_head:
        head = params["MLP_head"]
        hh = jax.nn.elu(hh @ head["kernel"] + head["bias"])
    sup2 = params["MLP_sup2"]
    logits = jax.nn.elu(hh @ sup2["kernel"] + sup2["bias"])
    return logits, sup_fv, new_stats
