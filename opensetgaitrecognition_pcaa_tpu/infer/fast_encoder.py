"""Fused eval-mode CGEncoder forward for the inference hot path.

In eval mode every BatchNorm in the encoder is a per-channel affine with
frozen running stats, so the whole forward folds into:

    Pallas fused PointNet+pool  (ops/pallas/pointnet_infer.py)
    → 6 × (causal dilated conv, BN folded into kernel/bias, ELU)
    → mean over time
    → dense+ELU (+ projection head) → dense+ELU logits

This path reads the same flax variable tree the checkpoints store, matches
``CGEncoder.apply(..., train=False)`` to float tolerance (tested in
``tests/test_pallas.py``/``tests/test_infer.py``), and avoids materializing
the ``(B, T, N, D)`` per-point activations in HBM.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from opensetgaitrecognition_pcaa_tpu.ops.pallas.pointnet_infer import (
    fold_batchnorm,
    folded_pointnet_params,
    pointnet_pool_infer,
)


def _backbone_eval(
    params: Dict,
    stats: Dict,
    x: jnp.ndarray,
    dilations,
    use_pallas: bool,
    precision=None,
) -> jnp.ndarray:
    """Shared eval-mode GaitBackbone: fused PointNet+pool → folded TCN →
    time pooling. ``(B, T, N, C) → (B, filters[-1])``.

    ``precision`` reaches every matmul/conv: on TPU, DEFAULT runs f32
    operands through single bf16 MXU passes; HIGHEST keeps full f32 — the
    decision-exact inference setting (see ``_pointnet_kernel`` note)."""
    bb_p = params["GaitBackbone_0"]
    bb_s = stats["GaitBackbone_0"]

    # --- PointNet + point pooling -------------------------------------
    folded_pn = folded_pointnet_params(
        bb_p["PointNetBlock_0"], bb_s["PointNetBlock_0"]
    )
    if use_pallas:
        h = pointnet_pool_infer(x, folded_pn, precision)  # (B, T, D)
    else:
        hh = x.astype(jnp.float32)
        for i in range(1, 5):
            hh = jax.nn.elu(
                jnp.einsum(
                    "btnc,cd->btnd",
                    hh,
                    folded_pn[f"w{i}"],
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                + folded_pn[f"b{i}"]
            )
        h = jnp.mean(hh, axis=2)

    # --- causal dilated TCN with folded BN ------------------------------
    tcb_p = bb_p["TemporalConvBlock_0"]
    tcb_s = bb_s["TemporalConvBlock_0"]
    for i, dilation in enumerate(dilations):
        layer = tcb_p[f"CausalDilatedConv1d_{i}"]
        bn = layer["TorchBatchNorm_0"]
        st = tcb_s[f"CausalDilatedConv1d_{i}"]["TorchBatchNorm_0"]
        kernel = layer["Conv_0"]["kernel"]  # (k, in, out)
        k = kernel.shape[0]
        folded_k, folded_b = fold_batchnorm(
            kernel.reshape(-1, kernel.shape[-1]),
            layer["Conv_0"]["bias"],
            bn["scale"],
            bn["bias"],
            st["mean"],
            st["var"],
        )
        folded_k = folded_k.reshape(kernel.shape)
        pad = (k - 1) * dilation
        hp = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
        h = jax.lax.conv_general_dilated(
            hp,
            folded_k,
            window_strides=(1,),
            padding="VALID",
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=precision,
        )
        h = jax.nn.elu(h + folded_b)

    return jnp.mean(h, axis=1)  # (B, filters[-1])


def fused_encoder_apply(
    enc_vars: Dict,
    x: jnp.ndarray,
    *,
    dilations=(1, 2, 4, 1, 2, 4),
    use_projection_head: bool,
    use_pallas: bool = True,
    precision=None,
):
    """Eval-mode CGEncoder forward → (logits, sup_fv).

    :param enc_vars: ``{"params": ..., "batch_stats": ...}`` as stored in
        ``<NAME>_E.msgpack``.
    :param use_pallas: route the PointNet stack through the fused kernel
        (set False on hosts without a TPU/interpreter).
    :param precision: matmul/conv precision; ``"highest"`` gives CPU-exact
        f32 decisions on TPU (see ``_backbone_eval``).
    """
    params = enc_vars["params"]
    feats = _backbone_eval(
        params, enc_vars["batch_stats"], x, dilations, use_pallas, precision
    )
    dot = lambda a, b: jnp.dot(a, b, precision=precision)  # noqa: E731
    sup1 = params["MLP_sup1"]
    sup_fv = jax.nn.elu(dot(feats, sup1["kernel"]) + sup1["bias"])
    hh = sup_fv
    if use_projection_head:
        head = params["MLP_head"]
        hh = jax.nn.elu(dot(hh, head["kernel"]) + head["bias"])
    sup2 = params["MLP_sup2"]
    logits = jax.nn.elu(dot(hh, sup2["kernel"]) + sup2["bias"])
    return logits, sup_fv


def fused_orced_encoder_apply(
    enc_vars: Dict,
    x: jnp.ndarray,
    key,
    *,
    dilations=(1, 2, 4, 1, 2, 4),
    use_pallas: bool = True,
    precision=None,
):
    """Eval-mode ORCEDEncoder forward → (logits, z, mu, logvar).

    Reparametrization still samples in eval (reference ``models.py:494-496``;
    same explicit ``key`` contract as the flax module's ``'reparam'`` stream
    — note the stream itself differs from flax's derived key, so latents
    match distributionally, not bitwise).
    """
    params = enc_vars["params"]
    feats = _backbone_eval(
        params, enc_vars["batch_stats"], x, dilations, use_pallas, precision
    )
    dot = lambda a, b: jnp.dot(a, b, precision=precision)  # noqa: E731
    mu = dot(feats, params["MLP_mu"]["kernel"]) + params["MLP_mu"]["bias"]
    logvar = (
        dot(feats, params["MLP_logvar"]["kernel"])
        + params["MLP_logvar"]["bias"]
    )
    eps = jax.random.normal(key, logvar.shape)
    z = mu + eps * jnp.exp(0.5 * logvar)
    cls = params["MLP_classification"]
    logits = dot(z, cls["kernel"]) + cls["bias"]
    return logits, z, mu, logvar
