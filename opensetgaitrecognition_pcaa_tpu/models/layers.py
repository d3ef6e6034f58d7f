"""Shared backbone layers: per-point MLP stack + causal dilated TCN.

TPU design notes:

- The reference implements its per-point MLP as ``Conv2d`` with 1×1 kernels
  over a ``(B, C, T, N)`` cube (``models.py:6-34``). A 1×1 conv over
  channels *is* a dense layer on the trailing feature axis; with the
  channels-last ``(B, T, N, C)`` layout the whole PointNet stack lowers to
  ``(B·T·N, C_in) @ (C_in, C_out)`` matmuls — exactly the large, batched
  contractions the 128×128 MXU wants (C dims here: 4→512→512→1024→1024).

- The reference builds causal temporal convs by over-padding both sides and
  slicing off the trailing outputs (``models.py:37-79``). Same operator,
  TPU-friendlier form: left-pad the time axis by ``(k-1)·dilation`` and run a
  VALID dilated conv — static shapes, no wasted compute on dropped outputs.

- Every layer takes a ``dtype`` (compute precision): parameters and
  BatchNorm statistics stay float32; matmul/conv operands are cast to
  ``dtype`` (bfloat16 doubles MXU throughput) with float32 accumulation via
  ``preferred_element_type``. Default float32 = reference-exact numerics.

Initializers follow torch defaults (kaiming-uniform with a=√5 ⇒
U(±1/√fan_in) for both kernel and bias) so training dynamics match the
reference even though RNG streams differ.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from opensetgaitrecognition_pcaa_tpu.models.norm import TorchBatchNorm

Dtype = Any


def torch_linear_init(fan_in: int):
    """torch ``nn.Linear``/``nn.Conv`` default init: U(-1/√fan_in, 1/√fan_in)."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


class TorchDense(nn.Module):
    """Dense layer with torch-default init; f32 params, ``dtype`` compute."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        init = torch_linear_init(fan_in)
        kernel = self.param("kernel", init, (fan_in, self.features))
        bias = self.param("bias", init, (self.features,))
        y = jnp.einsum(
            "...i,io->...o",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        # Activations are carried in the compute dtype (bf16 mode keeps the
        # big per-point tensors half-width in HBM); accumulation above is f32.
        return (y + bias).astype(self.dtype)


class PointNetBlock(nn.Module):
    """4 stacked per-point (Dense + BN + ELU) layers.

    Oracle: reference ``PointNetBlock`` (``models.py:82-105``): channels
    4 → D/2 → D/2 → D → D with D = POINTNET_OUT_DIM. BN statistics reduce
    over (batch, time, points) per channel, matching BatchNorm2d.

    Input/output: ``(B, T, N, C)``.
    """

    out_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        widths = (self.out_dim // 2, self.out_dim // 2, self.out_dim, self.out_dim)
        for w in widths:
            x = TorchDense(w, dtype=self.dtype)(x)
            x = TorchBatchNorm()(x, use_running_average=not train)
            x = nn.elu(x)
        return x


class CausalDilatedConv1d(nn.Module):
    """Causal dilated temporal conv + BN + ELU over ``(B, T, C)``.

    Oracle: reference ``DilTempConv1d`` (``models.py:37-79``). Causality via
    left-padding ``(k-1)·dilation`` zeros then a VALID conv (provably equal
    to the reference's pad-both-sides-and-truncate construction).
    """

    features: int
    dilation: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation
        fan_in = x.shape[-1] * self.kernel_size
        init = torch_linear_init(fan_in)
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            kernel_init=init,
            bias_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = TorchBatchNorm()(x, use_running_average=not train)
        return nn.elu(x)


class TemporalConvBlock(nn.Module):
    """6 stacked causal dilated convs, dilations (1,2,4,1,2,4), kernel 3.

    Oracle: reference ``TemporalConvolutionBlock`` (``models.py:108-160``),
    channels 1024 → 16 → 32 → 64 → 128 → 256 → 512.
    """

    filters: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    dilations: Tuple[int, ...] = (1, 2, 4, 1, 2, 4)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for f, d in zip(self.filters, self.dilations):
            x = CausalDilatedConv1d(features=f, dilation=d, dtype=self.dtype)(
                x, train
            )
        return x


class GaitBackbone(nn.Module):
    """PointNet stack → mean-pool points → TCN → mean-pool time.

    The shared encoder trunk of CGEncoder/ORCEDEncoder (reference
    ``models.py:239-249,279-284``; AvgPool2d/AvgPool1d over the full
    points/time extents are plain means here).

    ``(B, T, N, C)`` → ``(B, filters[-1])``.
    """

    pointnet_out_dim: int = 1024
    filters: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = PointNetBlock(self.pointnet_out_dim, dtype=self.dtype)(x, train)
        # pool over points in f32 (4500-point mean in bf16 loses precision)
        x = jnp.mean(x.astype(jnp.float32), axis=2)  # (B, T, D)
        x = TemporalConvBlock(self.filters, dtype=self.dtype)(x, train)
        return jnp.mean(x.astype(jnp.float32), axis=1)  # (B, filters[-1])
