"""Fused train-mode PointNet kernel: outputs AND gradients vs flax autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from opensetgaitrecognition_pcaa_tpu.models.layers import PointNetBlock
from opensetgaitrecognition_pcaa_tpu.ops.pallas.pointnet_train import (
    pointnet_pool_train,
)


def ref_forward(block, variables, x):
    """Unfused reference: train-mode PointNetBlock + mean pool, returning
    (pooled, batch means, batch vars) via the mutated running stats."""
    (out), muts = block.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    pooled = jnp.mean(out.astype(jnp.float32), axis=2)
    return pooled, muts["batch_stats"]


def params_from_flax(variables):
    p = variables["params"]
    out = []
    for i in range(4):
        d = p[f"TorchDense_{i}"]
        bn = p[f"TorchBatchNorm_{i}"]
        out.append((d["kernel"], d["bias"], bn["scale"], bn["bias"]))
    return tuple(out)


@pytest.fixture
def setup():
    rng = np.random.default_rng(0)
    B, T, N, C, D = 2, 3, 37, 4, 16  # N chosen so B*T*N % _ROWS != 0
    x = jnp.asarray(rng.normal(size=(B, T, N, C)).astype(np.float32))
    block = PointNetBlock(out_dim=D)
    variables = block.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN affine params
    params = jax.device_get(variables["params"])
    r2 = np.random.default_rng(1)
    for i in range(4):
        params[f"TorchBatchNorm_{i}"]["scale"] = (
            1.0 + 0.2 * r2.normal(size=params[f"TorchBatchNorm_{i}"]["scale"].shape)
        ).astype(np.float32)
        params[f"TorchBatchNorm_{i}"]["bias"] = (
            0.1 * r2.normal(size=params[f"TorchBatchNorm_{i}"]["bias"].shape)
        ).astype(np.float32)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": variables["batch_stats"],
    }
    return block, variables, x, (B, T, N)


class TestFusedTrainForward:
    def test_pooled_and_stats_match_flax(self, setup):
        block, variables, x, (B, T, N) = setup
        want_pooled, want_stats = ref_forward(block, variables, x)

        kparams = params_from_flax(variables)
        with pltpu.force_tpu_interpret_mode():
            got_pooled, means, variances = pointnet_pool_train(
                x, kparams, B, T, N
            )
        np.testing.assert_allclose(
            np.array(got_pooled), np.array(want_pooled), rtol=2e-4, atol=2e-5
        )
        # batch stats: flax running stats after one step from (0, 1) init:
        # mean' = 0.9*0 + 0.1*batch_mean ; var' = 0.9*1 + 0.1*unbiased_var
        n_rows = B * T * N
        for i in range(4):
            rs = want_stats[f"TorchBatchNorm_{i}"]
            np.testing.assert_allclose(
                0.1 * np.array(means[i]), np.array(rs["mean"]), rtol=1e-3, atol=1e-5
            )
            unbiased = np.array(variances[i]) * n_rows / (n_rows - 1)
            np.testing.assert_allclose(
                0.9 + 0.1 * unbiased, np.array(rs["var"]), rtol=1e-3, atol=1e-5
            )


class TestFusedTrainBackward:
    def test_grads_match_flax_autodiff(self, setup):
        block, variables, x, (B, T, N) = setup
        cotangent = jnp.asarray(
            np.random.default_rng(2)
            .normal(size=(B, T, 16))
            .astype(np.float32)
        )

        def ref_loss(params, x):
            (out), _ = block.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            pooled = jnp.mean(out.astype(jnp.float32), axis=2)
            return jnp.sum(pooled * cotangent)

        want_gp, want_gx = jax.grad(ref_loss, argnums=(0, 1))(
            variables["params"], x
        )

        kparams = params_from_flax(variables)

        def fused_loss(kparams, x):
            pooled, _, _ = pointnet_pool_train(x, kparams, B, T, N)
            return jnp.sum(pooled * cotangent)

        with pltpu.force_tpu_interpret_mode():
            got_gp, got_gx = jax.grad(fused_loss, argnums=(0, 1))(kparams, x)

        np.testing.assert_allclose(
            np.array(got_gx), np.array(want_gx), rtol=2e-3, atol=2e-4
        )
        for i in range(4):
            w_k = np.array(want_gp[f"TorchDense_{i}"]["kernel"])
            w_b = np.array(want_gp[f"TorchDense_{i}"]["bias"])
            w_s = np.array(want_gp[f"TorchBatchNorm_{i}"]["scale"])
            w_bb = np.array(want_gp[f"TorchBatchNorm_{i}"]["bias"])
            g_w, g_b, g_gamma, g_beta = [np.array(a) for a in got_gp[i]]
            np.testing.assert_allclose(g_w, w_k, rtol=2e-3, atol=2e-4, err_msg=f"W{i}")
            np.testing.assert_allclose(g_b, w_b, rtol=2e-3, atol=2e-4, err_msg=f"b{i}")
            np.testing.assert_allclose(g_gamma, w_s, rtol=2e-3, atol=2e-4, err_msg=f"gamma{i}")
            np.testing.assert_allclose(g_beta, w_bb, rtol=2e-3, atol=2e-4, err_msg=f"beta{i}")
