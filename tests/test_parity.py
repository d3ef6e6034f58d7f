"""Numerical parity vs torch: transplant identical weights, compare outputs.

The reference is pure torch (SURVEY.md §0), and torch (CPU) is baked into
this image — so instead of re-deriving layer semantics on paper, these tests
build the torch equivalent of each block, copy its weights into the flax
modules, and require outputs to agree to float tolerance. This pins down:

- causal dilated conv == torch pad-both-sides-then-truncate (models.py:59-76)
- TorchBatchNorm == torch BatchNorm (biased/unbiased variance split,
  momentum convention, eval mode, running-stat updates)
- per-point Dense == torch Conv2d 1×1 (models.py:21-28)
- the full CGEncoder forward incl. the ELU-on-logits quirk
- CGDecoder == 5-layer MLP with no norm / no output activation
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from opensetgaitrecognition_pcaa_tpu.models import (
    CGDecoder,
    CGEncoder,
    TorchBatchNorm,
)
from opensetgaitrecognition_pcaa_tpu.models.layers import CausalDilatedConv1d

RTOL, ATOL = 2e-5, 2e-5


def t2n(t):
    return t.detach().numpy()


class TestBatchNormParity:
    def test_train_mode_and_running_stats(self):
        torch.manual_seed(0)
        c = 6
        tbn = nn.BatchNorm1d(c)
        tbn.weight.data.normal_()
        tbn.bias.data.normal_()
        x = np.random.default_rng(0).normal(size=(8, c)).astype(np.float32)

        bn = TorchBatchNorm()
        variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), use_running_average=False)
        variables = {
            "params": {"scale": jnp.array(t2n(tbn.weight)), "bias": jnp.array(t2n(tbn.bias))},
            "batch_stats": variables["batch_stats"],
        }

        # two consecutive train-mode steps; running stats accumulate
        for _ in range(2):
            out_t = tbn(torch.tensor(x))
            out_j, muts = bn.apply(
                variables, jnp.array(x), use_running_average=False,
                mutable=["batch_stats"],
            )
            variables = {"params": variables["params"], "batch_stats": muts["batch_stats"]}
            np.testing.assert_allclose(np.array(out_j), t2n(out_t), rtol=RTOL, atol=ATOL)

        np.testing.assert_allclose(
            np.array(variables["batch_stats"]["mean"]), t2n(tbn.running_mean),
            rtol=RTOL, atol=ATOL,
        )
        np.testing.assert_allclose(
            np.array(variables["batch_stats"]["var"]), t2n(tbn.running_var),
            rtol=RTOL, atol=ATOL,
        )

        # eval mode uses the accumulated stats
        tbn.eval()
        out_t = tbn(torch.tensor(x))
        out_j = bn.apply(variables, jnp.array(x), use_running_average=True)
        np.testing.assert_allclose(np.array(out_j), t2n(out_t), rtol=RTOL, atol=ATOL)

    def test_3d_batchnorm2d_equivalence(self):
        # BatchNorm2d over (B, C, T, N) == our trailing-channel norm on (B, T, N, C)
        torch.manual_seed(1)
        c = 5
        tbn = nn.BatchNorm2d(c)
        tbn.weight.data.normal_()
        x = np.random.default_rng(1).normal(size=(4, 7, 9, c)).astype(np.float32)
        out_t = tbn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

        bn = TorchBatchNorm()
        v = bn.init(jax.random.PRNGKey(0), jnp.array(x), use_running_average=False)
        v = {
            "params": {"scale": jnp.array(t2n(tbn.weight)), "bias": jnp.array(t2n(tbn.bias))},
            "batch_stats": v["batch_stats"],
        }
        out_j, _ = bn.apply(v, jnp.array(x), use_running_average=False, mutable=["batch_stats"])
        np.testing.assert_allclose(np.array(out_j), t2n(out_t), rtol=RTOL, atol=ATOL)


class TestCausalConvParity:
    @pytest.mark.parametrize("dilation", [1, 2, 4])
    def test_matches_torch_pad_truncate(self, dilation):
        torch.manual_seed(dilation)
        cin, cout, T, k = 8, 12, 30, 3
        pad = (k - 1) * dilation
        conv_t = nn.Conv1d(cin, cout, k, dilation=dilation, padding=pad)
        x = np.random.default_rng(dilation).normal(size=(4, T, cin)).astype(np.float32)
        # reference semantics: conv then drop trailing pad outputs,
        # BN train mode, ELU (models.py:73-79)
        bn_t = nn.BatchNorm1d(cout)
        h = conv_t(torch.tensor(x).permute(0, 2, 1))[:, :, :-pad]
        out_t = F.elu(bn_t(h)).permute(0, 2, 1)

        mod = CausalDilatedConv1d(features=cout, dilation=dilation)
        v = mod.init(jax.random.PRNGKey(0), jnp.array(x), train=False)
        # torch conv weight (out, in, k) → flax (k, in, out)
        kernel = t2n(conv_t.weight).transpose(2, 1, 0)
        params = {
            "Conv_0": {"kernel": jnp.array(kernel), "bias": jnp.array(t2n(conv_t.bias))},
            "TorchBatchNorm_0": v["params"]["TorchBatchNorm_0"],
        }
        out_j, _ = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            jnp.array(x), train=True, mutable=["batch_stats"],
        )
        np.testing.assert_allclose(np.array(out_j), t2n(out_t), rtol=RTOL, atol=1e-4)

    def test_causality(self):
        # perturbing frame t must not change outputs at frames < t
        mod = CausalDilatedConv1d(features=4, dilation=2)
        x = np.random.default_rng(0).normal(size=(1, 20, 3)).astype(np.float32)
        v = mod.init(jax.random.PRNGKey(0), jnp.array(x), train=False)
        base = np.array(mod.apply(v, jnp.array(x), train=False))
        x2 = x.copy()
        x2[0, 10] += 100.0
        pert = np.array(mod.apply(v, jnp.array(x2), train=False))
        np.testing.assert_array_equal(base[0, :10], pert[0, :10])
        assert np.any(base[0, 10:] != pert[0, 10:])


def build_torch_encoder(nfeat, pn_dim, filters, latent, n_cls, use_head):
    """Reference CGEncoder semantics in torch (models.py:232-292), built
    procedurally for weight-transplant parity testing."""
    torch.manual_seed(7)

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            dims = [nfeat, pn_dim // 2, pn_dim // 2, pn_dim, pn_dim]
            self.pn = nn.ModuleList(
                [nn.Conv2d(i, o, 1) for i, o in zip(dims[:-1], dims[1:])]
            )
            self.pn_bn = nn.ModuleList([nn.BatchNorm2d(o) for o in dims[1:]])
            chans = [pn_dim] + list(filters)
            dil = [1, 2, 4, 1, 2, 4]
            self.tcn = nn.ModuleList(
                [
                    nn.Conv1d(i, o, 3, dilation=d, padding=2 * d)
                    for i, o, d in zip(chans[:-1], chans[1:], dil)
                ]
            )
            self.tcn_bn = nn.ModuleList([nn.BatchNorm1d(o) for o in chans[1:]])
            self.pads = [2 * d for d in dil]
            self.sup1 = nn.Linear(filters[-1], latent)
            self.head = nn.Linear(latent, latent // 2) if use_head else None
            self.sup2 = nn.Linear(latent // 2 if use_head else latent, n_cls)

        def forward(self, x):  # (B, C, T, N)
            for conv, bn in zip(self.pn, self.pn_bn):
                x = F.elu(bn(conv(x)))
            h = x.mean(dim=3)
            for conv, bn, p in zip(self.tcn, self.tcn_bn, self.pads):
                h = F.elu(bn(conv(h)[:, :, :-p]))
            h = h.mean(dim=2)
            fv = F.elu(self.sup1(h))
            z = F.elu(self.head(fv)) if self.head is not None else fv
            return F.elu(self.sup2(z)), fv

    return Enc()


def transplant_encoder(tenc, jax_params, filters, use_head):
    """Copy torch weights into the flax CGEncoder param tree."""
    import copy

    p = copy.deepcopy(jax.device_get(jax_params))
    bb = p["GaitBackbone_0"]
    pnb = bb["PointNetBlock_0"]
    for i, (conv, bn) in enumerate(zip(tenc.pn, tenc.pn_bn)):
        pnb[f"TorchDense_{i}"]["kernel"] = t2n(conv.weight)[:, :, 0, 0].T
        pnb[f"TorchDense_{i}"]["bias"] = t2n(conv.bias)
        pnb[f"TorchBatchNorm_{i}"]["scale"] = t2n(bn.weight)
        pnb[f"TorchBatchNorm_{i}"]["bias"] = t2n(bn.bias)
    tcb = bb["TemporalConvBlock_0"]
    for i, (conv, bn) in enumerate(zip(tenc.tcn, tenc.tcn_bn)):
        c = tcb[f"CausalDilatedConv1d_{i}"]
        c["Conv_0"]["kernel"] = t2n(conv.weight).transpose(2, 1, 0)
        c["Conv_0"]["bias"] = t2n(conv.bias)
        c["TorchBatchNorm_0"]["scale"] = t2n(bn.weight)
        c["TorchBatchNorm_0"]["bias"] = t2n(bn.bias)
    p["MLP_sup1"]["kernel"] = t2n(tenc.sup1.weight).T
    p["MLP_sup1"]["bias"] = t2n(tenc.sup1.bias)
    if use_head:
        p["MLP_head"]["kernel"] = t2n(tenc.head.weight).T
        p["MLP_head"]["bias"] = t2n(tenc.head.bias)
    p["MLP_sup2"]["kernel"] = t2n(tenc.sup2.weight).T
    p["MLP_sup2"]["bias"] = t2n(tenc.sup2.bias)
    return jax.tree_util.tree_map(jnp.asarray, p)


class TestEncoderParity:
    @pytest.mark.parametrize("use_head", [True, False])
    def test_full_encoder_train_mode(self, use_head):
        nfeat, pn_dim, latent, n_cls = 4, 16, 8, 3
        filters = (4, 4, 8, 8, 8, 8)
        tenc = build_torch_encoder(nfeat, pn_dim, filters, latent, n_cls, use_head)
        enc = CGEncoder(
            n_out_labels=n_cls,
            sup_latent_dim=latent,
            pointnet_out_dim=pn_dim,
            dtc_filters=filters,
            use_projection_head=use_head,
        )
        x = np.random.default_rng(3).normal(size=(4, 10, 12, nfeat)).astype(np.float32)
        v = enc.init(jax.random.PRNGKey(0), jnp.array(x), train=False)
        params = transplant_encoder(tenc, v["params"], filters, use_head)

        # train mode
        tenc.train()
        logits_t, fv_t = tenc(torch.tensor(x).permute(0, 3, 1, 2))
        (logits_j, fv_j), _ = enc.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            jnp.array(x), train=True, mutable=["batch_stats"],
        )
        np.testing.assert_allclose(np.array(fv_j), t2n(fv_t), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.array(logits_j), t2n(logits_t), rtol=1e-3, atol=1e-4
        )

    def test_full_encoder_eval_mode_after_train_steps(self):
        nfeat, pn_dim, latent, n_cls = 4, 16, 8, 3
        filters = (4, 4, 8, 8, 8, 8)
        tenc = build_torch_encoder(nfeat, pn_dim, filters, latent, n_cls, True)
        enc = CGEncoder(
            n_out_labels=n_cls, sup_latent_dim=latent, pointnet_out_dim=pn_dim,
            dtc_filters=filters, use_projection_head=True,
        )
        rng = np.random.default_rng(4)
        x1 = rng.normal(size=(4, 10, 12, nfeat)).astype(np.float32)
        x2 = rng.normal(size=(4, 10, 12, nfeat)).astype(np.float32)
        v = enc.init(jax.random.PRNGKey(0), jnp.array(x1), train=False)
        params = transplant_encoder(tenc, v["params"], filters, True)
        bstats = v["batch_stats"]

        # a couple of train-mode passes accumulate running stats in both
        tenc.train()
        for xb in (x1, x2):
            tenc(torch.tensor(xb).permute(0, 3, 1, 2))
            _, muts = enc.apply(
                {"params": params, "batch_stats": bstats},
                jnp.array(xb), train=True, mutable=["batch_stats"],
            )
            bstats = muts["batch_stats"]

        tenc.eval()
        logits_t, fv_t = tenc(torch.tensor(x1).permute(0, 3, 1, 2))
        logits_j, fv_j = enc.apply(
            {"params": params, "batch_stats": bstats}, jnp.array(x1), train=False
        )
        np.testing.assert_allclose(np.array(fv_j), t2n(fv_t), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.array(logits_j), t2n(logits_t), rtol=1e-3, atol=1e-4
        )


class TestDecoderParity:
    def test_decoder_matches_torch_mlp(self):
        torch.manual_seed(9)
        latent2, T, N, C = 8, 6, 10, 4
        size = T * N * C
        sizes = [latent2, size // 16, size // 8, size // 4, size // 2, size]
        lins = [nn.Linear(i, o) for i, o in zip(sizes[:-1], sizes[1:])]

        dec = CGDecoder(nsteps=T, nmax_points=N, nfeatures=C)
        z = np.random.default_rng(5).normal(size=(3, latent2)).astype(np.float32)
        v = dec.init(jax.random.PRNGKey(0), jnp.array(z))
        params = jax.device_get(v["params"])
        for i, lin in enumerate(lins):
            params[f"TorchDense_{i}"]["kernel"] = t2n(lin.weight).T
            params[f"TorchDense_{i}"]["bias"] = t2n(lin.bias)
        params = jax.tree_util.tree_map(jnp.asarray, params)

        h = torch.tensor(z)
        for lin in lins[:-1]:
            h = F.elu(lin(h))
        out_t = lins[-1](h)  # flat; no output activation (models.py:373-385)
        out_j = dec.apply({"params": params}, jnp.array(z))
        np.testing.assert_allclose(
            np.array(out_j).reshape(3, -1), t2n(out_t), rtol=1e-4, atol=1e-5
        )
