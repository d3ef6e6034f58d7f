"""Framework (flax) → reference (torch) weight transplantation.

Maps trained framework parameter trees onto the REFERENCE's actual torch
module ``state_dict`` key spaces (``/root/reference/models.py``), so the
reference's own inference scripts can be run on framework-trained weights —
the shared-weights decision-parity measurement (round-2 VERDICT item 2) and
the common-random-numbers twin harness both build on this.

Layout notes (each verified by a round-trip check in the tools using this):

- torch ``Conv2d(1×1)`` weight ``(out, in, 1, 1)`` ↔ flax ``TorchDense``
  kernel ``(in, out)`` (reference ``models.py:21-28`` vs
  ``models/layers.py::TorchDense``);
- torch ``Conv1d`` weight ``(out, in, k)`` ↔ flax ``Conv_0`` kernel
  ``(k, in, out)``;
- torch BN ``weight/bias/running_mean/running_var`` ↔ flax
  ``scale/bias`` + batch_stats ``mean/var`` (``models/norm.py``);
- the ORCED decoder's flat output vector is interpreted ``(C, T, N)`` by
  the reference (``models.py:540-544`` ``view``) but ``(T, N, C)`` by the
  framework (``models/orced.py``), so the FINAL dense layer's output units
  must be permuted when transplanting a trained decoder across (the flat
  layout is learned, not canonical).
"""

from __future__ import annotations

import numpy as np


def _t(x):
    import torch

    return torch.tensor(np.asarray(x, dtype=np.float32))


def _bn_entries(prefix: str, scale_bias: dict, stats: dict) -> dict:
    import torch

    return {
        f"{prefix}.weight": _t(scale_bias["scale"]),
        f"{prefix}.bias": _t(scale_bias["bias"]),
        f"{prefix}.running_mean": _t(stats["mean"]),
        f"{prefix}.running_var": _t(stats["var"]),
        f"{prefix}.num_batches_tracked": torch.tensor(0, dtype=torch.long),
    }


def _linear_entries(prefix: str, dense: dict) -> dict:
    return {
        f"{prefix}.weight": _t(np.asarray(dense["kernel"]).T),
        f"{prefix}.bias": _t(dense["bias"]),
    }


def _backbone_entries(params: dict, stats: dict) -> dict:
    """pc_block + tc_block keys shared by CGEncoder and ORCEDEncoder."""
    sd = {}
    pn_p = params["GaitBackbone_0"]["PointNetBlock_0"]
    pn_s = stats["GaitBackbone_0"]["PointNetBlock_0"]
    for i in range(4):
        w = np.asarray(pn_p[f"TorchDense_{i}"]["kernel"]).T  # (out, in)
        sd[f"pc_block.pointnet{i + 1}.module.0.weight"] = _t(
            w[:, :, None, None]
        )
        sd[f"pc_block.pointnet{i + 1}.module.0.bias"] = _t(
            pn_p[f"TorchDense_{i}"]["bias"]
        )
        sd.update(
            _bn_entries(
                f"pc_block.pointnet{i + 1}.module.1",
                pn_p[f"TorchBatchNorm_{i}"],
                pn_s[f"TorchBatchNorm_{i}"],
            )
        )
    tc_p = params["GaitBackbone_0"]["TemporalConvBlock_0"]
    tc_s = stats["GaitBackbone_0"]["TemporalConvBlock_0"]
    # TCN depth = len(DTC_FILTERS) (6 at reference dims; derived from the
    # tree so non-default configs map too)
    n_tcn = sum(k.startswith("CausalDilatedConv1d_") for k in tc_p)
    for i in range(n_tcn):
        conv = tc_p[f"CausalDilatedConv1d_{i}"]["Conv_0"]
        sd[f"tc_block.dtc{i + 1}.conv1d.weight"] = _t(
            np.asarray(conv["kernel"]).transpose(2, 1, 0)
        )
        sd[f"tc_block.dtc{i + 1}.conv1d.bias"] = _t(conv["bias"])
        sd.update(
            _bn_entries(
                f"tc_block.dtc{i + 1}.batch_norm",
                tc_p[f"CausalDilatedConv1d_{i}"]["TorchBatchNorm_0"],
                tc_s[f"CausalDilatedConv1d_{i}"]["TorchBatchNorm_0"],
            )
        )
    return sd


def cg_encoder_state_dict(enc_vars: dict, use_projection_head: bool) -> dict:
    """Framework ``CGEncoder`` vars → reference ``models.CGEncoder``
    state_dict (``models.py:232-292``)."""
    p, s = enc_vars["params"], enc_vars["batch_stats"]
    sd = _backbone_entries(p, s)
    sd.update(_linear_entries("MLP_sup1.0", p["MLP_sup1"]))
    if use_projection_head:
        sd.update(_linear_entries("MLP_head.0", p["MLP_head"]))
    sd.update(_linear_entries("MLP_sup2.0", p["MLP_sup2"]))
    return sd


def orced_encoder_state_dict(enc_vars: dict) -> dict:
    """Framework ``ORCEDEncoder`` vars → reference ``models.ORCEDEncoder``
    state_dict (``models.py:446-500``)."""
    p, s = enc_vars["params"], enc_vars["batch_stats"]
    sd = _backbone_entries(p, s)
    sd.update(_linear_entries("MLP_mu.0", p["MLP_mu"]))
    sd.update(_linear_entries("MLP_logvar.0", p["MLP_logvar"]))
    sd.update(_linear_entries("MLP_classification.0", p["MLP_classification"]))
    return sd


def decoder_output_permutation(nsteps: int, nmax: int, nfeatures: int) -> np.ndarray:
    """``perm[j_torch] = j_fw``: torch interprets the decoder's flat output
    as ``(C, T, N)`` (``models.py:540-544``), the framework as ``(T, N, C)``
    — permuting the final layer's output units by this makes the torch
    decoder emit the same point cloud as the framework decoder."""
    c, t, n = np.meshgrid(
        np.arange(nfeatures), np.arange(nsteps), np.arange(nmax), indexing="ij"
    )
    return (t * nmax * nfeatures + n * nfeatures + c).ravel()


def orced_decoder_state_dict(
    dec_vars: dict, nsteps: int, nmax: int, nfeatures: int
) -> dict:
    """Framework ``ORCEDDecoder`` params → reference ``models.ORCEDDecoder``
    dense weights (``models.py:503-545``), final layer output-permuted.

    Returns only the ``dense{1..5}`` entries; merge over a fresh torch
    module's state_dict to supply the forward-unused ``bn{1..4}`` keys."""
    p = dec_vars["params"]
    sd = {}
    for i in range(4):
        sd.update(_linear_entries(f"dense{i + 1}", p[f"TorchDense_{i}"]))
    w = np.asarray(p["TorchDense_4"]["kernel"]).T  # (out, in), fw unit order
    b = np.asarray(p["TorchDense_4"]["bias"])
    perm = decoder_output_permutation(nsteps, nmax, nfeatures)
    sd["dense5.weight"] = _t(w[perm])
    sd["dense5.bias"] = _t(b[perm])
    return sd


def mean_learner_state_dict(ml_vars: dict) -> dict:
    """Framework ``GaussianMeanLearner`` vars → reference
    ``models.GaussianMeanLearner`` state_dict (``models.py:424-443``)."""
    p, s = ml_vars["params"], ml_vars["batch_stats"]
    sd = {}
    for i, li in enumerate((0, 3, 6)):
        sd.update(_linear_entries(f"model.{li}", p[f"TorchDense_{i}"]))
        sd.update(
            _bn_entries(
                f"model.{li + 1}",
                p[f"TorchBatchNorm_{i}"],
                s[f"TorchBatchNorm_{i}"],
            )
        )
    sd.update(_linear_entries("model.9", p["TorchDense_3"]))
    return sd


def cg_discriminator_state_dict(params: dict) -> dict:
    """Framework ``CGDiscriminator`` params → reference
    ``models.CGDiscriminator`` state_dict (``models.py:405-421`` —
    ``Sequential(Linear, ELU, Linear, ELU, Linear)`` under ``model.``)."""
    sd = {}
    for i, li in enumerate((0, 2, 4)):
        sd.update(_linear_entries(f"model.{li}", params[f"TorchDense_{i}"]))
    return sd


def sequential_head_state_dict(params: dict) -> dict:
    """Framework ``ProjectionHead`` params → reference
    ``torch.nn.Sequential(Linear, ELU)`` head state_dict
    (``PCAA_ablation.py:778-786``)."""
    return _linear_entries("0", params["TorchDense_0"])


def decoder_bn_placeholder_entries(dec_mlp_size: int) -> dict:
    """Fresh-init ``bn1..bn4`` entries for the reference decoders.

    ``CGDecoder``/``ORCEDDecoder`` declare four ``BatchNorm1d`` modules that
    their ``forward`` never executes (``models.py:353-368,513-528`` vs
    ``:373-385,534-545``), so a strict ``load_state_dict`` demands the keys
    while their values are irrelevant to any computation — emit
    default-initialized entries (``weight=1, bias=0, mean=0, var=1``)."""
    import torch

    sd = {}
    for i in range(1, 5):
        width = dec_mlp_size // (2 ** (5 - i))
        sd[f"bn{i}.weight"] = torch.ones(width)
        sd[f"bn{i}.bias"] = torch.zeros(width)
        sd[f"bn{i}.running_mean"] = torch.zeros(width)
        sd[f"bn{i}.running_var"] = torch.ones(width)
        sd[f"bn{i}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)
    return sd


# ---------------------------------------------------------------------------
# Inverse direction: reference torch state_dicts → framework flax trees
# (used by the CRN twin harness to start both implementations from the SAME
# initialization).
# ---------------------------------------------------------------------------


def _n(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _torch_backbone_to_flax(sd: dict):
    """pc_block + tc_block state_dict entries → framework ``GaitBackbone_0``
    ``(params, batch_stats)`` subtrees (shared by the CG and ORCED encoders)."""
    pn_p, pn_s, tc_p, tc_s = {}, {}, {}, {}
    for i in range(4):
        pre = f"pc_block.pointnet{i + 1}.module"
        pn_p[f"TorchDense_{i}"] = {
            "kernel": _n(sd[f"{pre}.0.weight"])[:, :, 0, 0].T,
            "bias": _n(sd[f"{pre}.0.bias"]),
        }
        pn_p[f"TorchBatchNorm_{i}"] = {
            "scale": _n(sd[f"{pre}.1.weight"]),
            "bias": _n(sd[f"{pre}.1.bias"]),
        }
        pn_s[f"TorchBatchNorm_{i}"] = {
            "mean": _n(sd[f"{pre}.1.running_mean"]),
            "var": _n(sd[f"{pre}.1.running_var"]),
        }
    n_tcn = len({k.split(".")[1] for k in sd if k.startswith("tc_block.dtc")})
    for i in range(n_tcn):
        pre = f"tc_block.dtc{i + 1}"
        tc_p[f"CausalDilatedConv1d_{i}"] = {
            "Conv_0": {
                "kernel": _n(sd[f"{pre}.conv1d.weight"]).transpose(2, 1, 0),
                "bias": _n(sd[f"{pre}.conv1d.bias"]),
            },
            "TorchBatchNorm_0": {
                "scale": _n(sd[f"{pre}.batch_norm.weight"]),
                "bias": _n(sd[f"{pre}.batch_norm.bias"]),
            },
        }
        tc_s[f"CausalDilatedConv1d_{i}"] = {
            "TorchBatchNorm_0": {
                "mean": _n(sd[f"{pre}.batch_norm.running_mean"]),
                "var": _n(sd[f"{pre}.batch_norm.running_var"]),
            }
        }
    params = {
        "PointNetBlock_0": pn_p,
        "TemporalConvBlock_0": tc_p,
    }
    batch_stats = {
        "PointNetBlock_0": pn_s,
        "TemporalConvBlock_0": tc_s,
    }
    return params, batch_stats


def torch_cg_encoder_to_flax(sd: dict, use_projection_head: bool):
    """Reference ``models.CGEncoder`` state_dict → framework CGEncoder
    ``(params, batch_stats)`` trees (inverse of cg_encoder_state_dict)."""
    bb_p, bb_s = _torch_backbone_to_flax(sd)
    params = {
        "GaitBackbone_0": bb_p,
        "MLP_sup1": {
            "kernel": _n(sd["MLP_sup1.0.weight"]).T,
            "bias": _n(sd["MLP_sup1.0.bias"]),
        },
        "MLP_sup2": {
            "kernel": _n(sd["MLP_sup2.0.weight"]).T,
            "bias": _n(sd["MLP_sup2.0.bias"]),
        },
    }
    if use_projection_head:
        params["MLP_head"] = {
            "kernel": _n(sd["MLP_head.0.weight"]).T,
            "bias": _n(sd["MLP_head.0.bias"]),
        }
    return params, {"GaitBackbone_0": bb_s}


def torch_cg_decoder_to_flax(sd: dict, nsteps: int, nmax: int, nfeatures: int):
    """Reference ``models.CGDecoder`` dense weights → framework CGDecoder
    params, with the final layer's output units permuted so the framework's
    ``(T, N, C)`` flat interpretation emits the same clouds as the torch
    ``(C, T, N)`` view (``decoder_output_permutation``)."""
    params = {}
    for i in range(4):
        params[f"TorchDense_{i}"] = {
            "kernel": _n(sd[f"dense{i + 1}.weight"]).T,
            "bias": _n(sd[f"dense{i + 1}.bias"]),
        }
    w_t = _n(sd["dense5.weight"])  # (out_torch, in)
    b_t = _n(sd["dense5.bias"])
    perm = decoder_output_permutation(nsteps, nmax, nfeatures)
    k = np.empty_like(w_t.T)  # (in, out_fw)
    k[:, perm] = w_t.T
    b = np.empty_like(b_t)
    b[perm] = b_t
    params["TorchDense_4"] = {"kernel": k, "bias": b}
    return params


def torch_orced_encoder_to_flax(sd: dict):
    """Reference ``models.ORCEDEncoder`` state_dict → framework ORCEDEncoder
    ``(params, batch_stats)`` trees (inverse of orced_encoder_state_dict;
    same backbone as the CG encoder, μ/logvar/classification heads)."""
    bb_p, bb_s = _torch_backbone_to_flax(sd)
    params = {
        "GaitBackbone_0": bb_p,
        "MLP_mu": {
            "kernel": _n(sd["MLP_mu.0.weight"]).T,
            "bias": _n(sd["MLP_mu.0.bias"]),
        },
        "MLP_logvar": {
            "kernel": _n(sd["MLP_logvar.0.weight"]).T,
            "bias": _n(sd["MLP_logvar.0.bias"]),
        },
        "MLP_classification": {
            "kernel": _n(sd["MLP_classification.0.weight"]).T,
            "bias": _n(sd["MLP_classification.0.bias"]),
        },
    }
    return params, {"GaitBackbone_0": bb_s}


def torch_orced_decoder_to_flax(sd: dict, nsteps: int, nmax: int, nfeatures: int):
    """Reference ``models.ORCEDDecoder`` dense weights → framework
    ORCEDDecoder params — identical dense1..5 key space and flat-output
    permutation as the CG decoder (``models.py:503-545``)."""
    return torch_cg_decoder_to_flax(sd, nsteps, nmax, nfeatures)


def torch_mean_learner_to_flax(sd: dict):
    """Reference ``models.GaussianMeanLearner`` state_dict → framework
    GaussianMeanLearner ``(params, batch_stats)`` (inverse of
    mean_learner_state_dict)."""
    params, stats = {}, {}
    for i, li in enumerate((0, 3, 6)):
        params[f"TorchDense_{i}"] = {
            "kernel": _n(sd[f"model.{li}.weight"]).T,
            "bias": _n(sd[f"model.{li}.bias"]),
        }
        params[f"TorchBatchNorm_{i}"] = {
            "scale": _n(sd[f"model.{li + 1}.weight"]),
            "bias": _n(sd[f"model.{li + 1}.bias"]),
        }
        stats[f"TorchBatchNorm_{i}"] = {
            "mean": _n(sd[f"model.{li + 1}.running_mean"]),
            "var": _n(sd[f"model.{li + 1}.running_var"]),
        }
    params["TorchDense_3"] = {
        "kernel": _n(sd["model.9.weight"]).T,
        "bias": _n(sd["model.9.bias"]),
    }
    return params, stats


def torch_cg_discriminator_to_flax(sd: dict):
    """Reference ``models.CGDiscriminator`` → framework CGDiscriminator."""
    return {
        f"TorchDense_{i}": {
            "kernel": _n(sd[f"model.{li}.weight"]).T,
            "bias": _n(sd[f"model.{li}.bias"]),
        }
        for i, li in enumerate((0, 2, 4))
    }


def torch_sequential_head_to_flax(sd: dict):
    """``torch.nn.Sequential(Linear, ELU)`` head (``PCAA_ablation.py:778-786``)
    → framework ProjectionHead params."""
    return {
        "TorchDense_0": {
            "kernel": _n(sd["0.weight"]).T,
            "bias": _n(sd["0.bias"]),
        }
    }
