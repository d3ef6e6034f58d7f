"""Export a FRAMEWORK run folder to the REFERENCE's torch run-folder contract.

The inverse of ``scripts/import_reference_run.py``: a framework-trained run
(``train/run_folder.py`` contract — ``config.json`` + per-module
``.msgpack`` + ``discriminator_means.npy``) converts into the folder layout
the reference's own tooling consumes (``inference_PCAA.py:60-115``,
``inference_ORCED.py:160-245``):

====================          =============================
framework input               reference output
====================          =============================
config.json                   config.pkl
<NAME>_E.msgpack              <NAME>_E.pt
<NAME>_G.msgpack              <NAME>_G.pt          (if present)
<NAME>_D.msgpack              <NAME>_D.pt          (PCAA only)
<NAME>_ML.msgpack             <NAME>_ML.pt         (if present)
<NAME>_GPH.msgpack            <NAME>_GPH.pt        (if present)
<NAME>_DPH.msgpack            <NAME>_DPH.pt        (if present)
discriminator_means.npy       discriminator_means.pt (PCAA only)
====================          =============================

so a user migrating INTO this framework can still hand trained runs back to
collaborators on the reference stack, and the reference's ``CGAAE_inference``
/ ``ORCED_inference`` run directly on framework-trained weights
(``tools/validate_export.py`` measures exactly that).

Layout conversion reuses the forward maps in ``tools/transplant.py`` (flax
trees → torch ``state_dict``s, incl. the decoder's flat-output ``(T,N,C)`` →
``(C,T,N)`` unit permutation); every exported module is ROUND-TRIP checked:
mapping the written ``state_dict`` back through the inverse direction must
reproduce the source msgpack tree bit-for-bit. The reference decoders also
declare four BatchNorm modules their ``forward`` never runs
(``models.py:353-368,513-528``) — strict ``load_state_dict`` demands the
keys, so fresh-init placeholders are synthesized
(``transplant.decoder_bn_placeholder_entries``).

``config.pkl`` is written WITHOUT requiring the reference checkout: the
reference pickles ``TRAIN_SCENARIOS`` as ``constants.SCENARIO`` members
(``PCAA_ablation.py:32-36``), so a value-identical stand-in enum registered
as ``constants.SCENARIO`` for the duration of the dump makes the stream
resolve to the reference's real enum at load time (and to the framework's
via the importer's tolerant unpickler). ORCED configs additionally carry the
loss-weight keys its driver injects (``train_ORCED.py:313-329``).

Usage::

    python scripts/export_reference_run.py --run models/MY_RUN \
        --out-models /path/to/reference/models

Model kind is auto-detected (``<NAME>_D.msgpack`` present → PCAA, else
ORCED — every PCAA variant saves a discriminator, ORCED never does,
``PCAA_ablation.py:1087-1119`` vs ``train_ORCED.py:255-276``).
"""

from __future__ import annotations

import argparse
import contextlib
import os
import pickle
import sys
import types
from enum import Enum

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from flax import traverse_util  # noqa: E402
from flax.serialization import to_state_dict  # noqa: E402

from opensetgaitrecognition_pcaa_tpu.config import SCENARIO, Config  # noqa: E402
from opensetgaitrecognition_pcaa_tpu.train.run_folder import (  # noqa: E402
    load_params,
    module_path,
)
from tools.transplant import (  # noqa: E402
    cg_discriminator_state_dict,
    cg_encoder_state_dict,
    decoder_bn_placeholder_entries,
    mean_learner_state_dict,
    orced_decoder_state_dict,
    orced_encoder_state_dict,
    sequential_head_state_dict,
    torch_cg_decoder_to_flax,
    torch_cg_discriminator_to_flax,
    torch_cg_encoder_to_flax,
    torch_mean_learner_to_flax,
    torch_orced_decoder_to_flax,
    torch_orced_encoder_to_flax,
    torch_sequential_head_to_flax,
)

# ---------------------------------------------------------------------------
# framework Config → reference config.pkl
# ---------------------------------------------------------------------------

# Base CONFIG key set every reference run folder carries
# (``constants.py:74-97``); values come from the same-named Config fields.
_BASE_KEYS = (
    "NMAX",
    "NSTEPS",
    "CROP_STEP",
    "NFEATURES",
    "POINTNET_OUT_DIM",
    "SUP_LATENT_DIM",
    "LR",
    "B1",
    "B2",
    "SUBSAMPLE_FACTOR",
    "EPOCHS",
    "BATCH_SIZE",
    "GP_WEIGHT",
    "ADV_WEIGHT",
    "MODEL_NAME",
    "NOTES",
    "CHECKPOINT_FREQUENCY",
    "SUPERVISION_FREQUENCY",
)

# Keys the reference's ORCED driver injects before pickling
# (``train_ORCED.py:313-329``).
_ORCED_KEYS = ("TRIPLET_W", "CE_W", "REC_W", "KL_W", "TRIPLET_MARGIN")


@contextlib.contextmanager
def _reference_scenario_cls():
    """Yield an enum class that pickles as ``constants.SCENARIO``.

    If the reference's ``constants`` module is already imported (parity
    tools run with the reference on ``sys.path``), its real enum is used.
    Otherwise a value-identical stand-in is registered under a temporary
    ``constants`` module entry — pickle's ``save_global`` identity check
    (``sys.modules['constants'].SCENARIO is cls``) requires the module to
    exist at DUMP time; at LOAD time the stream resolves against whatever
    ``constants.SCENARIO`` the consumer has (the reference's real enum, or
    the framework's via the importer's tolerant unpickler)."""
    mod = sys.modules.get("constants")
    if mod is not None and hasattr(mod, "SCENARIO"):
        yield mod.SCENARIO
        return
    standin = Enum("SCENARIO", {s.name: s.value for s in SCENARIO})
    standin.__module__ = "constants"
    standin.__qualname__ = "SCENARIO"
    fake = types.ModuleType("constants")
    fake.SCENARIO = standin
    sys.modules["constants"] = fake
    try:
        yield standin
    finally:
        # ``mod`` may be an unrelated caller module named ``constants`` that
        # simply lacked SCENARIO — put it back rather than deleting it (a
        # later ``import constants`` would otherwise re-execute the module
        # and break identity for everyone holding the original).
        if mod is not None:
            sys.modules["constants"] = mod
        elif sys.modules.get("constants") is fake:
            del sys.modules["constants"]


def framework_config_to_reference(cfg: Config, kind: str, scenario_cls) -> dict:
    """Framework ``Config`` → the reference CONFIG dict (plain python
    scalars, ``DTC_FILTERS``/``TRAIN_CLASSES`` as lists, scenarios as
    ``scenario_cls`` members)."""
    d = {k: getattr(cfg, k) for k in _BASE_KEYS}
    # DEC_MLP_SIZE must describe the SHIPPED decoder, not the framework
    # Config's raw field (which nothing maintains — the framework sizes its
    # decoders off the derived ``decoder_mlp_size`` property). The reference
    # derives it the same way (``constants.py:41``:
    # ``DEC_MLP_SIZE = NSTEPS * NMAX * NFEATURES``), so a consumer who sets
    # ``constants.DEC_MLP_SIZE`` from this pickle builds decoder Linears
    # matching the exported G.pt.
    d["DEC_MLP_SIZE"] = cfg.decoder_mlp_size
    d["DTC_FILTERS"] = list(cfg.DTC_FILTERS)
    d["TRAIN_CLASSES"] = [int(c) for c in cfg.TRAIN_CLASSES]
    d["TRAIN_SCENARIOS"] = [scenario_cls(s) for s in cfg.TRAIN_SCENARIOS]
    if kind == "orced":
        d.update({k: getattr(cfg, k) for k in _ORCED_KEYS})
    return d


def dump_reference_config(cfg: Config, kind: str, path: str) -> None:
    with _reference_scenario_cls() as scenario_cls:
        with open(path, "wb") as f:
            pickle.dump(framework_config_to_reference(cfg, kind, scenario_cls), f)


# ---------------------------------------------------------------------------
# module export + round-trip verification
# ---------------------------------------------------------------------------


def _flat(tree) -> dict:
    return traverse_util.flatten_dict(to_state_dict(tree))


def _assert_roundtrip(source_tree, recovered_tree, tag: str) -> None:
    """inverse(forward(tree)) must be the tree, bit-for-bit."""
    fs, fr = _flat(source_tree), _flat(recovered_tree)
    if set(fs) != set(fr):
        missing = sorted(".".join(k) for k in set(fs) - set(fr))
        extra = sorted(".".join(k) for k in set(fr) - set(fs))
        raise AssertionError(
            f"{tag}: round-trip key mismatch (missing: {missing or '-'}; "
            f"unexpected: {extra or '-'})"
        )
    for k in fs:
        a = np.asarray(fs[k], dtype=np.float32)
        b = np.asarray(fr[k], dtype=np.float32)
        if not np.array_equal(a, b):
            raise AssertionError(
                f"{tag}: round-trip mismatch at {'.'.join(k)} "
                f"(max |delta| {np.max(np.abs(a - b)):.3e})"
            )


def _save_pt(sd: dict, path: str) -> None:
    import torch

    torch.save(sd, path)


def detect_kind(run_dir: str, name: str) -> str:
    """PCAA run folders hold a discriminator checkpoint, ORCED never does
    (``PCAA_ablation.py:1087-1119`` vs ``train_ORCED.py:255-276``)."""
    return "pcaa" if os.path.exists(module_path(run_dir, name, "D")) else "orced"


def _load_run_config(run_dir: str) -> Config:
    cfg = Config.load(os.path.join(run_dir, "config.json"))
    name = os.path.basename(os.path.normpath(run_dir))
    if cfg.MODEL_NAME != name:
        raise ValueError(
            f"config.json MODEL_NAME={cfg.MODEL_NAME!r} does not match the "
            f"run folder name {name!r}"
        )
    return cfg


def export_pcaa_run(run_dir: str, out_dir: str) -> str:
    """Framework PCAA run folder (any variant) → reference run folder at
    ``<out_dir>/<NAME>``; returns the exported folder path."""
    cfg = _load_run_config(run_dir)
    name = cfg.MODEL_NAME
    dst = os.path.join(out_dir, name)
    os.makedirs(dst, exist_ok=True)
    dump_reference_config(cfg, "pcaa", os.path.join(dst, "config.pkl"))

    def _msg(tag):
        return module_path(run_dir, name, tag)

    def _pt(tag):
        return os.path.join(dst, f"{name}_{tag}.pt")

    enc_vars = load_params(_msg("E"))
    use_head = "MLP_head" in enc_vars["params"]
    enc_sd = cg_encoder_state_dict(enc_vars, use_projection_head=use_head)
    p, s = torch_cg_encoder_to_flax(enc_sd, use_projection_head=use_head)
    _assert_roundtrip(enc_vars, {"params": p, "batch_stats": s}, "E")
    _save_pt(enc_sd, _pt("E"))

    disc = load_params(_msg("D"))["params"]
    disc_sd = cg_discriminator_state_dict(disc)
    _assert_roundtrip(disc, torch_cg_discriminator_to_flax(disc_sd), "D")
    _save_pt(disc_sd, _pt("D"))

    if os.path.exists(_msg("G")):  # V3 trains without a decoder
        dec = load_params(_msg("G"))["params"]
        dec_sd = orced_decoder_state_dict(
            {"params": dec}, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES
        )
        _assert_roundtrip(
            dec,
            torch_cg_decoder_to_flax(dec_sd, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES),
            "G",
        )
        dec_sd.update(decoder_bn_placeholder_entries(cfg.decoder_mlp_size))
        _save_pt(dec_sd, _pt("G"))

    for tag in ("GPH", "DPH"):
        if os.path.exists(_msg(tag)):
            head = load_params(_msg(tag))["params"]
            head_sd = sequential_head_state_dict(head)
            _assert_roundtrip(head, torch_sequential_head_to_flax(head_sd), tag)
            _save_pt(head_sd, _pt(tag))

    if os.path.exists(_msg("ML")):  # V1's learned-centroid mean learner
        ml_vars = load_params(_msg("ML"))
        ml_sd = mean_learner_state_dict(ml_vars)
        mp, ms = torch_mean_learner_to_flax(ml_sd)
        _assert_roundtrip(ml_vars, {"params": mp, "batch_stats": ms}, "ML")
        _save_pt(ml_sd, _pt("ML"))

    import torch

    means = np.load(os.path.join(run_dir, "discriminator_means.npy"))
    want = (cfg.n_classes, cfg.SUP_LATENT_DIM)
    if means.shape != want:
        raise ValueError(
            f"discriminator_means shape {means.shape} does not match the "
            f"config-declared {want}"
        )
    torch.save(
        torch.tensor(np.asarray(means, dtype=np.float32)),
        os.path.join(dst, "discriminator_means.pt"),
    )
    return dst


def export_orced_run(run_dir: str, out_dir: str) -> str:
    """Framework ORCED run folder (E/G/ML) → reference run folder."""
    cfg = _load_run_config(run_dir)
    name = cfg.MODEL_NAME
    dst = os.path.join(out_dir, name)
    os.makedirs(dst, exist_ok=True)
    dump_reference_config(cfg, "orced", os.path.join(dst, "config.pkl"))

    enc_vars = load_params(module_path(run_dir, name, "E"))
    enc_sd = orced_encoder_state_dict(enc_vars)
    p, s = torch_orced_encoder_to_flax(enc_sd)
    _assert_roundtrip(enc_vars, {"params": p, "batch_stats": s}, "E")
    _save_pt(enc_sd, os.path.join(dst, f"{name}_E.pt"))

    dec = load_params(module_path(run_dir, name, "G"))["params"]
    dec_sd = orced_decoder_state_dict(
        {"params": dec}, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES
    )
    _assert_roundtrip(
        dec,
        torch_orced_decoder_to_flax(dec_sd, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES),
        "G",
    )
    dec_sd.update(decoder_bn_placeholder_entries(cfg.decoder_mlp_size))
    _save_pt(dec_sd, os.path.join(dst, f"{name}_G.pt"))

    ml_vars = load_params(module_path(run_dir, name, "ML"))
    ml_sd = mean_learner_state_dict(ml_vars)
    mp, ms = torch_mean_learner_to_flax(ml_sd)
    _assert_roundtrip(ml_vars, {"params": mp, "batch_stats": ms}, "ML")
    _save_pt(ml_sd, os.path.join(dst, f"{name}_ML.pt"))
    return dst


def export_reference_run(run_dir: str, out_dir: str) -> str:
    run_dir = os.path.normpath(run_dir)
    name = os.path.basename(run_dir)
    kind = detect_kind(run_dir, name)
    print(f"[export] {name}: detected {kind.upper()} run")
    if kind == "pcaa":
        return export_pcaa_run(run_dir, out_dir)
    return export_orced_run(run_dir, out_dir)


def main():
    p = argparse.ArgumentParser(
        description="Export a framework run folder to the reference's "
        "torch run-folder contract."
    )
    p.add_argument(
        "--run",
        required=True,
        help="framework run folder (models/<NAME>, holding config.json + "
        "<NAME>_*.msgpack)",
    )
    p.add_argument(
        "--out-models",
        required=True,
        help="destination models/ root; the run exports to "
        "<out-models>/<NAME>",
    )
    args = p.parse_args()
    dst = export_reference_run(args.run, args.out_models)
    print(f"[export] wrote {dst}")


if __name__ == "__main__":
    main()
