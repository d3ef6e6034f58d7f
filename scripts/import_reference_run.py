"""Import a REFERENCE torch run folder into this framework's run-folder contract.

Reference training leaves ``models/<NAME>/`` holding a pickled config plus
per-module ``.pt`` state_dicts and the centroid tensor
(``PCAA_ablation.py:1087-1119``, ``train_AAE.py:340-360``,
``train_ORCED.py:255-276``, ``train_AAE.py:120-123``). This tool converts
such a folder into the framework contract (``train/run_folder.py``):

====================       =============================
reference input            framework output
====================       =============================
config.pkl                 config.json
<NAME>_E.pt                <NAME>_E.msgpack
<NAME>_G.pt                <NAME>_G.msgpack        (if present)
<NAME>_D.pt                <NAME>_D.msgpack        (PCAA only)
<NAME>_ML.pt               <NAME>_ML.msgpack       (if present)
<NAME>_GPH.pt              <NAME>_GPH.msgpack      (if present)
<NAME>_DPH.pt              <NAME>_DPH.msgpack      (if present)
discriminator_means.pt     discriminator_means.npy (PCAA only)
====================       =============================

so framework inference (``infer/pcaa.py``, ``infer/orced.py``), the grid
drivers' inference stages, and AOT serving export
(``scripts/export_serving.py``) all run directly on reference-trained
weights — the missing half of the migration story next to
``tools/transplant.py`` (framework → reference direction).

Weight-layout conversion reuses the inverse maps in ``tools/transplant.py``
(torch ``Conv2d(1x1)``/``Conv1d``/BN/Linear → flax trees, plus the decoder
flat-output ``(C,T,N)`` → ``(T,N,C)`` unit permutation) — the same maps the
CRN twin harness uses, whose forward composition was verified against the
reference's actual torch forward (``tools/decision_parity.py`` transplant
drift asserts). Each imported module is additionally ROUND-TRIP checked
here: mapping the imported flax tree back through the forward direction
must reproduce the loaded ``state_dict`` bit-for-bit.

``config.pkl`` unpickling does NOT require the reference checkout: the
pickle references ``constants.SCENARIO`` (reference ``constants.py:13-16``),
which a tolerant unpickler remaps onto the framework's value-identical
``SCENARIO`` enum when the reference module is absent.

Usage::

    python scripts/import_reference_run.py --ref-run /ref/models/PCAA_Abl2_V4.8.0 \
        --out-models models_imported [--data-path ...] [--gen-data-path ...]

Model kind is auto-detected (``<NAME>_D.pt`` present → PCAA, else ORCED;
every PCAA variant saves a discriminator, ORCED never does). ``<NAME>`` is
config.pkl's MODEL_NAME — the reference stems every ``.pt`` off it, so a
copied/renamed folder still detects and imports correctly.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import pickle
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opensetgaitrecognition_pcaa_tpu.config import (  # noqa: E402
    SCENARIO,
    SPLIT,
    Config,
)
from opensetgaitrecognition_pcaa_tpu.models import (  # noqa: E402
    CGDecoder,
    CGDiscriminator,
    CGEncoder,
    GaussianMeanLearner,
    ORCEDDecoder,
    ORCEDEncoder,
)
from opensetgaitrecognition_pcaa_tpu.models.pcaa import ProjectionHead  # noqa: E402
from opensetgaitrecognition_pcaa_tpu.train.run_folder import (  # noqa: E402
    module_path,
    save_params,
)
from tools.transplant import (  # noqa: E402
    cg_encoder_state_dict,
    mean_learner_state_dict,
    orced_decoder_state_dict,
    orced_encoder_state_dict,
    torch_cg_decoder_to_flax,
    torch_cg_discriminator_to_flax,
    torch_cg_encoder_to_flax,
    torch_mean_learner_to_flax,
    torch_orced_decoder_to_flax,
    torch_orced_encoder_to_flax,
    torch_sequential_head_to_flax,
)


# ---------------------------------------------------------------------------
# config.pkl → framework Config
# ---------------------------------------------------------------------------


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickle a reference ``config.pkl`` without the reference on sys.path.

    The pickle stream names ``constants.SCENARIO`` / ``constants.SPLIT``
    (enums pickle as ``cls(value)`` calls); when the reference's
    ``constants`` module is unavailable we substitute the framework enums,
    whose values are identical by construction (``config.py:19-33``)."""

    _SUBSTITUTES = {
        ("constants", "SCENARIO"): SCENARIO,
        ("constants", "SPLIT"): SPLIT,
    }

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ModuleNotFoundError, AttributeError):
            try:
                return self._SUBSTITUTES[(module, name)]
            except KeyError:
                raise pickle.UnpicklingError(
                    f"config.pkl references {module}.{name}, which is neither "
                    "importable nor a known reference enum"
                ) from None


def load_reference_config(path: str) -> dict:
    """→ the raw reference CONFIG dict from ``config.pkl``."""
    with open(path, "rb") as f:
        return _TolerantUnpickler(io.BytesIO(f.read())).load()


def reference_config_to_framework(ref_cfg: dict, **overrides) -> Config:
    """Reference CONFIG dict → framework ``Config``.

    Key names match one-for-one (``config.py`` docstring); this only
    normalizes python-level representation differences: scenario enums →
    value strings, numpy scalars → python numbers, wandb-only keys dropped
    (``Config.from_dict`` filters to known fields)."""
    d = {}
    for k, v in ref_cfg.items():
        if k == "TRAIN_SCENARIOS":
            v = [getattr(s, "value", str(s)) for s in v]
        elif k == "TRAIN_CLASSES":
            v = [int(c) for c in v]
        elif isinstance(v, np.generic):
            v = v.item()
        d[k] = v
    d.update(overrides)
    return Config.from_dict(d)


# ---------------------------------------------------------------------------
# module conversion + round-trip verification
# ---------------------------------------------------------------------------


def _assert_matches_config(tree, make_shapes, tag: str) -> None:
    """The converted tree must carry exactly the shapes the config-declared
    architecture produces. config.pkl and the .pt files normally agree (the
    reference writes both from one run), but a mixed-up/hand-edited folder
    would otherwise import "successfully" and then kill every consumer —
    inference builds modules FROM the config, so the mismatch surfaces as an
    opaque flax ScopeParamShapeError deep inside the first apply. Fail here
    with the offending entry spelled out instead."""
    import jax

    from flax import traverse_util
    from flax.serialization import to_state_dict

    want = traverse_util.flatten_dict(to_state_dict(jax.eval_shape(make_shapes)))
    got = traverse_util.flatten_dict(to_state_dict(tree))
    if set(got) != set(want):
        missing = sorted(".".join(k) for k in set(want) - set(got))
        extra = sorted(".".join(k) for k in set(got) - set(want))
        raise ValueError(
            f"{tag}: checkpoint entries do not match the config-declared "
            f"architecture (missing: {missing or '-'}; unexpected: "
            f"{extra or '-'}) — config.pkl and {tag}.pt disagree"
        )
    for k in want:
        if tuple(np.shape(got[k])) != tuple(want[k].shape):
            raise ValueError(
                f"{tag}: checkpoint shape {tuple(np.shape(got[k]))} at "
                f"{'.'.join(k)} does not match the config-declared "
                f"architecture's {tuple(want[k].shape)} — config.pkl and "
                f"{tag}.pt disagree (check TRAIN_CLASSES / SUP_LATENT_DIM / "
                "POINTNET_OUT_DIM / DTC_FILTERS / NSTEPS / NMAX / NFEATURES)"
            )


def _load_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v for k, v in sd.items()}


def _assert_roundtrip(
    original_sd: dict, rebuilt_sd: dict, tag: str, allowed_extra: tuple = ()
) -> None:
    """Every tensor the forward map emits must match the loaded state_dict
    bit-for-bit, and — the other direction — every loaded entry must be
    covered by the map, so a checkpoint from a modified reference with extra
    layers is refused instead of silently truncated. ``num_batches_tracked``
    is exempt (the forward map writes a fresh 0; the trained value is
    irrelevant to eval math); ``allowed_extra`` lists key prefixes the
    checkpoint legitimately carries beyond the map (the reference decoders'
    forward-unused ``bn1..4`` modules, ``models.py:353-368,513-528``)."""
    for k, v in rebuilt_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        a = np.asarray(v.detach().cpu().numpy(), dtype=np.float32)
        b = np.asarray(original_sd[k].detach().cpu().numpy(), dtype=np.float32)
        if not np.array_equal(a, b):
            raise AssertionError(
                f"{tag}: round-trip mismatch at {k} "
                f"(max |delta| {np.max(np.abs(a - b)):.3e})"
            )
    extra = sorted(
        k
        for k in original_sd
        if k not in rebuilt_sd
        and not k.endswith("num_batches_tracked")
        and not any(k.startswith(p) for p in allowed_extra)
    )
    if extra:
        raise ValueError(
            f"{tag}: checkpoint carries entries the reference module does "
            f"not declare ({extra}) — not a reference {tag} state_dict"
        )


def _head_roundtrip(original_sd: dict, params: dict, tag: str) -> None:
    """Inline forward check for ``Sequential(Linear, ELU)`` heads and the
    CGDiscriminator (no dedicated forward map in tools/transplant.py)."""
    import torch

    rebuilt = {}
    layer_keys = sorted(
        {k.split(".")[0] for k in original_sd if k.endswith(".weight")}, key=int
    )
    if len(layer_keys) != len(params):
        raise ValueError(
            f"{tag}: checkpoint declares {len(layer_keys)} Linear layers, the "
            f"converted head holds {len(params)} — not a reference {tag} "
            "state_dict"
        )
    for i, dense in enumerate(sorted(params, key=lambda s: int(s.split("_")[1]))):
        li = layer_keys[i]
        rebuilt[f"{li}.weight"] = torch.tensor(
            np.asarray(params[dense]["kernel"], dtype=np.float32).T
        )
        rebuilt[f"{li}.bias"] = torch.tensor(
            np.asarray(params[dense]["bias"], dtype=np.float32)
        )
    _assert_roundtrip(original_sd, rebuilt, tag)


@contextlib.contextmanager
def _staged_run_dir(final_dir: str):
    """Build the run folder in a sibling staging dir and promote it only on
    full success — a refused import must not leave a half-valid run folder
    behind (anything holding a ``config.json`` reads as a run to the grid
    drivers and result collectors). On failure the stage is removed and a
    pre-existing ``final_dir`` is left untouched.

    Crash-safety (advisor round 3): the stage is PID-suffixed so two
    concurrent imports of the same run name cannot rmtree each other's
    in-progress stage; callers write ``config.json`` LAST, which shrinks
    (not closes — advisor round 4) the orphan window: a SIGKILL between
    the ``config.json`` write and promotion leaves ``NAME.importing.<pid>``
    (or ``NAME.replaced``) holding a config.json, so run-folder scans must
    skip names containing ``.importing.`` / ending ``.replaced`` (the
    campaign drivers and collectors do). Promotion renames the old run
    aside before renaming the stage in — the unsafe window is one rename,
    not a full recursive delete."""
    stage = f"{final_dir}.importing.{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    try:
        yield stage
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    old = final_dir + ".replaced"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(final_dir):
        os.replace(final_dir, old)
    os.replace(stage, final_dir)
    shutil.rmtree(old, ignore_errors=True)


def import_pcaa_run(ref_run_dir: str, out_models: str, **cfg_overrides) -> Config:
    """Reference PCAA run folder (any variant) → framework run folder."""
    cfg = reference_config_to_framework(
        load_reference_config(os.path.join(ref_run_dir, "config.pkl")),
        MODELS_PATH=out_models,
        **cfg_overrides,
    )
    name = cfg.MODEL_NAME or os.path.basename(os.path.normpath(ref_run_dir))
    if not cfg.MODEL_NAME:
        cfg = cfg.replace(MODEL_NAME=name)
    with _staged_run_dir(cfg.run_dir()) as run_dir:
        _write_pcaa_modules(ref_run_dir, cfg, name, run_dir)
        # config.json is written LAST: an interrupted stage must never hold
        # the one file that makes a directory read as a run folder.
        cfg.save(os.path.join(run_dir, "config.json"))
    return cfg


def _write_pcaa_modules(
    ref_run_dir: str, cfg: Config, name: str, run_dir: str
) -> None:
    def _pt(tag):
        return os.path.join(ref_run_dir, f"{name}_{tag}.pt")

    # Encoder: projection-head presence is read off the checkpoint itself
    # (V1/V4 train with one, V2/V3/BASE without — PCAA_ablation.py:763-786).
    n, latent = cfg.n_classes, cfg.SUP_LATENT_DIM
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES), jnp.float32)
    z0 = jnp.zeros((1, latent), jnp.float32)

    enc_sd = _load_state_dict(_pt("E"))
    use_head = "MLP_head.0.weight" in enc_sd
    p, s = torch_cg_encoder_to_flax(enc_sd, use_projection_head=use_head)
    enc_vars = {"params": p, "batch_stats": s}
    _assert_roundtrip(enc_sd, cg_encoder_state_dict(enc_vars, use_head), "E")
    enc_mod = CGEncoder(
        n_out_labels=n,
        sup_latent_dim=latent,
        pointnet_out_dim=cfg.POINTNET_OUT_DIM,
        dtc_filters=tuple(cfg.DTC_FILTERS),
        use_projection_head=use_head,
    )
    _assert_matches_config(
        enc_vars, lambda: enc_mod.init(key, x0, train=False), "E"
    )
    save_params(enc_vars, module_path(run_dir, name, "E"))

    disc_sd = _load_state_dict(_pt("D"))
    bad = [k for k in disc_sd if "model." not in k]
    if bad:  # refuse explicitly — a bare split() would die with IndexError
        raise ValueError(
            f"D: keys without the reference's 'model.' prefix "
            f"(CGDiscriminator wraps an nn.Sequential named 'model'): {bad}"
        )
    disc_params = torch_cg_discriminator_to_flax(disc_sd)
    _head_roundtrip(
        {k.split("model.", 1)[1]: v for k, v in disc_sd.items()}, disc_params, "D"
    )
    _assert_matches_config(
        {"params": disc_params},
        lambda: CGDiscriminator().init(key, z0, jnp.zeros((1, n), jnp.float32)),
        "D",
    )
    save_params({"params": disc_params}, module_path(run_dir, name, "D"))

    # The decoder reads the GPH's 2*latent projection when one was trained,
    # the raw latent otherwise (train/pcaa.py:234, PCAA_ablation.py variant
    # wiring) — so its config-declared input width depends on GPH presence.
    dec_in = 2 * latent if os.path.exists(_pt("GPH")) else latent

    if os.path.exists(_pt("G")):  # V3 trains without a decoder
        dec_sd = _load_state_dict(_pt("G"))
        dec_params = torch_cg_decoder_to_flax(
            dec_sd, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES
        )
        _assert_roundtrip(
            dec_sd,
            orced_decoder_state_dict(
                {"params": dec_params}, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES
            ),
            "G",
            allowed_extra=("bn1.", "bn2.", "bn3.", "bn4."),
        )
        dec_mod = CGDecoder(
            nsteps=cfg.NSTEPS, nmax_points=cfg.NMAX, nfeatures=cfg.NFEATURES
        )
        _assert_matches_config(
            {"params": dec_params},
            lambda: {
                "params": dec_mod.init(
                    key, jnp.zeros((1, dec_in), jnp.float32)
                )["params"]
            },
            "G",
        )
        save_params({"params": dec_params}, module_path(run_dir, name, "G"))

    for tag, width in (("GPH", 2 * latent), ("DPH", latent)):
        if os.path.exists(_pt(tag)):
            head_sd = _load_state_dict(_pt(tag))
            if tag == "DPH" and tuple(head_sd["0.weight"].shape) == (
                latent,
                2 * latent,
            ):
                # The reference V4 declares its discriminator projection
                # head Linear(2*latent -> latent) but would feed it the
                # latent-dim sup_fv (PCAA_ablation.py:783-786 vs :934-936,
                # models.py MLP_sup1 out = SUP_LATENT_DIM) — the
                # proj_head_on_discriminator path cannot execute without a
                # shape error, so every complete reference V4 folder holds
                # this head at init, untrained and unused (it IS in
                # optimizer_D's chain, but no gradient ever reaches it).
                # The framework's usable disc head is latent -> latent
                # (train/pcaa.py:216); the orphan is not importable as one.
                print(
                    f"[import] skipping {tag}: the reference's dead "
                    "discriminator projection head (declared "
                    f"{2 * latent}->{latent}, never executable — "
                    "PCAA_ablation.py:783-786 vs :934-936)"
                )
                continue
            head_params = torch_sequential_head_to_flax(head_sd)
            _head_roundtrip(head_sd, head_params, tag)
            _assert_matches_config(
                {"params": head_params},
                lambda w=width: {
                    "params": ProjectionHead(w).init(key, z0)["params"]
                },
                tag,
            )
            save_params({"params": head_params}, module_path(run_dir, name, tag))

    if os.path.exists(_pt("ML")):  # V1's learned-centroid mean learner
        ml_sd = _load_state_dict(_pt("ML"))
        mp, ms = torch_mean_learner_to_flax(ml_sd)
        ml_vars = {"params": mp, "batch_stats": ms}
        _assert_roundtrip(ml_sd, mean_learner_state_dict(ml_vars), "ML")
        _assert_matches_config(
            ml_vars,
            lambda: GaussianMeanLearner(latent).init(
                key, jnp.zeros((1, n), jnp.float32), train=False
            ),
            "ML",
        )
        save_params(ml_vars, module_path(run_dir, name, "ML"))

    import torch

    means = torch.load(
        os.path.join(ref_run_dir, "discriminator_means.pt"), map_location="cpu"
    )
    means = np.asarray(means.detach().cpu().numpy(), dtype=np.float32)
    if means.shape != (n, latent):
        raise ValueError(
            f"discriminator_means shape {means.shape} does not match the "
            f"config-declared ({n}, {latent})"
        )
    np.save(os.path.join(run_dir, "discriminator_means.npy"), means)


def import_orced_run(ref_run_dir: str, out_models: str, **cfg_overrides) -> Config:
    """Reference ORCED run folder (E/G/ML, ``train_ORCED.py:255-276``) →
    framework run folder."""
    cfg = reference_config_to_framework(
        load_reference_config(os.path.join(ref_run_dir, "config.pkl")),
        MODELS_PATH=out_models,
        **cfg_overrides,
    )
    name = cfg.MODEL_NAME or os.path.basename(os.path.normpath(ref_run_dir))
    if not cfg.MODEL_NAME:
        cfg = cfg.replace(MODEL_NAME=name)
    with _staged_run_dir(cfg.run_dir()) as run_dir:
        _write_orced_modules(ref_run_dir, cfg, name, run_dir)
        cfg.save(os.path.join(run_dir, "config.json"))  # last — see stager
    return cfg


def _write_orced_modules(
    ref_run_dir: str, cfg: Config, name: str, run_dir: str
) -> None:
    n, latent = cfg.n_classes, cfg.SUP_LATENT_DIM
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES), jnp.float32)

    enc_sd = _load_state_dict(os.path.join(ref_run_dir, f"{name}_E.pt"))
    p, s = torch_orced_encoder_to_flax(enc_sd)
    enc_vars = {"params": p, "batch_stats": s}
    _assert_roundtrip(enc_sd, orced_encoder_state_dict(enc_vars), "E")
    enc_mod = ORCEDEncoder(
        n_out_labels=n,
        sup_latent_dim=latent,
        pointnet_out_dim=cfg.POINTNET_OUT_DIM,
        dtc_filters=tuple(cfg.DTC_FILTERS),
    )
    _assert_matches_config(
        enc_vars,
        lambda: enc_mod.init({"params": key, "reparam": key}, x0, train=False),
        "E",
    )
    save_params(enc_vars, module_path(run_dir, name, "E"))

    dec_sd = _load_state_dict(os.path.join(ref_run_dir, f"{name}_G.pt"))
    dec_params = torch_orced_decoder_to_flax(
        dec_sd, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES
    )
    _assert_roundtrip(
        dec_sd,
        orced_decoder_state_dict(
            {"params": dec_params}, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES
        ),
        "G",
        allowed_extra=("bn1.", "bn2.", "bn3.", "bn4."),
    )
    dec_mod = ORCEDDecoder(
        nsteps=cfg.NSTEPS, nmax_points=cfg.NMAX, nfeatures=cfg.NFEATURES
    )
    _assert_matches_config(
        {"params": dec_params},
        lambda: {
            "params": dec_mod.init(
                key, jnp.zeros((1, latent), jnp.float32)
            )["params"]
        },
        "G",
    )
    save_params({"params": dec_params}, module_path(run_dir, name, "G"))

    ml_sd = _load_state_dict(os.path.join(ref_run_dir, f"{name}_ML.pt"))
    mp, ms = torch_mean_learner_to_flax(ml_sd)
    ml_vars = {"params": mp, "batch_stats": ms}
    _assert_roundtrip(ml_sd, mean_learner_state_dict(ml_vars), "ML")
    _assert_matches_config(
        ml_vars,
        lambda: GaussianMeanLearner(latent).init(
            key, jnp.zeros((1, n), jnp.float32), train=False
        ),
        "ML",
    )
    save_params(ml_vars, module_path(run_dir, name, "ML"))


def _run_name(ref_run_dir: str) -> str:
    """The run's checkpoint-stem name — config.pkl's MODEL_NAME, not the
    folder basename: the reference stems every ``.pt`` off MODEL_NAME, so a
    copied/renamed folder still carries correctly-named files inside."""
    ref_cfg = load_reference_config(os.path.join(ref_run_dir, "config.pkl"))
    name = ref_cfg.get("MODEL_NAME") or os.path.basename(
        os.path.normpath(ref_run_dir)
    )
    if not os.path.exists(os.path.join(ref_run_dir, f"{name}_E.pt")):
        raise FileNotFoundError(
            f"{ref_run_dir} holds no {name}_E.pt — config.pkl declares "
            f"MODEL_NAME={name!r} but the folder's checkpoints do not "
            "follow that stem (mixed-up folder?)"
        )
    return name


def detect_kind(ref_run_dir: str) -> str:
    """'pcaa' iff the run saved a discriminator — every PCAA variant does
    (``PCAA_ablation.py:1094-1119``, ``train_AAE.py:340-360``), ORCED never
    (``train_ORCED.py:255-276``). Keyed off config.pkl's MODEL_NAME (file
    stems follow it even in a renamed folder)."""
    name = _run_name(ref_run_dir)
    return "pcaa" if os.path.exists(os.path.join(ref_run_dir, f"{name}_D.pt")) else "orced"


def import_reference_run(
    ref_run_dir: str, out_models: str, kind: str = "auto", **cfg_overrides
) -> Config:
    if kind == "auto":
        kind = detect_kind(ref_run_dir)
    fn = import_pcaa_run if kind == "pcaa" else import_orced_run
    return fn(ref_run_dir, out_models, **cfg_overrides)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument(
        "--ref-run",
        nargs="+",
        required=True,
        help="one or more reference run folders (models/<NAME>)",
    )
    ap.add_argument("--out-models", default="models_imported")
    ap.add_argument("--kind", choices=("auto", "pcaa", "orced"), default="auto")
    ap.add_argument(
        "--data-path", default=None, help="override DATA_PATH in the saved config"
    )
    ap.add_argument(
        "--gen-data-path",
        default=None,
        help="override GEN_DATA_PATH in the saved config",
    )
    args = ap.parse_args(argv)

    overrides = {}
    if args.data_path:
        overrides["DATA_PATH"] = args.data_path
    if args.gen_data_path:
        overrides["GEN_DATA_PATH"] = args.gen_data_path

    for ref_run in args.ref_run:
        kind = detect_kind(ref_run) if args.kind == "auto" else args.kind
        cfg = import_reference_run(ref_run, args.out_models, kind, **overrides)
        print(
            f"[import] {ref_run} → {cfg.run_dir()} ({kind}, "
            f"{cfg.n_classes} classes, round-trip verified)"
        )


if __name__ == "__main__":
    main()
