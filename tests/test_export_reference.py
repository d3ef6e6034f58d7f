"""Framework→reference run-folder export (``scripts/export_reference_run.py``).

Strategy: build framework run folders from randomly-initialized framework
modules (the ``train/run_folder.py`` msgpack contract), export them to the
reference torch contract, and assert

- export→import is the identity on every parameter tree (the importer's
  inverse maps recover the source msgpacks bit-for-bit),
- ``config.pkl`` round-trips through the importer's tolerant unpickler
  without the reference checkout and without leaking a fake ``constants``
  module into ``sys.modules``,
- the reference's strict ``load_state_dict`` contract is met for the
  decoders (forward-unused ``bn1..bn4`` placeholders present —
  ``models.py:353-368,513-528``).

The real-torch end-to-end check (reference ``CGAAE_inference`` running on an
exported framework-TRAINED run) lives in ``tools/validate_export.py``.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flax import traverse_util
from flax.serialization import to_state_dict

from opensetgaitrecognition_pcaa_tpu.config import SCENARIO, Config
from opensetgaitrecognition_pcaa_tpu.models import (
    CGDecoder,
    CGDiscriminator,
    CGEncoder,
    GaussianMeanLearner,
    ORCEDDecoder,
    ORCEDEncoder,
)
from opensetgaitrecognition_pcaa_tpu.models.pcaa import ProjectionHead
from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
    load_params,
    module_path,
    save_params,
)
from scripts.export_reference_run import (
    detect_kind,
    export_reference_run,
)
from scripts.import_reference_run import (
    import_orced_run,
    import_pcaa_run,
    load_reference_config,
)

T, N, C, NL, LAT = 6, 16, 4, 3, 8


def _flat(tree):
    return traverse_util.flatten_dict(to_state_dict(tree))


def assert_trees_bitequal(got, want, tag):
    fg, fw = _flat(got), _flat(want)
    assert set(fg) == set(fw), f"{tag}: key sets differ"
    for k in fw:
        assert np.array_equal(np.asarray(fg[k]), np.asarray(fw[k])), (
            f"{tag}: mismatch at {k}"
        )


def _tiny_config(name: str, models_path: str) -> Config:
    return Config(
        NMAX=N,
        NSTEPS=T,
        CROP_STEP=2,
        NFEATURES=C,
        POINTNET_OUT_DIM=32,
        DTC_FILTERS=(8, 16),
        SUP_LATENT_DIM=LAT,
        DEC_MLP_SIZE=T * N * C,
        TRAIN_CLASSES=(0, 4, 9),
        BATCH_SIZE=4,
        EPOCHS=2,
        CHECKPOINT_FREQUENCY=1,
        MODEL_NAME=name,
        MODELS_PATH=models_path,
    )


@pytest.fixture(scope="module")
def fw_pcaa_run(tmp_path_factory):
    """A framework-contract V4 run folder from random-init modules
    (E with projection head, G, D, GPH, DPH, config.json, means)."""
    root = str(tmp_path_factory.mktemp("fw_models"))
    name = "EXP_V4.8.0"
    cfg = _tiny_config(name, root)
    run = cfg.run_dir()
    os.makedirs(run)
    cfg.save(os.path.join(run, "config.json"))

    key = jax.random.PRNGKey(5)
    enc = CGEncoder(
        n_out_labels=NL,
        sup_latent_dim=LAT,
        pointnet_out_dim=32,
        dtc_filters=(8, 16),
        use_projection_head=True,
    )
    enc_vars = enc.init(key, jnp.zeros((2, T, N, C), jnp.float32), train=False)
    dec_vars = CGDecoder(nsteps=T, nmax_points=N, nfeatures=C).init(
        key, jnp.zeros((2, 2 * LAT), jnp.float32)
    )
    disc_vars = CGDiscriminator().init(
        key, jnp.zeros((2, LAT), jnp.float32), jnp.zeros((2, NL), jnp.float32)
    )
    gph_vars = ProjectionHead(2 * LAT).init(key, jnp.zeros((2, LAT), jnp.float32))
    dph_vars = ProjectionHead(LAT).init(key, jnp.zeros((2, LAT), jnp.float32))

    save_params(enc_vars, module_path(run, name, "E"))
    save_params({"params": dec_vars["params"]}, module_path(run, name, "G"))
    save_params({"params": disc_vars["params"]}, module_path(run, name, "D"))
    save_params({"params": gph_vars["params"]}, module_path(run, name, "GPH"))
    save_params({"params": dph_vars["params"]}, module_path(run, name, "DPH"))
    means = np.random.default_rng(3).normal(size=(NL, LAT)).astype(np.float32)
    np.save(os.path.join(run, "discriminator_means.npy"), means)
    return run, name, enc_vars, dec_vars, disc_vars, gph_vars, dph_vars, means


@pytest.fixture(scope="module")
def fw_orced_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fw_models_orced"))
    name = "EXPORCED.4.1"
    cfg = _tiny_config(name, root)
    run = cfg.run_dir()
    os.makedirs(run)
    cfg.save(os.path.join(run, "config.json"))

    key = jax.random.PRNGKey(13)
    enc = ORCEDEncoder(
        n_out_labels=NL, sup_latent_dim=LAT, pointnet_out_dim=32,
        dtc_filters=(8, 16),
    )
    enc_vars = enc.init(
        {"params": key, "reparam": key},
        jnp.zeros((2, T, N, C), jnp.float32),
        train=False,
    )
    dec_vars = ORCEDDecoder(nsteps=T, nmax_points=N, nfeatures=C).init(
        key, jnp.zeros((2, LAT), jnp.float32)
    )
    ml_vars = GaussianMeanLearner(latent_dim=LAT).init(
        key, jnp.eye(NL, dtype=jnp.float32), train=False
    )

    save_params(enc_vars, module_path(run, name, "E"))
    save_params({"params": dec_vars["params"]}, module_path(run, name, "G"))
    save_params(ml_vars, module_path(run, name, "ML"))
    return run, name, enc_vars, dec_vars, ml_vars


class TestDetectKind:
    def test_pcaa(self, fw_pcaa_run):
        run, name = fw_pcaa_run[:2]
        assert detect_kind(run, name) == "pcaa"

    def test_orced(self, fw_orced_run):
        run, name = fw_orced_run[:2]
        assert detect_kind(run, name) == "orced"


class TestConfigExport:
    def test_pkl_tolerant_unpickle_no_module_leak(self, fw_pcaa_run, tmp_path):
        run, name = fw_pcaa_run[:2]
        assert "constants" not in sys.modules
        dst = export_reference_run(run, str(tmp_path))
        # the stand-in module registered for pickling must not leak
        assert "constants" not in sys.modules
        ref_cfg = load_reference_config(os.path.join(dst, "config.pkl"))
        assert ref_cfg["MODEL_NAME"] == name
        assert ref_cfg["TRAIN_CLASSES"] == [0, 4, 9]
        assert [s.value for s in ref_cfg["TRAIN_SCENARIOS"]] == [
            s.value for s in SCENARIO
        ]
        assert ref_cfg["DEC_MLP_SIZE"] == T * N * C
        # PCAA configs carry the base key set only
        assert "TRIPLET_W" not in ref_cfg

    def test_orced_loss_keys_included(self, fw_orced_run, tmp_path):
        run = fw_orced_run[0]
        dst = export_reference_run(run, str(tmp_path))
        ref_cfg = load_reference_config(os.path.join(dst, "config.pkl"))
        for key in ("TRIPLET_W", "CE_W", "REC_W", "KL_W", "TRIPLET_MARGIN"):
            assert key in ref_cfg, key

    def test_mismatched_folder_name_refused(self, fw_pcaa_run, tmp_path):
        import shutil

        run = fw_pcaa_run[0]
        renamed = os.path.join(str(tmp_path), "OTHER_NAME")
        shutil.copytree(run, renamed)
        with pytest.raises(ValueError, match="does not match"):
            export_reference_run(renamed, str(tmp_path / "out"))

    def test_dec_mlp_size_derived_not_stale_field(self, fw_pcaa_run, tmp_path):
        """DEC_MLP_SIZE in config.pkl must describe the SHIPPED decoder.

        Framework runs never maintain the raw ``Config.DEC_MLP_SIZE`` field
        (decoders size off the derived ``decoder_mlp_size`` property), so a
        non-default-dims run usually carries the stale full-size default.
        The reference derives it as ``NSTEPS * NMAX * NFEATURES``
        (``constants.py:41``) and its ORCEDDecoder builds Linears straight
        from ``constants.DEC_MLP_SIZE`` (``models.py:506-545``) — exporting
        the stale field would make a consumer's strict ``load_state_dict``
        fail against the exported G.pt."""
        import shutil

        run, name = fw_pcaa_run[:2]
        stale = os.path.join(str(tmp_path), name)
        shutil.copytree(run, stale)
        cfg = Config.load(os.path.join(stale, "config.json"))
        cfg = cfg.replace(DEC_MLP_SIZE=Config().DEC_MLP_SIZE)  # untouched default
        assert cfg.DEC_MLP_SIZE != cfg.decoder_mlp_size
        cfg.save(os.path.join(stale, "config.json"))
        dst = export_reference_run(stale, str(tmp_path / "out"))
        ref_cfg = load_reference_config(os.path.join(dst, "config.pkl"))
        assert ref_cfg["DEC_MLP_SIZE"] == T * N * C

    def test_preexisting_constants_module_restored(self, fw_pcaa_run, tmp_path):
        """An unrelated caller module named ``constants`` (without SCENARIO)
        must survive the pickling stand-in — clobber-and-delete would break
        module identity for everyone holding the original."""
        import types

        run = fw_pcaa_run[0]
        assert "constants" not in sys.modules
        caller_mod = types.ModuleType("constants")
        caller_mod.SOME_FLAG = 42
        sys.modules["constants"] = caller_mod
        try:
            export_reference_run(run, str(tmp_path))
            assert sys.modules.get("constants") is caller_mod
        finally:
            sys.modules.pop("constants", None)


class TestPCAARoundTrip:
    @pytest.fixture(scope="class")
    def exported(self, fw_pcaa_run, tmp_path_factory):
        run = fw_pcaa_run[0]
        out = str(tmp_path_factory.mktemp("ref_out"))
        return export_reference_run(run, out)

    def test_reference_folder_contract(self, exported, fw_pcaa_run):
        name = fw_pcaa_run[1]
        for fname in (
            "config.pkl",
            f"{name}_E.pt",
            f"{name}_G.pt",
            f"{name}_D.pt",
            f"{name}_GPH.pt",
            f"{name}_DPH.pt",
            "discriminator_means.pt",
        ):
            assert os.path.exists(os.path.join(exported, fname)), fname

    def test_decoder_bn_placeholders(self, exported, fw_pcaa_run):
        import torch

        name = fw_pcaa_run[1]
        sd = torch.load(
            os.path.join(exported, f"{name}_G.pt"), map_location="cpu"
        )
        size = T * N * C
        for i, div in zip(range(1, 5), (16, 8, 4, 2)):
            assert sd[f"bn{i}.weight"].shape == (size // div,)
            assert torch.all(sd[f"bn{i}.weight"] == 1)
            assert torch.all(sd[f"bn{i}.running_var"] == 1)

    def test_import_recovers_trees_bitexact(
        self, exported, fw_pcaa_run, tmp_path_factory
    ):
        run, name, enc_vars, dec_vars, disc_vars, gph_vars, dph_vars, means = (
            fw_pcaa_run
        )
        back = str(tmp_path_factory.mktemp("back_models"))
        cfg = import_pcaa_run(exported, back)
        assert cfg.MODEL_NAME == name
        assert cfg.TRAIN_CLASSES == (0, 4, 9)
        rd = cfg.run_dir()
        assert_trees_bitequal(
            load_params(module_path(rd, name, "E")),
            {
                "params": enc_vars["params"],
                "batch_stats": enc_vars["batch_stats"],
            },
            "E",
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "G")),
            {"params": dec_vars["params"]},
            "G",
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "D")),
            {"params": disc_vars["params"]},
            "D",
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "GPH")),
            {"params": gph_vars["params"]},
            "GPH",
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "DPH")),
            {"params": dph_vars["params"]},
            "DPH",
        )
        np.testing.assert_array_equal(
            np.load(os.path.join(rd, "discriminator_means.npy")), means
        )


class TestVariantFolderShapes:
    """The exporter must handle every variant's folder shape: V3 trains no
    decoder (``PCAA_ablation.py:392-743``), V1 additionally saves the
    (frozen) mean learner (``PCAA_ablation.py:28-378``)."""

    def test_v3_shape_no_decoder(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("fw_v3"))
        name = "EXP_V3.8.0"
        cfg = _tiny_config(name, root)
        run = cfg.run_dir()
        os.makedirs(run)
        cfg.save(os.path.join(run, "config.json"))
        key = jax.random.PRNGKey(2)
        enc = CGEncoder(
            n_out_labels=NL, sup_latent_dim=LAT, pointnet_out_dim=32,
            dtc_filters=(8, 16), use_projection_head=False,
        )
        enc_vars = enc.init(
            key, jnp.zeros((2, T, N, C), jnp.float32), train=False
        )
        disc_vars = CGDiscriminator().init(
            key, jnp.zeros((2, LAT), jnp.float32),
            jnp.zeros((2, NL), jnp.float32),
        )
        save_params(enc_vars, module_path(run, name, "E"))
        save_params({"params": disc_vars["params"]}, module_path(run, name, "D"))
        means = np.zeros((NL, LAT), np.float32)
        np.save(os.path.join(run, "discriminator_means.npy"), means)

        out = str(tmp_path_factory.mktemp("ref_v3"))
        dst = export_reference_run(run, out)
        assert not os.path.exists(os.path.join(dst, f"{name}_G.pt"))
        import torch

        enc_sd = torch.load(
            os.path.join(dst, f"{name}_E.pt"), map_location="cpu"
        )
        assert not any(k.startswith("MLP_head") for k in enc_sd)
        back = str(tmp_path_factory.mktemp("back_v3"))
        cfg2 = import_pcaa_run(dst, back)
        assert_trees_bitequal(
            load_params(module_path(cfg2.run_dir(), name, "E")),
            {
                "params": enc_vars["params"],
                "batch_stats": enc_vars["batch_stats"],
            },
            "E",
        )

    def test_v1_shape_with_mean_learner(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("fw_v1"))
        name = "EXP_V1.8.0"
        cfg = _tiny_config(name, root)
        run = cfg.run_dir()
        os.makedirs(run)
        cfg.save(os.path.join(run, "config.json"))
        key = jax.random.PRNGKey(4)
        enc = CGEncoder(
            n_out_labels=NL, sup_latent_dim=LAT, pointnet_out_dim=32,
            dtc_filters=(8, 16), use_projection_head=True,
        )
        enc_vars = enc.init(
            key, jnp.zeros((2, T, N, C), jnp.float32), train=False
        )
        disc_vars = CGDiscriminator().init(
            key, jnp.zeros((2, LAT), jnp.float32),
            jnp.zeros((2, NL), jnp.float32),
        )
        ml_vars = GaussianMeanLearner(latent_dim=LAT).init(
            key, jnp.eye(NL, dtype=jnp.float32), train=False
        )
        # Real V1 folders always carry a GPH next to the ML, and the decoder
        # reads the GPH's 2*latent projection (PCAA_ablation.py:28-378 —
        # V1 shares V4's generator-head wiring) — exercise that exact
        # combination, not a headless latent-input decoder no variant saves.
        gph_vars = ProjectionHead(2 * LAT).init(
            key, jnp.zeros((2, LAT), jnp.float32)
        )
        dec_vars = CGDecoder(nsteps=T, nmax_points=N, nfeatures=C).init(
            key, jnp.zeros((2, 2 * LAT), jnp.float32)
        )
        save_params(enc_vars, module_path(run, name, "E"))
        save_params({"params": disc_vars["params"]}, module_path(run, name, "D"))
        save_params({"params": gph_vars["params"]}, module_path(run, name, "GPH"))
        save_params({"params": dec_vars["params"]}, module_path(run, name, "G"))
        save_params(ml_vars, module_path(run, name, "ML"))
        means = np.zeros((NL, LAT), np.float32)
        np.save(os.path.join(run, "discriminator_means.npy"), means)

        out = str(tmp_path_factory.mktemp("ref_v1"))
        dst = export_reference_run(run, out)
        assert os.path.exists(os.path.join(dst, f"{name}_ML.pt"))
        back = str(tmp_path_factory.mktemp("back_v1"))
        cfg2 = import_pcaa_run(dst, back)
        rd = cfg2.run_dir()
        assert_trees_bitequal(
            load_params(module_path(rd, name, "ML")),
            {
                "params": ml_vars["params"],
                "batch_stats": ml_vars["batch_stats"],
            },
            "ML",
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "G")),
            {"params": dec_vars["params"]},
            "G",
        )


class TestORCEDRoundTrip:
    def test_export_import_identity(self, fw_orced_run, tmp_path_factory):
        run, name, enc_vars, dec_vars, ml_vars = fw_orced_run
        out = str(tmp_path_factory.mktemp("ref_out_orced"))
        dst = export_reference_run(run, out)
        for fname in ("config.pkl", f"{name}_E.pt", f"{name}_G.pt",
                      f"{name}_ML.pt"):
            assert os.path.exists(os.path.join(dst, fname)), fname
        back = str(tmp_path_factory.mktemp("back_models_orced"))
        cfg = import_orced_run(dst, back)
        rd = cfg.run_dir()
        assert_trees_bitequal(
            load_params(module_path(rd, name, "E")),
            {
                "params": enc_vars["params"],
                "batch_stats": enc_vars["batch_stats"],
            },
            "E",
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "G")),
            {"params": dec_vars["params"]},
            "G",
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "ML")),
            {
                "params": ml_vars["params"],
                "batch_stats": ml_vars["batch_stats"],
            },
            "ML",
        )
