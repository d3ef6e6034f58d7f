"""Reference→framework run-folder import (``scripts/import_reference_run.py``).

Strategy: build FAKE reference run folders by transplanting
randomly-initialized framework modules into torch ``state_dict``s via the
forward maps in ``tools/transplant.py`` (the direction whose numerics were
verified against the reference's actual torch forward in
``tools/decision_parity.py``), then import them back and assert bit-exact
flax-tree recovery — inverse∘forward = identity — plus ``config.pkl``
unpickling without the reference checkout and model-kind autodetection
(reference save sets: ``PCAA_ablation.py:1087-1119`` vs
``train_ORCED.py:255-276``).
"""

import os
import pickle
import sys
import types
from enum import Enum

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
from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
    load_params,
    module_path,
)
from scripts.import_reference_run import (
    detect_kind,
    import_orced_run,
    import_pcaa_run,
    load_reference_config,
    reference_config_to_framework,
)
from tools.transplant import (
    cg_encoder_state_dict,
    mean_learner_state_dict,
    orced_decoder_state_dict,
    orced_encoder_state_dict,
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


def _reference_config_pickle(model_name: str, **overrides) -> bytes:
    """Pickle a reference-shaped CONFIG dict whose TRAIN_SCENARIOS are enum
    members of a module named ``constants`` that is NOT importable at load
    time — exactly the situation when importing a run folder without the
    reference checkout (the tolerant unpickler must remap the enum)."""
    mod = types.ModuleType("constants")

    class _SC(Enum):
        FREE_WALK = "free_walk"
        HANDS_IN_POCKETS = "hands_in_pockets"
        SMARTPHONE = "smartphone"

    _SC.__name__ = "SCENARIO"
    _SC.__qualname__ = "SCENARIO"
    _SC.__module__ = "constants"
    mod.SCENARIO = _SC

    cfg = {
        "NMAX": N,
        "NSTEPS": T,
        "CROP_STEP": 2,
        "NFEATURES": C,
        "POINTNET_OUT_DIM": 32,
        "DTC_FILTERS": [8, 16],
        "SUP_LATENT_DIM": LAT,
        "DEC_MLP_SIZE": T * N * C,
        "LR": 1e-4,
        "B1": 0.9,
        "B2": 0.99,
        # numpy scalars exercise the JSON-normalization path (the reference
        # grid drivers store np.int64 class ids from rng.choice).
        "TRAIN_CLASSES": [np.int64(0), np.int64(4), np.int64(9)],
        "TRAIN_SCENARIOS": list(_SC),
        "SUBSAMPLE_FACTOR": 1.0,
        "EPOCHS": 2,
        "BATCH_SIZE": 4,
        "GP_WEIGHT": np.float64(15.0),
        "ADV_WEIGHT": 1,
        "MODEL_NAME": model_name,
        "NOTES": "",
        "CHECKPOINT_FREQUENCY": 1,
        "SUPERVISION_FREQUENCY": 1,
        "Openness": np.float64(0.2254),
        # wandb-only keys must be dropped by Config.from_dict
        "WANDB_PROJECT": "PCAA",
        "WANDB_MODE": "disabled",
    }
    cfg.update(overrides)
    sys.modules["constants"] = mod
    try:
        blob = pickle.dumps(cfg)
    finally:
        del sys.modules["constants"]
    return blob


def _linear_sd(params, layer_indices, prefix=""):
    """Flax TorchDense params → torch Linear state_dict entries (inline
    forward map for modules tools/transplant.py has no forward fn for)."""
    import torch

    sd = {}
    for i, li in enumerate(layer_indices):
        dense = params[f"TorchDense_{i}"]
        sd[f"{prefix}{li}.weight"] = torch.tensor(
            np.asarray(dense["kernel"], np.float32).T
        )
        sd[f"{prefix}{li}.bias"] = torch.tensor(
            np.asarray(dense["bias"], np.float32)
        )
    return sd


@pytest.fixture(scope="module")
def fake_pcaa_ref_run(tmp_path_factory):
    """A reference-contract V4 run folder built from random-init framework
    modules (E with projection head, G, D, GPH, config.pkl, means)."""
    import torch

    root = tmp_path_factory.mktemp("ref_models")
    name = "IMP_V4.8.0"
    run = root / name
    run.mkdir()

    key = jax.random.PRNGKey(7)
    enc = CGEncoder(
        n_out_labels=NL,
        sup_latent_dim=LAT,
        pointnet_out_dim=32,
        dtc_filters=(8, 16),
        use_projection_head=True,
    )
    enc_vars = enc.init(key, jnp.zeros((2, T, N, C), jnp.float32), train=False)
    dec = CGDecoder(nsteps=T, nmax_points=N, nfeatures=C)
    dec_vars = dec.init(key, jnp.zeros((2, 2 * LAT), jnp.float32))
    disc = CGDiscriminator()
    disc_vars = disc.init(
        key, jnp.zeros((2, LAT), jnp.float32), jnp.zeros((2, NL), jnp.float32)
    )
    from opensetgaitrecognition_pcaa_tpu.models.pcaa import ProjectionHead

    gph = ProjectionHead(2 * LAT)
    gph_vars = gph.init(key, jnp.zeros((2, LAT), jnp.float32))

    torch.save(
        cg_encoder_state_dict(enc_vars, use_projection_head=True),
        run / f"{name}_E.pt",
    )
    # CG and ORCED decoders share the dense1..5 key space (models.py:340-385
    # vs :503-545) — reuse the ORCED forward map.
    torch.save(
        orced_decoder_state_dict(dec_vars, T, N, C), run / f"{name}_G.pt"
    )
    torch.save(
        _linear_sd(disc_vars["params"], (0, 2, 4), prefix="model."),
        run / f"{name}_D.pt",
    )
    torch.save(_linear_sd(gph_vars["params"], (0,)), run / f"{name}_GPH.pt")

    means = np.random.default_rng(3).normal(size=(NL, LAT)).astype(np.float32)
    torch.save(torch.tensor(means), run / "discriminator_means.pt")
    (run / "config.pkl").write_bytes(_reference_config_pickle(name))
    return str(run), name, enc_vars, dec_vars, disc_vars, gph_vars, means


@pytest.fixture(scope="module")
def fake_orced_ref_run(tmp_path_factory):
    import torch

    root = tmp_path_factory.mktemp("ref_models_orced")
    name = "ORCED.4.1"
    run = root / name
    run.mkdir()

    key = jax.random.PRNGKey(11)
    enc = ORCEDEncoder(
        n_out_labels=NL, sup_latent_dim=LAT, pointnet_out_dim=32,
        dtc_filters=(8, 16),
    )
    enc_vars = enc.init(
        {"params": key, "reparam": key},
        jnp.zeros((2, T, N, C), jnp.float32),
        train=False,
    )
    dec = ORCEDDecoder(nsteps=T, nmax_points=N, nfeatures=C)
    dec_vars = dec.init(key, jnp.zeros((2, LAT), jnp.float32))
    ml = GaussianMeanLearner(latent_dim=LAT)
    ml_vars = ml.init(key, jnp.eye(NL, dtype=jnp.float32), train=False)

    torch.save(orced_encoder_state_dict(enc_vars), run / f"{name}_E.pt")
    torch.save(
        orced_decoder_state_dict(dec_vars, T, N, C), run / f"{name}_G.pt"
    )
    torch.save(mean_learner_state_dict(ml_vars), run / f"{name}_ML.pt")
    (run / "config.pkl").write_bytes(_reference_config_pickle(name))
    return str(run), name, enc_vars, dec_vars, ml_vars


class TestConfigImport:
    def test_unpickle_without_reference(self, fake_pcaa_ref_run, monkeypatch):
        run, name = fake_pcaa_ref_run[:2]
        monkeypatch.delitem(sys.modules, "constants", raising=False)
        raw = load_reference_config(os.path.join(run, "config.pkl"))
        assert [getattr(s, "value", s) for s in raw["TRAIN_SCENARIOS"]] == [
            s.value for s in SCENARIO
        ]

    def test_to_framework_config(self, fake_pcaa_ref_run):
        run, name = fake_pcaa_ref_run[:2]
        cfg = reference_config_to_framework(
            load_reference_config(os.path.join(run, "config.pkl"))
        )
        assert cfg.MODEL_NAME == name
        assert cfg.TRAIN_CLASSES == (0, 4, 9)
        assert all(isinstance(c, int) for c in cfg.TRAIN_CLASSES)
        assert cfg.NMAX == N and cfg.NSTEPS == T and cfg.SUP_LATENT_DIM == LAT
        assert cfg.GP_WEIGHT == 15.0 and isinstance(cfg.GP_WEIGHT, float)
        assert cfg.Openness == pytest.approx(0.2254)
        assert not hasattr(cfg, "WANDB_PROJECT")
        # the saved config must be JSON-serializable (numpy scalars gone)
        cfg.save(os.path.join(run, "_probe.json"))
        assert Config.load(os.path.join(run, "_probe.json")) == cfg


class TestKindDetection:
    def test_pcaa(self, fake_pcaa_ref_run):
        assert detect_kind(fake_pcaa_ref_run[0]) == "pcaa"

    def test_orced(self, fake_orced_ref_run):
        assert detect_kind(fake_orced_ref_run[0]) == "orced"


class TestPCAAImport:
    @pytest.fixture(scope="class")
    def imported(self, fake_pcaa_ref_run, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("fw_models"))
        cfg = import_pcaa_run(fake_pcaa_ref_run[0], out)
        return cfg, out

    def test_tree_recovery_bitexact(self, fake_pcaa_ref_run, imported):
        run, name, enc_vars, dec_vars, disc_vars, gph_vars, means = (
            fake_pcaa_ref_run
        )
        cfg, out = imported
        rd = cfg.run_dir()
        assert_trees_bitequal(
            load_params(module_path(rd, name, "E")), enc_vars, "E"
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "G")),
            {"params": dec_vars["params"]},
            "G",
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "D")), disc_vars, "D"
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "GPH")), gph_vars, "GPH"
        )
        got_means = np.load(os.path.join(rd, "discriminator_means.npy"))
        assert np.array_equal(got_means, means)

    def test_no_ml_written_for_v4(self, fake_pcaa_ref_run, imported):
        cfg, _ = imported
        assert not os.path.exists(
            module_path(cfg.run_dir(), fake_pcaa_ref_run[1], "ML")
        )

    def test_inference_setup_loads_imported_folder(
        self, fake_pcaa_ref_run, imported
    ):
        """The imported folder satisfies the consumer contract: config +
        encoder + means load exactly as a framework-trained run would
        (``infer/pcaa.py::pcaa_inference_setup`` without split regen)."""
        from opensetgaitrecognition_pcaa_tpu.config import VARIATION
        from opensetgaitrecognition_pcaa_tpu.infer.pcaa import (
            pcaa_inference_setup,
        )

        run, name, enc_vars = fake_pcaa_ref_run[:3]
        cfg, out = imported
        lcfg, enc, loaded_vars, means = pcaa_inference_setup(
            name, VARIATION.V4, models_path=out, generate_dataset=False
        )
        x = np.random.default_rng(0).normal(size=(3, T, N, C)).astype(
            np.float32
        )
        want = CGEncoder(
            n_out_labels=NL,
            sup_latent_dim=LAT,
            pointnet_out_dim=32,
            dtc_filters=(8, 16),
            use_projection_head=True,
        ).apply(enc_vars, x, train=False)
        got = enc.apply(loaded_vars, x, train=False)
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w))


class TestORCEDImport:
    def test_tree_recovery_bitexact(self, fake_orced_ref_run, tmp_path_factory):
        run, name, enc_vars, dec_vars, ml_vars = fake_orced_ref_run
        out = str(tmp_path_factory.mktemp("fw_models_orced"))
        cfg = import_orced_run(run, out)
        rd = cfg.run_dir()
        assert_trees_bitequal(
            load_params(module_path(rd, name, "E")), enc_vars, "E"
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "G")),
            {"params": dec_vars["params"]},
            "G",
        )
        assert_trees_bitequal(
            load_params(module_path(rd, name, "ML")), ml_vars, "ML"
        )


class TestImportGuards:
    def test_incomplete_checkpoint_refused(
        self, fake_pcaa_ref_run, tmp_path_factory
    ):
        """An incomplete/foreign .pt must make the import fail loudly, not
        write a half-valid run folder (a missing key means the state_dict is
        not a reference ``CGEncoder``'s — ``models.py:232-292``)."""
        import shutil

        import torch

        run, name = fake_pcaa_ref_run[:2]
        broken = tmp_path_factory.mktemp("broken") / name
        shutil.copytree(run, broken)
        sd = torch.load(
            os.path.join(broken, f"{name}_E.pt"), map_location="cpu"
        )
        del sd["MLP_sup1.0.bias"]
        torch.save(sd, os.path.join(broken, f"{name}_E.pt"))
        out = str(tmp_path_factory.mktemp("fw_broken"))
        with pytest.raises(KeyError):
            import_pcaa_run(str(broken), out)
        # ...and "fail loudly" includes leaving no half-valid run folder —
        # anything holding a config.json reads as a run to the grid drivers
        # and result collectors.
        assert os.listdir(out) == []

    def test_extra_checkpoint_keys_refused(
        self, fake_pcaa_ref_run, tmp_path_factory
    ):
        """A state_dict with entries the reference module does not declare
        (extra layers from a modified reference) must be refused, not
        silently truncated to the keys the map knows."""
        import shutil

        import torch

        run, name = fake_pcaa_ref_run[:2]
        broken = tmp_path_factory.mktemp("extra") / name
        shutil.copytree(run, broken)
        sd = torch.load(
            os.path.join(broken, f"{name}_E.pt"), map_location="cpu"
        )
        sd["MLP_extra.0.weight"] = torch.zeros(3, 3)
        torch.save(sd, os.path.join(broken, f"{name}_E.pt"))
        out = str(tmp_path_factory.mktemp("fw_extra"))
        with pytest.raises(ValueError, match="does not declare"):
            import_pcaa_run(str(broken), out)
        assert os.listdir(out) == []

    def test_extra_head_layers_refused(
        self, fake_pcaa_ref_run, tmp_path_factory
    ):
        """The inline head round-trip must count layers both ways — an extra
        Linear in D.pt previously dropped silently."""
        import shutil

        import torch

        run, name = fake_pcaa_ref_run[:2]
        broken = tmp_path_factory.mktemp("extra_head") / name
        shutil.copytree(run, broken)
        sd = torch.load(
            os.path.join(broken, f"{name}_D.pt"), map_location="cpu"
        )
        sd["model.6.weight"] = torch.zeros(1, 1)
        sd["model.6.bias"] = torch.zeros(1)
        torch.save(sd, os.path.join(broken, f"{name}_D.pt"))
        out = str(tmp_path_factory.mktemp("fw_extra_head"))
        with pytest.raises(ValueError, match="Linear layers"):
            import_pcaa_run(str(broken), out)
        assert os.listdir(out) == []

    def test_renamed_folder_detects_and_imports(
        self, fake_pcaa_ref_run, tmp_path_factory
    ):
        """Kind detection and module loading key off config.pkl's MODEL_NAME
        (the reference stems every .pt off it), so a copied/renamed folder
        still imports — it must not silently mis-detect as ORCED."""
        import shutil

        run, name, enc_vars = fake_pcaa_ref_run[:3]
        renamed = tmp_path_factory.mktemp("renamed") / "backup"
        shutil.copytree(run, renamed)
        assert detect_kind(str(renamed)) == "pcaa"
        out = str(tmp_path_factory.mktemp("fw_renamed"))
        cfg = import_pcaa_run(str(renamed), out)
        assert cfg.MODEL_NAME == name
        assert_trees_bitequal(
            load_params(module_path(cfg.run_dir(), name, "E")), enc_vars, "E"
        )

    def test_checkpoint_stem_mismatch_named(
        self, fake_pcaa_ref_run, tmp_path_factory
    ):
        """A folder whose .pt stems do not follow config.pkl's MODEL_NAME is
        a mixed-up folder — refused with the mismatch spelled out instead of
        an opaque downstream KeyError."""
        import shutil

        run, name = fake_pcaa_ref_run[:2]
        mixed = tmp_path_factory.mktemp("mixed") / name
        shutil.copytree(run, mixed)
        os.rename(
            os.path.join(mixed, f"{name}_E.pt"),
            os.path.join(mixed, "OTHER_E.pt"),
        )
        with pytest.raises(FileNotFoundError, match="MODEL_NAME"):
            detect_kind(str(mixed))

    def test_dead_reference_dph_skipped(
        self, fake_pcaa_ref_run, tmp_path_factory, capsys
    ):
        """Real reference V4 folders carry a DPH declared Linear(2*latent,
        latent) that is untrained and unused (the proj_head_on_discriminator
        path feeds it latent-dim sup_fv and cannot execute —
        PCAA_ablation.py:783-786 vs :934-936). Import must skip it with a
        note, not refuse the folder."""
        import shutil

        import torch

        run, name = fake_pcaa_ref_run[:2]
        withdead = tmp_path_factory.mktemp("dead_dph") / name
        shutil.copytree(run, withdead)
        torch.save(
            {
                "0.weight": torch.zeros(LAT, 2 * LAT),
                "0.bias": torch.zeros(LAT),
            },
            withdead / f"{name}_DPH.pt",
        )
        out = str(tmp_path_factory.mktemp("fw_dead_dph"))
        cfg = import_pcaa_run(str(withdead), out)
        assert not os.path.exists(module_path(cfg.run_dir(), name, "DPH"))
        assert "dead" in capsys.readouterr().out
        # the rest of the folder imported normally
        assert os.path.exists(module_path(cfg.run_dir(), name, "E"))
        assert os.path.exists(module_path(cfg.run_dir(), name, "GPH"))

    def test_config_checkpoint_mismatch_refused(
        self, fake_pcaa_ref_run, tmp_path_factory
    ):
        """A config.pkl whose declared architecture contradicts the .pt
        shapes (here: 2 TRAIN_CLASSES vs a 3-wide sup head) must be refused
        with the offending entry named — downstream consumers build modules
        FROM the config, so silently importing it would defer the failure
        to an opaque flax ScopeParamShapeError at first inference."""
        import shutil

        run, name = fake_pcaa_ref_run[:2]
        mixed = tmp_path_factory.mktemp("mixed") / name
        shutil.copytree(run, mixed)
        # E.pt was built for 3 classes; the config now declares 2
        (mixed / "config.pkl").write_bytes(
            _reference_config_pickle(name, TRAIN_CLASSES=[0, 4])
        )
        out = str(tmp_path_factory.mktemp("fw_mixed"))
        with pytest.raises(ValueError, match="config-declared"):
            import_pcaa_run(str(mixed), out)
