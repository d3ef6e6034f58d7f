"""Training-loop tests: loss finiteness, run-folder contract, variant wiring.

Integration strategy per SURVEY.md §4.3: short trainings on the synthetic
set assert losses are finite, parameters move, and the run folder matches
the reference's file contract (config + per-module weights + means).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opensetgaitrecognition_pcaa_tpu.config import Config, SPLIT, VARIATION
from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
from opensetgaitrecognition_pcaa_tpu.train import train_orced, train_pcaa
from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
    VARIANTS,
    build_pcaa,
    make_epoch_fns,
)
from opensetgaitrecognition_pcaa_tpu.train.run_folder import load_params


def tiny_config(gen_dir, tmp_path, name, **kw):
    base = dict(
        NMAX=64,
        NSTEPS=12,
        CROP_STEP=4,
        POINTNET_OUT_DIM=64,
        DTC_FILTERS=(8, 8, 8, 8, 8, 16),
        SUP_LATENT_DIM=16,
        TRAIN_CLASSES=(0, 1, 2),
        BATCH_SIZE=8,
        EPOCHS=2,
        CHECKPOINT_FREQUENCY=1,
        GEN_DATA_PATH=gen_dir,
        MODELS_PATH=os.path.join(str(tmp_path), "models"),
        FIGURES_PATH=os.path.join(str(tmp_path), "figures"),
        MODEL_NAME=name,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def arrays(generated_splits):
    gen, _ = generated_splits
    x_t, y_t = RadarCropDataset(SPLIT.TRAIN, gen).load_all()
    x_v, y_v = RadarCropDataset(SPLIT.VALID, gen).load_all()
    return x_t, y_t, x_v, y_v


class TestPCAATraining:
    def test_v4_end_to_end_run_folder(self, generated_splits, tmp_path, arrays):
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "SMOKE_V4.3.1")
        out = train_pcaa(
            cfg, VARIATION.V4, datasets=arrays, verbose=False
        )
        for k, v in out.items():
            assert np.isfinite(v), (k, v)

        run_dir = cfg.run_dir()
        files = set(os.listdir(run_dir))
        # Reference contract (PCAA_ablation.py:1094-1119 + means)
        assert {"config.json", "metrics.jsonl", "discriminator_means.npy"} <= files
        for tag in ("E", "G", "D", "GPH", "DPH"):
            expected = f"SMOKE_V4.3.1_{tag}.msgpack"
            if tag == "DPH":
                # disc head off by default in V4 (paper run)
                assert expected not in files
            else:
                assert expected in files, files

        # config round-trips and means respect the min-dist invariant
        cfg2 = Config.load(os.path.join(run_dir, "config.json"))
        assert cfg2.TRAIN_CLASSES == (0, 1, 2)
        means = np.load(os.path.join(run_dir, "discriminator_means.npy"))
        assert means.shape == (3, 16)

        # metrics jsonl has reference key names
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            rec = json.loads(f.readline())
        assert "Reconstruction Loss Train" in rec
        assert "Valid Accuracy" in rec

    def test_v4_disc_head_trains(self, generated_splits, tmp_path, arrays):
        """``proj_head_on_discriminator=True`` must actually run. The
        reference declares this head Linear(2*latent, latent) yet feeds it
        the latent-dim ``sup_fv`` (PCAA_ablation.py:783-786 vs :934-936), so
        the option can never execute there; we build it latent→latent by
        design (documented deviation, models/pcaa.py::ProjectionHead)."""
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "SMOKE_V4DH.3.1", EPOCHS=1)
        out = train_pcaa(
            cfg,
            VARIATION.V4,
            proj_head_on_discriminator=True,
            datasets=arrays,
            verbose=False,
        )
        assert np.isfinite(out["Total Loss Train"])
        run_dir = cfg.run_dir()
        assert "SMOKE_V4DH.3.1_DPH.msgpack" in set(os.listdir(run_dir))
        dph = load_params(
            os.path.join(run_dir, "SMOKE_V4DH.3.1_DPH.msgpack")
        )
        assert np.asarray(
            dph["params"]["TorchDense_0"]["kernel"]
        ).shape == (16, 16)

    def test_v3_has_no_decoder(self, generated_splits, tmp_path, arrays):
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "SMOKE_V3.3.1", EPOCHS=1)
        out = train_pcaa(cfg, VARIATION.V3, datasets=arrays, verbose=False)
        assert np.isfinite(out["Total Loss Train"])
        assert out["Reconstruction Loss Train"] == 0.0
        files = set(os.listdir(cfg.run_dir()))
        assert "SMOKE_V3.3.1_G.msgpack" not in files
        assert "SMOKE_V3.3.1_E.msgpack" in files

    def test_v1_mean_learner_params_frozen(self, generated_splits, tmp_path, arrays):
        # The Variable() detach quirk: ML params must not move; BN stats must.
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "SMOKE_V1.3.1", EPOCHS=1)
        key = jax.random.PRNGKey(0)
        mods, state0 = build_pcaa(cfg, VARIANTS[VARIATION.V1], key)
        train_epoch, _ = make_epoch_fns(mods, cfg)
        x_t, y_t, _, _ = arrays
        perm = jnp.asarray(np.arange(16, dtype=np.int32).reshape(2, 8))
        ml0 = jax.device_get(state0.ml_params)
        bn0 = jax.device_get(state0.batch_stats["mean_learner"])
        state1, _ = train_epoch(state0, jnp.asarray(x_t), jnp.asarray(y_t), perm)
        ml1 = jax.device_get(state1.ml_params)
        bn1 = jax.device_get(state1.batch_stats["mean_learner"])
        jax.tree_util.tree_map(np.testing.assert_array_equal, ml0, ml1)
        # BN running stats of the mean learner must have changed
        changed = jax.tree_util.tree_reduce(
            lambda a, b: a or b,
            jax.tree_util.tree_map(
                lambda a, b: bool(np.any(a != b)), bn0, bn1
            ),
        )
        assert changed

    def test_params_actually_move(self, generated_splits, tmp_path, arrays):
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "SMOKE_MOVE", EPOCHS=1)
        key = jax.random.PRNGKey(0)
        mods, state0 = build_pcaa(cfg, VARIANTS[VARIATION.V4], key)
        train_epoch, _ = make_epoch_fns(mods, cfg)
        x_t, y_t, _, _ = arrays
        perm = jnp.asarray(np.arange(16, dtype=np.int32).reshape(2, 8))
        g0 = jax.device_get(state0.params_g)
        d0 = jax.device_get(state0.params_d)
        state1, m = train_epoch(state0, jnp.asarray(x_t), jnp.asarray(y_t), perm)
        g1 = jax.device_get(state1.params_g)
        d1 = jax.device_get(state1.params_d)
        for name, before, after in (("g", g0, g1), ("d", d0, d1)):
            moved = jax.tree_util.tree_reduce(
                lambda a, b: a or b,
                jax.tree_util.tree_map(
                    lambda a, b: bool(np.any(a != b)), before, after
                ),
            )
            assert moved, f"params_{name} did not move"
        assert np.isfinite(jax.device_get(m["d_loss"])).all()

    def test_checkpoint_loadable(self, generated_splits, tmp_path, arrays):
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "SMOKE_LOAD", EPOCHS=1)
        train_pcaa(cfg, VARIATION.V4, datasets=arrays, verbose=False)
        enc = load_params(
            os.path.join(cfg.run_dir(), "SMOKE_LOAD_E.msgpack")
        )
        assert "params" in enc and "batch_stats" in enc


class TestORCEDTraining:
    def test_end_to_end(self, generated_splits, tmp_path, arrays):
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "SMOKE_ORCED.3.1")
        out = train_orced(cfg, datasets=arrays, verbose=False)
        for k, v in out.items():
            assert np.isfinite(v), (k, v)
        files = set(os.listdir(cfg.run_dir()))
        for tag in ("E", "G", "ML"):
            assert f"SMOKE_ORCED.3.1_{tag}.msgpack" in files
        # KL is annealed from 0 → epoch-0 KL must be exactly 0
        with open(os.path.join(cfg.run_dir(), "metrics.jsonl")) as f:
            first = json.loads(f.readline())
        assert first["KL Loss"] == 0.0


class TestFusedAdamTrainer:
    """Config.FUSED_ADAM routes the G update through
    ops/pallas/adam_kernel.fused_adam_tree_update (XLA fallback on CPU —
    same formula as the kernel, oracle-tested in tests/test_optim.py).
    The trajectory must match the optax path."""

    def test_fused_matches_optax_trajectory(self, generated_splits, tmp_path, arrays):
        gen, _ = generated_splits
        base = tiny_config(gen, tmp_path, "FADAM_OFF.3.1", EPOCHS=1)
        fused = tiny_config(gen, tmp_path, "FADAM_ON.3.1", EPOCHS=1, FUSED_ADAM=True)
        out_a = train_pcaa(base, VARIATION.V4, datasets=arrays, verbose=False)
        out_b = train_pcaa(fused, VARIATION.V4, datasets=arrays, verbose=False)
        for k in ("Total Loss Train", "Reconstruction Loss Train", "Valid Accuracy"):
            np.testing.assert_allclose(out_a[k], out_b[k], rtol=2e-4, atol=2e-5)

        # the D optimizer stays bitwise-optax (adam_lowmem f32/f32 oracle)
        import flax.serialization as fser

        wa = open(os.path.join(base.run_dir(), "FADAM_OFF.3.1_D.msgpack"), "rb").read()
        wb = open(os.path.join(fused.run_dir(), "FADAM_ON.3.1_D.msgpack"), "rb").read()
        da = fser.msgpack_restore(wa)
        db = fser.msgpack_restore(wb)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
            da,
            db,
        )
