"""Checkpoint/resume tests: interrupted runs continue with identical state.

Beyond-reference capability (the reference can only restart whole runs,
SURVEY.md §5): the full training state round-trips through
``train_state.msgpack`` and a resumed run produces the same trajectory as
an uninterrupted one.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opensetgaitrecognition_pcaa_tpu.config import SPLIT, VARIATION
from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
from opensetgaitrecognition_pcaa_tpu.train import train_pcaa
from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
    load_train_state,
    run_completed,
    save_train_state,
)
from opensetgaitrecognition_pcaa_tpu.train.pcaa import VARIANTS, build_pcaa

from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def arrays(generated_splits):
    gen, _ = generated_splits
    x_t, y_t = RadarCropDataset(SPLIT.TRAIN, gen).load_all()
    x_v, y_v = RadarCropDataset(SPLIT.VALID, gen).load_all()
    return x_t, y_t, x_v, y_v


class TestStateRoundTrip:
    def test_save_load_identical(self, generated_splits, tmp_path):
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "RT")
        mods, state = build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(3))
        rng = np.random.default_rng(7)
        rng.permutation(10)  # advance the stream
        path = os.path.join(str(tmp_path), "ckpt", "train_state.msgpack")
        save_train_state(
            state, 4, rng.bit_generator.state, path, extra={"best_valid_acc": 0.5}
        )

        mods2, template = build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(9))
        restored, next_epoch, meta = load_train_state(template, path)
        assert next_epoch == 5
        assert meta["best_valid_acc"] == 0.5
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            jax.device_get(state.params_g),
            jax.device_get(restored.params_g),
        )
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            jax.device_get(state.opt_g),
            jax.device_get(restored.opt_g),
        )
        # the host shuffle stream continues identically
        rng2 = np.random.default_rng(0)
        rng2.bit_generator.state = meta["host_rng_state"]
        ref = np.random.default_rng(7)
        ref.permutation(10)
        np.testing.assert_array_equal(rng2.permutation(20), ref.permutation(20))

    def test_load_missing_returns_none(self, generated_splits, tmp_path):
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "RTM")
        _, state = build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(0))
        assert load_train_state(state, str(tmp_path / "nope.msgpack")) is None


class TestTrainingResume:
    def test_interrupted_equals_straight_run(self, generated_splits, tmp_path, arrays):
        gen, _ = generated_splits
        x = arrays

        # straight 2-epoch run
        cfg_a = tiny_config(
            gen, tmp_path, "STRAIGHT", EPOCHS=2, CHECKPOINT_FREQUENCY=1,
            SAVE_RESUME_STATE=True,
        )
        out_a = train_pcaa(cfg_a, VARIATION.V4, datasets=x, verbose=False)

        # 1 epoch, then resume for the second
        cfg_b = tiny_config(
            gen, tmp_path, "RESUMED", EPOCHS=1, CHECKPOINT_FREQUENCY=1,
            SAVE_RESUME_STATE=True,
        )
        train_pcaa(cfg_b, VARIATION.V4, datasets=x, verbose=False)
        cfg_b2 = cfg_b.replace(EPOCHS=2)
        out_b = train_pcaa(cfg_b2, VARIATION.V4, datasets=x, verbose=False)

        for k in ("Total Loss Train", "Train Accuracy", "Valid Accuracy"):
            assert out_a[k] == pytest.approx(out_b[k], rel=1e-4), k

    def test_resume_preserves_best_payload(
        self, generated_splits, tmp_path, arrays
    ):
        """If no post-resume epoch beats the restored best_valid_acc, the
        final module checkpoint must still hold the pre-interrupt BEST
        weights — not silently fall back to the final training state
        (advisor round-1 finding #4)."""
        from opensetgaitrecognition_pcaa_tpu.train.pcaa import _ckpt_payload
        from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
            load_best_payload,
            load_params,
            module_path,
        )

        gen, _ = generated_splits
        cfg = tiny_config(
            gen, tmp_path, "BESTKEEP", EPOCHS=1, CHECKPOINT_FREQUENCY=1,
            SAVE_RESUME_STATE=True,
        )
        train_pcaa(cfg, VARIATION.V4, datasets=arrays, verbose=False)
        ckpt = os.path.join(cfg.run_dir(), "train_state.msgpack")
        assert os.path.exists(ckpt + ".best"), "best payload not persisted"

        # make the restored best unbeatable → post-resume epochs never improve
        with open(ckpt + ".meta.json") as f:
            meta = json.load(f)
        meta["best_valid_acc"] = 1.0
        with open(ckpt + ".meta.json", "w") as f:
            json.dump(meta, f)

        train_pcaa(cfg.replace(EPOCHS=3), VARIATION.V4, datasets=arrays, verbose=False)

        # module checkpoint == persisted best payload (epoch-0 weights)...
        _, template = build_pcaa(
            cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(cfg.SEED)
        )
        best = load_best_payload(_ckpt_payload(template), ckpt)
        enc = load_params(module_path(cfg.run_dir(), "BESTKEEP", "E"))
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            enc["params"],
            best["params_g"]["encoder"],
        )
        # ...and NOT the final training state (which trained 2 more epochs)
        final_state, _, _ = load_train_state(template, ckpt)
        with pytest.raises(AssertionError):
            jax.tree_util.tree_map(
                np.testing.assert_array_equal,
                enc["params"],
                jax.device_get(final_state.params_g["encoder"]),
            )

    def test_run_completed_marker(self, generated_splits, tmp_path, arrays):
        gen, _ = generated_splits
        cfg = tiny_config(gen, tmp_path, "MARKER", EPOCHS=1)
        assert not run_completed(cfg.run_dir())
        train_pcaa(cfg, VARIATION.V4, datasets=arrays, verbose=False)
        assert run_completed(cfg.run_dir())
        with open(os.path.join(cfg.run_dir(), "run_complete.json")) as f:
            marker = json.load(f)
        assert "Valid Accuracy" in marker
