"""Inference tests: open-set procedures end-to-end over a trained run folder.

Covers SURVEY.md §4.3's integration contract: inference consumes a run
folder and produces JSON metrics with the right keys, preds/labels npy, and
a confusion-matrix PNG — via the reference's exact filename patterns.
"""

import json
import os

import numpy as np
import pytest

from opensetgaitrecognition_pcaa_tpu.config import SCENARIO, SPLIT, VARIATION, Config
from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
from opensetgaitrecognition_pcaa_tpu.infer import orced_inference, pcaa_inference
from opensetgaitrecognition_pcaa_tpu.infer.orced import orced_ensemble_ood_detection
from opensetgaitrecognition_pcaa_tpu.train import train_orced, train_pcaa

from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def arrays(generated_splits):
    gen, _ = generated_splits
    x_t, y_t = RadarCropDataset(SPLIT.TRAIN, gen).load_all()
    x_v, y_v = RadarCropDataset(SPLIT.VALID, gen).load_all()
    return x_t, y_t, x_v, y_v


@pytest.fixture(scope="module")
def trained_v4(generated_splits, tmp_path_factory, arrays):
    gen, _ = generated_splits
    tmp = tmp_path_factory.mktemp("inf_v4")
    cfg = tiny_config(gen, tmp, "INF_V4.3.1", EPOCHS=2)
    train_pcaa(cfg, VARIATION.V4, datasets=arrays, verbose=False)
    return cfg


@pytest.fixture(scope="module")
def trained_orced(generated_splits, tmp_path_factory, arrays):
    gen, _ = generated_splits
    tmp = tmp_path_factory.mktemp("inf_orced")
    cfg = tiny_config(gen, tmp, "INF_ORCED.3.1", EPOCHS=2)
    train_orced(cfg, datasets=arrays, verbose=False)
    return cfg


class TestPCAAInference:
    def test_end_to_end_artifacts(self, trained_v4):
        cfg = trained_v4
        logs = pcaa_inference(
            ["INF_V4.3.1"],
            ks=[1, 2],
            models_path=cfg.MODELS_PATH,
            figures_path=cfg.FIGURES_PATH,
            generate_dataset=False,  # splits already on disk
        )
        run_dir = cfg.run_dir()
        for k in (1, 2):
            with open(os.path.join(run_dir, f"naive_seq_log_{k}.json")) as f:
                log = json.load(f)
            assert set(log) == {
                "n_steps",
                "accuracy",
                "f1_micro",
                "f1_macro",
                "f1_weighted",
            }
            assert 0.0 <= log["accuracy"] <= 1.0
            preds = np.load(os.path.join(run_dir, f"final_preds_{k}.npy"))
            labels = np.load(os.path.join(run_dir, f"final_labels_{k}.npy"))
            assert len(preds) == len(labels) > 0
            # open-set label space: classes 0..n-1 plus "unknown" = n
            assert set(np.unique(labels)) <= set(range(cfg.n_classes + 1))
            assert set(np.unique(preds)) <= set(range(cfg.n_classes + 1))
            png = os.path.join(
                cfg.FIGURES_PATH,
                "INF_V4.3.1",
                f"openset_confusion_matrix_naive_seq_{k}.png",
            )
            assert os.path.exists(png) and os.path.getsize(png) > 0
        # aggregate json (inference_PCAA.py:466-469)
        agg = os.path.join(run_dir, "naive_seq_log_subsampled0.json")
        with open(agg) as f:
            agg_log = json.load(f)
        assert set(agg_log) == {"1", "2"} or set(agg_log) == {1, 2}
        assert logs["INF_V4.3.1"][1]["f1_micro"] >= 0

    def test_calibration_precision_knobs_cpu_identical(self, trained_v4):
        # precision / use_pallas select TPU eval paths (the round-5
        # attribution matrix, tools/decision_parity_full.py); on CPU every
        # combination must route to the same flax apply and agree exactly.
        from opensetgaitrecognition_pcaa_tpu.infer.pcaa import (
            calibrate_open_set,
            pcaa_inference_setup,
        )

        cfg = trained_v4
        c, e, v, m = pcaa_inference_setup(
            "INF_V4.3.1", VARIATION.V4, models_path=cfg.MODELS_PATH,
            generate_dataset=False,
        )
        cal_hi = calibrate_open_set(e, v, m, c, seed=0, precision="highest")
        cal_df = calibrate_open_set(
            e, v, m, c, seed=0, precision=None, use_pallas=False
        )
        np.testing.assert_array_equal(cal_hi.test_ll, cal_df.test_ll)
        np.testing.assert_array_equal(cal_hi.unseen_ll, cal_df.unseen_ll)
        assert cal_hi.log_threshold == cal_df.log_threshold

    def test_unknown_windows_present(self, trained_v4):
        # The unseen split feeds windows labelled n_classes.
        cfg = trained_v4
        labels = np.load(os.path.join(cfg.run_dir(), "final_labels_1.npy"))
        assert (labels == cfg.n_classes).sum() > 0
        assert (labels < cfg.n_classes).sum() > 0

    def test_scenario_restricted(self, trained_v4):
        cfg = trained_v4
        pcaa_inference(
            ["INF_V4.3.1"],
            ks=[1],
            models_path=cfg.MODELS_PATH,
            figures_path=cfg.FIGURES_PATH,
            scenarios_list=[SCENARIO.FREE_WALK],
            generate_dataset=False,
        )
        f = os.path.join(
            cfg.run_dir(), "naive_seq_log_1_scenariosfree_walk.json"
        )
        assert os.path.exists(f)


class TestORCEDInference:
    def test_end_to_end(self, trained_orced):
        cfg = trained_orced
        results = orced_inference(
            ["INF_ORCED.3.1"],
            models_path=cfg.MODELS_PATH,
            figures_path=cfg.FIGURES_PATH,
            generate_dataset=False,
            batch_size=16,
        )
        m = results["INF_ORCED.3.1"]
        assert set(m) == {"accuracy", "f1_micro", "f1_macro", "f1_weighted"}
        fig_dir = os.path.join(cfg.FIGURES_PATH, "INF_ORCED.3.1")
        assert os.path.exists(
            os.path.join(fig_dir, "openset_cnfmtrx_ensemble_ood_fixed.png")
        )
        preds = np.load(
            os.path.join(fig_dir, "ensemble_ood_final_preds_fixed.npy")
        )
        labels = np.load(
            os.path.join(fig_dir, "ensemble_ood_final_labels_fixed.npy")
        )
        assert len(preds) == len(labels) > 0
        assert (labels == cfg.n_classes).sum() > 0

    def test_subsample_factor_honored(
        self, trained_orced, generated_splits, monkeypatch
    ):
        """All three inference loaders are built with the run's
        SUBSAMPLE_FACTOR (reference ``inference_ORCED.py:186-221``; round-2
        VERDICT missing item 4) and keep ``int(n * factor)`` crops
        (reference ``datasets.py:424-432``)."""
        import opensetgaitrecognition_pcaa_tpu.infer.orced as orced_mod

        cfg = trained_orced
        factor = 0.5
        # Point a copy of the trained run's config at SUBSAMPLE_FACTOR=0.5:
        # inference reads config.json from the run folder.
        sub_cfg = cfg.replace(SUBSAMPLE_FACTOR=factor)
        sub_cfg.save(os.path.join(cfg.run_dir(), "config.json"))

        gen, _ = generated_splits
        full_sizes = {
            s: len(RadarCropDataset(s, gen)) for s in (SPLIT.TRAIN, SPLIT.TEST, SPLIT.UNSEEN)
        }

        built = {}
        real_ds = orced_mod.RadarCropDataset

        class Recording(real_ds):
            def __init__(self, split, *a, **kw):
                super().__init__(split, *a, **kw)
                built[split] = (kw.get("subsample_factor", 1.0), len(self))

        monkeypatch.setattr(orced_mod, "RadarCropDataset", Recording)
        try:
            orced_inference(
                ["INF_ORCED.3.1"],
                models_path=cfg.MODELS_PATH,
                figures_path=cfg.FIGURES_PATH,
                generate_dataset=False,
                batch_size=16,
            )
        finally:
            cfg.save(os.path.join(cfg.run_dir(), "config.json"))  # restore

        for s in (SPLIT.TRAIN, SPLIT.TEST, SPLIT.UNSEEN):
            got_factor, got_len = built[s]
            assert got_factor == factor, s
            assert got_len == int(full_sizes[s] * factor), s


class TestEnsembleOOD:
    def test_rejects_far_latents(self):
        rng = np.random.default_rng(0)
        d, n_tr = 8, 300
        gt = rng.integers(0, 3, n_tr)
        f_tr = rng.normal(size=(n_tr, d)) * 0.3 + gt[:, None] * 5.0
        re_tr = np.abs(rng.normal(1.0, 0.1, n_tr))
        # test: one in-distribution sample per class + one far outlier
        z_test = np.concatenate(
            [np.full((1, d), 0.0), np.full((1, d), 5.0), np.full((1, d), 100.0)]
        )
        re_test = np.array([1.0, 1.0, 1.0])
        preds = np.array([0, 1, 2])
        out = orced_ensemble_ood_detection(
            re_tr, f_tr, 0.95, gt, gt, preds, z_test, re_test
        )
        assert out[2] == 3  # far latent rejected as unknown
        assert out[0] in (0, 3) and out[1] in (1, 3)
        assert out[0] == 0 and out[1] == 1  # in-distribution kept

    def test_rejects_high_rec_error(self):
        rng = np.random.default_rng(1)
        d, n_tr = 4, 200
        gt = rng.integers(0, 2, n_tr)
        f_tr = rng.normal(size=(n_tr, d)) + gt[:, None] * 3.0
        re_tr = np.abs(rng.normal(1.0, 0.05, n_tr))
        z_test = f_tr[:1]
        out = orced_ensemble_ood_detection(
            re_tr, f_tr, 0.95, gt, gt, np.array([gt[0]]), z_test,
            np.array([10.0]),  # rec error way above μ+2σ
        )
        assert out[0] == 2


class TestBatchedApply:
    def test_padding_rows_discarded_and_values_exact(self):
        from opensetgaitrecognition_pcaa_tpu.infer.common import batched_apply

        x = np.arange(10, dtype=np.float32).reshape(10, 1)

        def fn(chunk, params):
            return (chunk * 2.0, chunk + params)

        a, b = batched_apply(fn, x, batch_size=4, params=np.float32(1.0))
        np.testing.assert_array_equal(a, x * 2.0)
        np.testing.assert_array_equal(b, x + 1.0)

    def test_pad_to_steps_values_identical(self):
        # pad_to_steps exists so differently-sized splits share ONE compiled
        # scan (full-dims ORCED TPU inference, infer/orced.py) — it must not
        # change any returned row, and chunk_rows must honor the floor.
        from opensetgaitrecognition_pcaa_tpu.infer.common import (
            batched_apply,
            chunk_rows,
        )

        x = np.arange(10, dtype=np.float32).reshape(10, 1)
        assert chunk_rows(x, 4, pad_to_steps=7).shape == (7, 4, 1)
        assert chunk_rows(x, 4, pad_to_steps=2).shape == (3, 4, 1)  # natural

        def fn(chunk, params):
            return (chunk * 3.0,)

        (a,) = batched_apply(fn, x, batch_size=4, params=None)
        (b,) = batched_apply(fn, x, batch_size=4, params=None, pad_to_steps=7)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(b, x * 3.0)

    def test_runner_reused_for_stable_fn_and_collectable_for_dropped(self):
        # Stable fn objects must hit the same compiled runner (seed loops in
        # the parity tools pay a full recompile per call otherwise); fresh
        # closures must not be pinned for the life of the process once the
        # caller drops them (decoder-scale executables on a 16 GB box).
        import gc
        import weakref

        from opensetgaitrecognition_pcaa_tpu.infer.common import _runner

        def stable(chunk, params):
            return (chunk,)

        assert _runner(stable, False) is _runner(stable, False)
        assert _runner(stable, False) is not _runner(stable, True)

        def make():
            def anon(chunk, params):
                return (chunk,)

            return anon

        anon = make()
        ref = weakref.ref(anon)
        _runner(anon, False)
        del anon
        gc.collect()
        assert ref() is None, "dropped closure still pinned by the runner cache"
