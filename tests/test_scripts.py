"""End-to-end drives of the experiment-driver scripts at tiny dims.

The drivers are the user-facing replacements for the reference's
``__main__`` blocks (``PCAA_ablation.py:1128-1191``,
``train_ORCED.py:283-329``); until round 3 they were exercised only by
hand. These tests run both grid drivers fresh (training real tiny runs)
and resumed (everything must skip BEFORE any split regeneration — the
round-3 restructure being guarded here), plus the results collector.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from opensetgaitrecognition_pcaa_tpu.config import Config

TINY = dict(
    EPOCHS=1,
    BATCH_SIZE=8,
    NMAX=24,
    NSTEPS=8,
    CROP_STEP=4,
    POINTNET_OUT_DIM=32,
    DTC_FILTERS=(8, 8, 8, 8, 8, 16),
    SUP_LATENT_DIM=8,
    CHECKPOINT_FREQUENCY=1,
)


def tiny_default_config(**kw):
    merged = dict(TINY)
    merged.update(kw)
    return Config(TRAIN_CLASSES=(0, 1), **merged)


@pytest.fixture(scope="module")
def raw10(tmp_path_factory):
    """10-subject synthetic raw set — the drivers' generate_splits calls
    use the reference's N_SUBJECTS=10 default."""
    from opensetgaitrecognition_pcaa_tpu.data.synthetic import (
        generate_synthetic_raw_dataset,
    )

    root = tmp_path_factory.mktemp("raw10")
    generate_synthetic_raw_dataset(
        str(root),
        n_subjects=10,
        tracks_per_scenario=10,
        frames_per_track=(40, 50),
        seed=3,
    )
    return str(root)


def _grid_args(raw, td, extra):
    return [
        "--data-path",
        raw,
        "--gen-data-path",
        os.path.join(td, "gen"),
        "--models-path",
        os.path.join(td, "models"),
        "--n-training-classes",
        "2",
        "--n-tests",
        "2",
        "--grid",
        *extra,
    ]


def _run_twice(module, argv, monkeypatch, capsys):
    """main() fresh then resumed → (fresh_seconds, resume_seconds, out2)."""
    monkeypatch.setattr(module, "default_config", tiny_default_config)
    monkeypatch.setattr(sys, "argv", argv)
    t0 = time.time()
    module.main()
    fresh = time.time() - t0
    capsys.readouterr()
    t0 = time.time()
    module.main()
    resume = time.time() - t0
    out2 = capsys.readouterr().out
    return fresh, resume, out2


class TestGridDrivers:
    def test_pcaa_grid_fresh_then_resume(
        self, raw10, tmp_path, monkeypatch, capsys
    ):
        import scripts.run_pcaa_ablation as rpa

        argv = ["run_pcaa_ablation.py"] + _grid_args(
            raw10, str(tmp_path), ["--variants", "V4"]
        )
        fresh, resume, out2 = _run_twice(rpa, argv, monkeypatch, capsys)

        models = os.path.join(str(tmp_path), "models")
        runs = sorted(os.listdir(models))
        assert len(runs) == 2
        for run in runs:
            run_dir = os.path.join(models, run)
            assert os.path.exists(os.path.join(run_dir, "run_complete.json"))
            assert os.path.exists(os.path.join(run_dir, "config.json"))
        # the resume pass must skip both splits without regenerating
        # splits or loading crops — near-instant vs the training pass
        assert "skipping completed splits [1, 2]" in out2
        assert resume < max(5.0, fresh / 5), (fresh, resume)

    def test_orced_grid_fresh_then_resume(
        self, raw10, tmp_path, monkeypatch, capsys
    ):
        import scripts.run_orced as ro

        argv = ["run_orced.py"] + _grid_args(
            raw10, str(tmp_path), ["--model-name-base", "ORCED_T"]
        )
        fresh, resume, out2 = _run_twice(ro, argv, monkeypatch, capsys)

        models = os.path.join(str(tmp_path), "models")
        runs = sorted(os.listdir(models))
        assert len(runs) == 2
        for run in runs:
            run_dir = os.path.join(models, run)
            assert os.path.exists(os.path.join(run_dir, "run_complete.json"))
            best = json.load(open(os.path.join(run_dir, "run_complete.json")))
            assert np.isfinite(best["best_valid_accuracy"])
        assert "skipping completed splits [1, 2]" in out2
        assert resume < max(5.0, fresh / 5), (fresh, resume)


class TestCollectResults:
    def test_means_exclude_unparseable_runs(self, tmp_path):
        from opensetgaitrecognition_pcaa_tpu.infer.artifacts import save_json

        mp = os.path.join(str(tmp_path), "models")
        for name in ("PCAA_AblV4.8.1", "PCAA_AblV4.8.2", "WEIRD_NAME"):
            os.makedirs(os.path.join(mp, name))
            save_json(
                {
                    "accuracy": 0.5,
                    "f1_micro": 0.5,
                    "f1_macro": 0.4,
                    "f1_weighted": 0.45,
                },
                os.path.join(mp, name, "naive_seq_log_6.json"),
            )
        r = subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts",
                    "collect_results.py",
                ),
                "--models-path",
                mp,
            ],
            capture_output=True,
            text=True,
        )
        assert r.returncode == 0, r.stderr
        # per-run table lists everything; means exclude the junk name
        assert "WEIRD_NAME" in r.stdout
        assert "excluded from means" in r.stdout
        means = r.stdout.split("Means across splits")[1]
        assert "| ? | ?" not in means  # no lumped unparseable group
        assert "| V4 | 8 | 6 |" in means
