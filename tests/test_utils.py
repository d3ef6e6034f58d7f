"""Utility tests: profiling counters, plotting, debug toggles."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from opensetgaitrecognition_pcaa_tpu.utils import (
    StepTimer,
    enable_nan_checks,
    plot_pointcloud,
)


class TestStepTimer:
    def test_counts_and_rate(self):
        t = StepTimer()
        for _ in range(3):
            t.start()
            r = jnp.ones((8, 8)) * 2.0
            t.stop(r, n_items=16)
        assert t.total_items == 48
        assert t.items_per_sec > 0
        s = t.summary()
        assert set(s) == {"total_seconds", "total_items", "items_per_sec"}


class TestPlotting:
    def test_plot_pointcloud_writes_figure(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(1, 1, 1, projection="3d")
        pc = np.random.default_rng(0).normal(size=(50, 4))
        plot_pointcloud(ax, pc, title="t", show_axis=False)
        out = tmp_path / "pc.png"
        fig.savefig(out)
        plt.close(fig)
        assert out.exists() and out.stat().st_size > 0

    def test_degenerate_cloud_no_nan(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(1, 1, 1, projection="3d")
        plot_pointcloud(ax, np.zeros((5, 3)), aspect="none")
        plt.close(fig)


class TestNanChecks:
    def test_toggle(self):
        enable_nan_checks(True)
        assert jax.config.jax_debug_nans
        enable_nan_checks(False)
        assert not jax.config.jax_debug_nans


class TestVariationFromModelName:
    """Reference quirk (inference_PCAA.py:404-415): the two characters
    before the first '.' select the variant; anything else (including
    lowercase tags) silently falls back to BASE — which loads a headless
    encoder and fails on V4 weights. Callers with non-contract run names
    must pass `variation=` explicitly (pcaa_inference supports it)."""

    def test_contract_names(self):
        from opensetgaitrecognition_pcaa_tpu.config import (
            VARIATION,
            variation_from_model_name,
        )

        assert variation_from_model_name("PCAA_Abl2_V4.8.1") == VARIATION.V4
        assert variation_from_model_name("PCAA_Abl2_V1.2.5") == VARIATION.V1
        assert variation_from_model_name("X_V3.6.2") == VARIATION.V3

    def test_non_contract_names_fall_back_to_base(self):
        from opensetgaitrecognition_pcaa_tpu.config import (
            VARIATION,
            variation_from_model_name,
        )

        # lowercase and head-less names mirror the reference's fallback
        assert variation_from_model_name("verify_v4.1.1") == VARIATION.BASE
        assert variation_from_model_name("mymodel") == VARIATION.BASE
