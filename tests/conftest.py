"""Test config: run everything on a virtual 8-device CPU mesh.

The standard JAX fake-multi-device trick (SURVEY.md §4.5): tests exercise the
same sharded code paths the driver validates via ``dryrun_multichip`` without
real TPU hardware. Must set the env vars before the first ``import jax``.
"""

import os

# NOTE: the image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon
# (the TPU tunnel), so setting the env var here is too late — override the
# live config instead. Every per-op dispatch to the tunnel costs ~0.5s, so
# tests MUST run on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_raw(tmp_path_factory):
    """A small synthetic raw dataset shared across the session."""
    from opensetgaitrecognition_pcaa_tpu.data.synthetic import (
        generate_synthetic_raw_dataset,
    )

    root = tmp_path_factory.mktemp("raw")
    # ≥10 tracks per scenario so the 0.8/0.1/0.1 track-level split is
    # non-degenerate (real mmGait10 has many tracks per subject×scenario).
    generate_synthetic_raw_dataset(
        str(root),
        n_subjects=5,
        tracks_per_scenario=10,
        frames_per_track=(40, 56),
        seed=7,
    )
    return str(root)


@pytest.fixture(scope="session")
def generated_splits(synthetic_raw, tmp_path_factory):
    """Synthetic raw → generated split dirs (train classes {0,1,2})."""
    from opensetgaitrecognition_pcaa_tpu.data.splits import generate_splits

    gen = tmp_path_factory.mktemp("gen")
    counts = generate_splits(
        data_path=synthetic_raw,
        gen_data_path=str(gen),
        train_classes=[0, 1, 2],
        seed=0,
        nmax_points=64,
        nsteps=12,
        crop_step=4,
        n_subjects=5,
        verbose=False,
    )
    return str(gen), counts
