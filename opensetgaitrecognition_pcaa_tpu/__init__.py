"""TPU-native open-set gait recognition framework (PCAA + OR-CED).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
rmazzier/OpenSetGaitRecognition_PCAA: training and open-set evaluation of
point-cloud gait-recognition models on mmWave radar sequences, built
TPU-first (fixed shapes, jitted whole-epoch scans, pjit/shard_map data- and
grid-parallelism, Pallas kernels for the hot ops).

Reference behavior map: see SURVEY.md at the repo root. Citations in
docstrings (`file:line`) point into the read-only reference checkout.
"""

__version__ = "0.1.0"

from opensetgaitrecognition_pcaa_tpu.config import (  # noqa: F401
    SPLIT,
    SCENARIO,
    VARIATION,
    Config,
    default_config,
)
