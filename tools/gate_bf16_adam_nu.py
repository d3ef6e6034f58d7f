#!/usr/bin/env python
"""Throughput + quality gate for ``Config.BF16_ADAM_NU`` on the real TPU.

Same gate design as the bf16 compute path (CLAUDE.md): the flag ships as a
default only if (a) steady-state training throughput improves and (b) the
4-epoch synthetic valid accuracy is unchanged vs the flag-off run at equal
seed. Run on the one v5e chip:

    python tools/gate_bf16_adam_nu.py

Writes nothing; prints a JSON verdict line. Quality leg trains PCAA V4 on a
real synthetic split (reference dims) twice — identical PRNG seed, only the
optimizer storage dtype differs — and compares best valid accuracy.
Throughput leg times whole-epoch jitted scans on random data (same shape
path as bench.py).
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_wps(bf16_nu: bool, n_epochs: int = 4) -> float:
    import jax
    import jax.numpy as jnp

    from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
    from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
        VARIANTS,
        build_pcaa,
        make_epoch_fns,
    )

    cfg = Config(
        TRAIN_CLASSES=tuple(range(8)),
        MODEL_NAME="gate_nu",
        BATCH_SIZE=16,
        COMPUTE_DTYPE="bfloat16",
        BF16_ADAM_NU=bf16_nu,
    )
    rng = np.random.default_rng(0)
    n_samples = 512
    x = jnp.asarray(
        rng.normal(size=(n_samples, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES)).astype(
            np.float32
        )
    )
    y = jnp.asarray(rng.integers(0, 8, n_samples, dtype=np.int32))
    mods, state = build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(0))
    train_epoch, _ = make_epoch_fns(mods, cfg)
    steps = n_samples // cfg.BATCH_SIZE
    perm = jnp.asarray(
        rng.permutation(n_samples)[: steps * cfg.BATCH_SIZE]
        .reshape(steps, cfg.BATCH_SIZE)
        .astype(np.int32)
    )
    state, m = train_epoch(state, x, y, perm)  # compile + warmup
    float(jax.device_get(m["tot_loss"])[-1])
    t0 = time.time()
    for _ in range(n_epochs):
        state, m = train_epoch(state, x, y, perm)
    float(jax.device_get(m["tot_loss"])[-1])
    dt = time.time() - t0
    return n_epochs * steps * cfg.BATCH_SIZE / dt


def quality_run(bf16_nu: bool, gen_path: str, models_path: str) -> float:
    from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
    from opensetgaitrecognition_pcaa_tpu.train.pcaa import train_pcaa

    cfg = Config(
        TRAIN_CLASSES=tuple(range(8)),
        MODEL_NAME=f"gate_nu_{int(bf16_nu)}",
        GEN_DATA_PATH=gen_path,
        MODELS_PATH=models_path,
        EPOCHS=4,
        CHECKPOINT_FREQUENCY=1,
        SEED=0,
        COMPUTE_DTYPE="bfloat16",
        BF16_ADAM_NU=bf16_nu,
    )
    out = train_pcaa(cfg, VARIATION.V4, verbose=False, resume=False)
    return float(out["best_valid_accuracy"])


def main():
    from opensetgaitrecognition_pcaa_tpu.data.splits import generate_splits
    from opensetgaitrecognition_pcaa_tpu.data.synthetic import (
        generate_synthetic_raw_dataset,
    )

    work = tempfile.mkdtemp(prefix="gate_nu_")
    raw = os.path.join(work, "raw")
    gen = os.path.join(work, "gen")
    models = os.path.join(work, "models")
    # >=10 tracks/scenario: fewer degenerates the 0.8/0.1/0.1 track split
    generate_synthetic_raw_dataset(raw, n_subjects=10, tracks_per_scenario=10)
    generate_splits(
        train_classes=list(range(8)), data_path=raw, gen_data_path=gen
    )

    wps_off = measure_wps(False)
    wps_on = measure_wps(True)
    acc_off = quality_run(False, gen, models)
    acc_on = quality_run(True, gen, models)

    verdict = {
        "wps_off": round(wps_off, 1),
        "wps_on": round(wps_on, 1),
        "speedup": round(wps_on / wps_off, 4),
        "valid_acc_off": acc_off,
        "valid_acc_on": acc_on,
        "pass": bool(wps_on > wps_off and abs(acc_on - acc_off) <= 0.02),
    }
    print(json.dumps(verdict))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
