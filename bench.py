#!/usr/bin/env python
"""Headline benchmark: PCAA V4 training throughput on one TPU chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "windows/sec/chip", "vs_baseline": N}``

- metric: point-cloud windows (30-frame × 150-point crops) consumed per
  second by full PCAA V4 training steps — encoder fwd, WGAN-GP
  discriminator step (double backward), generator step (Chamfer +
  adversarial + CE), both Adam updates, BatchNorm stat updates — at
  reference dims (B=16, ``constants.py:29-55``).
- vs_baseline: ratio against the CPU PyTorch reference-equivalent
  throughput measured by ``tools/measure_torch_baseline.py`` (stored in
  BASELINE_MEASURED.json). BASELINE.md target: ≥ 20×.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
    from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
        VARIANTS,
        build_pcaa,
        make_epoch_fns,
    )

    # bfloat16 compute is the validated production config: on the 4-epoch
    # synthetic quality check it matches float32 validation accuracy exactly
    # (0.7875 both) while cutting step time ~16% (params/stats stay f32).
    cfg = Config(
        TRAIN_CLASSES=tuple(range(8)),
        MODEL_NAME="bench",
        BATCH_SIZE=16,
        COMPUTE_DTYPE="bfloat16",
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

    steps = n_samples // cfg.BATCH_SIZE  # 32 steps per epoch-call
    perm = jnp.asarray(
        rng.permutation(n_samples)[: steps * cfg.BATCH_SIZE]
        .reshape(steps, cfg.BATCH_SIZE)
        .astype(np.int32)
    )

    # compile + warmup (device_get forces completion — on the axon tunnel
    # block_until_ready can return before the device is actually done)
    state, m = train_epoch(state, x, y, perm)
    float(jax.device_get(m["tot_loss"])[-1])

    n_epochs = 4
    t0 = time.time()
    for _ in range(n_epochs):
        state, m = train_epoch(state, x, y, perm)
    float(jax.device_get(m["tot_loss"])[-1])
    dt = time.time() - t0
    windows = n_epochs * steps * cfg.BATCH_SIZE
    wps = windows / dt

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        vs = wps / base["torch_cpu_windows_per_sec"]

    print(
        json.dumps(
            {
                "metric": "pcaa_v4_train_throughput",
                "value": round(wps, 2),
                "unit": "windows/sec/chip",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
