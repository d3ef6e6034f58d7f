#!/usr/bin/env python
"""A/B throughput: DEFERRED_DECODER_UPDATE off vs on (bench config).

The deferred schedule moves the decoder's Adam parameter write to the top
of the next scan body, data-independent of the encoder forward, so the
scheduler can overlap its HBM streaming with MXU compute
(tools/probe_overlap.py measured 51% of the smaller task hidden across
independent fusions). Price: one extra read of the stored moments per
step. This tool measures whether the overlap beats the extra traffic on
the real step.

Timing per CLAUDE.md rules: whole-epoch scans (single dispatch), completion
forced via device_get of a metric leaf.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
    VARIANTS,
    build_pcaa,
    make_epoch_fns,
)


def measure(deferred: bool, n_epochs: int = 4) -> float:
    cfg = Config(
        TRAIN_CLASSES=tuple(range(8)),
        MODEL_NAME="profile_deferred",
        BATCH_SIZE=16,
        COMPUTE_DTYPE="bfloat16",
        BF16_ADAM_NU=True,
        BF16_WEIGHT_CACHE=True,
        DEFERRED_DECODER_UPDATE=deferred,
    )
    rng = np.random.default_rng(0)
    n_samples = 512
    x = jnp.asarray(
        rng.normal(
            size=(n_samples, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES)
        ).astype(np.float32)
    )
    y = jnp.asarray(rng.integers(0, 8, n_samples, dtype=np.int32))

    mods, state = build_pcaa(
        cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(0)
    )
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


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    # interleave A/B/A/B to cancel slow drift on the shared chip
    runs = {"off": [], "on": []}
    for _ in range(3):
        runs["off"].append(measure(False))
        runs["on"].append(measure(True))
        print(
            f"off {runs['off'][-1]:7.1f} w/s   on {runs['on'][-1]:7.1f} w/s",
            flush=True,
        )
    off = float(np.median(runs["off"]))
    on = float(np.median(runs["on"]))
    print(f"median off {off:7.1f} w/s")
    print(f"median on  {on:7.1f} w/s   ({(on / off - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
