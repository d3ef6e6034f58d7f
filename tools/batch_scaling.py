#!/usr/bin/env python
"""Batch-size scaling of the PCAA V4 train step at the shipped bench config.

Reproduces PERF_ROOFLINE.md's "Batch-size scaling" table with the FULL
fast path (bf16 compute + BF16_ADAM_NU + BF16_WEIGHT_CACHE — bench.py's
exact Config), so the table tracks the shipped headline rather than a
stale tier. The reference semantics pin B=16 (`/root/reference/
constants.py:56`); larger batches are a production option this framework
adds, and the scaling curve quantifies how far the batch-independent
decoder weight+optimizer HBM traffic amortizes.

Methodology matches bench.py: one whole-epoch jitted scan per dispatch
(the axon tunnel costs ~30 ms/call), completion forced by device_get of a
loss leaf (block_until_ready lies on the tunnel; CLAUDE.md).

Usage: python tools/batch_scaling.py [--batches 16 32 64 128]
Prints a markdown table row per batch; paste into PERF_ROOFLINE.md.
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(batch: int) -> tuple:
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
        MODEL_NAME="batch_scaling",
        BATCH_SIZE=batch,
        COMPUTE_DTYPE="bfloat16",
        BF16_ADAM_NU=True,
        BF16_WEIGHT_CACHE=True,
    )
    steps = 32
    n_samples = batch * steps
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(n_samples, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES)).astype(
            np.float32
        )
    )
    y = jnp.asarray(rng.integers(0, 8, n_samples, dtype=np.int32))
    perm = jnp.asarray(
        rng.permutation(n_samples).reshape(steps, batch).astype(np.int32)
    )

    mods, state = build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(0))
    train_epoch, _ = make_epoch_fns(mods, cfg)

    state, m = train_epoch(state, x, y, perm)  # compile + warmup
    float(jax.device_get(m["tot_loss"])[-1])

    n_epochs = 4
    t0 = time.time()
    for _ in range(n_epochs):
        state, m = train_epoch(state, x, y, perm)
    float(jax.device_get(m["tot_loss"])[-1])
    dt = time.time() - t0
    wps = n_epochs * steps * batch / dt
    ms_per_step = dt / (n_epochs * steps) * 1e3
    return wps, ms_per_step


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64, 128])
    args = p.parse_args()

    print("| batch | windows/s/chip | ms/step |")
    print("|---|---|---|")
    for b in args.batches:
        wps, ms = measure(b)
        print(f"| {b} | {wps:.0f} | {ms:.1f} |", flush=True)


if __name__ == "__main__":
    main()
