#!/usr/bin/env python
"""Multi-seed throughput + quality gate for the optimizer fast paths.

Compares, on the real TPU at reference dims:

- ``baseline``  — bf16 compute, bf16 Adam first moments (the shipped path)
- ``nu16``      — + bf16 SECOND moments (``Config.BF16_ADAM_NU``)
- ``factored``  — + factored f32 second moments (``Config.FACTORED_ADAM_NU``)

Throughput: steady-state whole-epoch-scan timing (bench.py's shape).
Quality: paired per-seed best-valid-accuracy after ``--epochs`` epochs of
PCAA V4 on a real synthetic split — the same gate design that validated the
bf16 compute path. A fast path ships as the bench config only if its mean
paired accuracy delta is within noise (>= -1pp) AND throughput improves.

Result history (v5e, 4 epochs, 5 seeds, 2026-08-16): nu16 is +9% throughput
but a systematic -2..-4pp accuracy hit on EVERY seed (bf16 EMA increments
at B2=0.99 sit ~2.5x above bf16 resolution and partially round away) —
initially rejected as a default on that 4-epoch evidence. ``factored``
keeps f32 EMA precision; this tool measures whether its rank-1 denominator
approximation is quality-neutral (measured: -5.6pp — rejected).

SUPERSEDED (v5e, 10 epochs, 6 seeds, 2026-08-17): the decisive longer gate
cleared nu16 at +0.8pp mean paired accuracy — the 4-epoch deficit is a
transient of early training, not a converged bias. nu16 therefore ships in
the bench config (952 w/s headline once round 3's BF16_WEIGHT_CACHE landed
on top; 922 at this gate's date); ``Config.BF16_ADAM_NU`` stays False
as the parity default. The 4-epoch verdict above is retained for history
only.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "baseline": {},
    "nu16": {"BF16_ADAM_NU": True},
    "factored": {"FACTORED_ADAM_NU": True},
}

# ORCED has its own baseline semantics: the parity default is f32 with f32
# moments, so its gate compares f32 vs the two bf16 tiers.
ORCED_CONFIGS = {
    "f32": {"COMPUTE_DTYPE": "float32"},
    "bf16": {"COMPUTE_DTYPE": "bfloat16"},
    "bf16+nu16": {"COMPUTE_DTYPE": "bfloat16", "BF16_ADAM_NU": True},
}


def measure_wps(flags: dict, n_epochs: int = 4) -> float:
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
        MODEL_NAME="gate_wps",
        BATCH_SIZE=16,
        COMPUTE_DTYPE="bfloat16",
        **flags,
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
    return n_epochs * steps * cfg.BATCH_SIZE / (time.time() - t0)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--configs", nargs="+", default=None)
    p.add_argument("--skip-wps", action="store_true")
    p.add_argument(
        "--model",
        default="pcaa",
        choices=["pcaa", "orced"],
        help="which trainer to gate (orced compares f32 vs bf16 tiers)",
    )
    args = p.parse_args()
    table = CONFIGS if args.model == "pcaa" else ORCED_CONFIGS
    if args.configs is None:
        args.configs = list(table)

    from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
    from opensetgaitrecognition_pcaa_tpu.data.splits import generate_splits
    from opensetgaitrecognition_pcaa_tpu.data.synthetic import (
        generate_synthetic_raw_dataset,
    )
    from opensetgaitrecognition_pcaa_tpu.train.orced import train_orced
    from opensetgaitrecognition_pcaa_tpu.train.pcaa import train_pcaa

    work = tempfile.mkdtemp(prefix="gate_opt_")
    raw = os.path.join(work, "raw")
    gen = os.path.join(work, "gen")
    models = os.path.join(work, "models")
    # >=10 tracks/scenario: fewer degenerates the 0.8/0.1/0.1 track split
    generate_synthetic_raw_dataset(raw, n_subjects=10, tracks_per_scenario=10)
    generate_splits(train_classes=list(range(8)), data_path=raw, gen_data_path=gen)

    out = {}
    if not args.skip_wps and args.model == "pcaa":
        for name in args.configs:
            out.setdefault(name, {})["wps"] = round(measure_wps(table[name]), 1)
            print(f"{name}: {out[name]['wps']} w/s", flush=True)
    elif not args.skip_wps:
        # measure_wps hardcodes the PCAA trainer; ORCED tiers were timed
        # with tools' standalone sweep instead (PERF_ROOFLINE.md table) —
        # say so rather than silently dropping half the ship criterion
        print(
            "note: throughput measurement is PCAA-only (measure_wps builds "
            "the PCAA trainer); ORCED tier throughputs are recorded in "
            "PERF_ROOFLINE.md. This gate run covers QUALITY only.",
            flush=True,
        )

    accs = {name: [] for name in args.configs}
    for seed in range(args.seeds):
        for name in args.configs:
            cfg = Config(
                TRAIN_CLASSES=tuple(range(8)),
                MODEL_NAME=f"gq_{name}_{seed}",
                GEN_DATA_PATH=gen,
                MODELS_PATH=models,
                EPOCHS=args.epochs,
                CHECKPOINT_FREQUENCY=1,
                SEED=seed,
                **(
                    dict(COMPUTE_DTYPE="bfloat16", **table[name])
                    if args.model == "pcaa"
                    else dict(
                        TRIPLET_W=1.0, CE_W=1.0, REC_W=1.0, KL_W=1.0,
                        TRIPLET_MARGIN=0.5, **table[name],
                    )
                ),
            )
            if args.model == "pcaa":
                r = train_pcaa(cfg, VARIATION.V4, verbose=False, resume=False)
            else:
                r = train_orced(cfg, verbose=False, resume=False)
            accs[name].append(float(r["best_valid_accuracy"]))
        print(
            f"seed {seed}: "
            + " ".join(f"{n}={accs[n][-1]:.4f}" for n in args.configs),
            flush=True,
        )

    base = np.array(accs[args.configs[0]])
    for name in args.configs:
        a = np.array(accs[name])
        out.setdefault(name, {}).update(
            mean_acc=round(float(a.mean()), 4),
            paired_delta_vs_first=round(float((a - base).mean()), 4),
            accs=[round(v, 4) for v in a],
        )
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
