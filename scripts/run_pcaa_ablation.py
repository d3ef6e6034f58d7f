#!/usr/bin/env python
"""PCAA ablation grid: openness levels × splits × variants 1–4.

Reference oracle: the ``__main__`` driver of ``PCAA_ablation.py:1125-1192``
— for each n_train ∈ {2,4,6,8}, draw 5 unique random class subsets (rng seed
0, uniqueness-checked), regenerate splits, then train every variant; run
names ``<base>V{v}.{n_tr}.{i}``.

Unlike the reference (edit-the-source configuration, ``readme.md:37``) this
is a CLI; unlike its mutable shared CONFIG dict, every run gets an immutable
``Config`` snapshot.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from opensetgaitrecognition_pcaa_tpu.config import (
    N_SUBJECTS,
    VARIATION,
    default_config,
)
from opensetgaitrecognition_pcaa_tpu.data.splits import generate_splits
from opensetgaitrecognition_pcaa_tpu.ops import openness
from opensetgaitrecognition_pcaa_tpu.train import train_pcaa
from opensetgaitrecognition_pcaa_tpu.train.run_folder import run_completed


def unique_class_subsets(n_tr: int, n_tests: int, rng: np.random.Generator):
    """5 unique sorted random subsets (reference ``PCAA_ablation.py:1140-1150``)."""
    chosen = []
    while len(chosen) < n_tests:
        subset = sorted(rng.choice(N_SUBJECTS, n_tr, replace=False).tolist())
        if subset not in chosen:
            chosen.append(subset)
    return chosen


def run_grid_mode(args):
    """Lockstep multi-split training: one GridPCAATrainer per
    (openness, variant) cell, splits sharded across devices."""
    import jax

    from opensetgaitrecognition_pcaa_tpu.config import SPLIT
    from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
    from opensetgaitrecognition_pcaa_tpu.parallel.grid import mesh_chunks
    from opensetgaitrecognition_pcaa_tpu.parallel.mesh import create_mesh

    base_cfg = default_config(
        DATA_PATH=args.data_path,
        GEN_DATA_PATH=args.gen_data_path,
        MODELS_PATH=args.models_path,
    )
    if args.epochs:
        base_cfg = base_cfg.replace(EPOCHS=args.epochs)
    if getattr(args, "compute_dtype", None):
        base_cfg = base_cfg.replace(COMPUTE_DTYPE=args.compute_dtype)
    if getattr(args, "bf16_adam_nu", False):
        base_cfg = base_cfg.replace(BF16_ADAM_NU=True)
    if getattr(args, "bf16_weight_cache", False):
        base_cfg = base_cfg.replace(BF16_WEIGHT_CACHE=True)

    n_dev = len(jax.devices())
    mesh = create_mesh(n_dev) if n_dev > 1 else None

    rng = np.random.default_rng(0)
    for n_tr in args.n_training_classes:
        subsets = unique_class_subsets(n_tr, args.n_tests, rng)
        gen_dirs = [
            f"{args.gen_data_path}_grid{n_tr}_{i}" for i in range(args.n_tests)
        ]

        # resumability first: decide which splits any variant still needs
        # BEFORE regenerating splits / loading crops — a finished sweep
        # resumed on this 1-core box would otherwise pay minutes of
        # preprocessing per openness level just to skip everything
        cfgs_by_variant, todo_by_variant = {}, {}
        for v in args.variants:
            all_cfgs = [
                base_cfg.replace(
                    MODEL_NAME=f"{args.model_name_base}{v}.{n_tr}.{i + 1}",
                    TRAIN_CLASSES=tuple(subsets[i]),
                    Openness=openness(n_tr, N_SUBJECTS),
                    GEN_DATA_PATH=gen_dirs[i],
                    SEED=i,
                    NOTES=f"Grid-parallel ablation run, Variant {v[-1]}",
                )
                for i in range(args.n_tests)
            ]
            cfgs_by_variant[v] = all_cfgs
            # completed runs (run_complete.json) drop out of the lockstep
            # chunks, mirroring the sequential path's skip
            todo_by_variant[v] = [
                i
                for i in range(args.n_tests)
                if args.no_skip_completed
                or not run_completed(all_cfgs[i].run_dir())
            ]

        needed = sorted(set().union(*todo_by_variant.values()))
        data = {}
        for i in needed:
            generate_splits(
                data_path=args.data_path,
                gen_data_path=gen_dirs[i],
                train_classes=subsets[i],
                seed=0,
                nmax_points=base_cfg.NMAX,
                nsteps=base_cfg.NSTEPS,
                crop_step=base_cfg.CROP_STEP,
                verbose=False,
            )
            x_t, y_t = RadarCropDataset(SPLIT.TRAIN, gen_dirs[i]).load_all()
            x_v, y_v = RadarCropDataset(SPLIT.VALID, gen_dirs[i]).load_all()
            data[i] = ((x_t, y_t), (x_v, y_v))

        for v in args.variants:
            variation = VARIATION(v)
            all_cfgs = cfgs_by_variant[v]
            todo = todo_by_variant[v]
            if len(todo) < args.n_tests:
                done = sorted(set(range(args.n_tests)) - set(todo))
                print(f"    skipping completed splits {[i + 1 for i in done]}")
            # chunk to device-memory capacity (runs beyond it would OOM
            # HBM); ragged tails whose run count the mesh's data axis
            # doesn't divide train unsharded (sharding requires
            # divisibility — parallel.grid.mesh_chunks)
            cap = args.grid_runs_per_device * max(n_dev, 1)
            for chunk, use_mesh in mesh_chunks(todo, cap, n_dev):
                cfgs = [all_cfgs[i] for i in chunk]
                chunk_data = [data[i] for i in chunk]
                print(
                    f"=== grid-training {v} n_tr={n_tr} "
                    f"(splits {[i + 1 for i in chunk]} lockstep"
                    f"{'' if use_mesh else ', unsharded'}) ==="
                )
                run_grid_chunk(
                    args, cfgs, variation, chunk_data,
                    mesh if use_mesh else None, base_cfg,
                )

        # The next openness level has different dataset shapes, so every
        # executable cached for this group is dead weight that still pins
        # HBM — nine retained 50-epoch chunks OOMed the 16 GB chip at the
        # n_tr=8 state stack (round 4). Drop this group's whole-split
        # device arrays and the jit caches before the next group compiles.
        del data
        jax.clear_caches()


def run_grid_chunk(args, cfgs, variation, data, mesh, base_cfg):
    import json

    import jax

    from opensetgaitrecognition_pcaa_tpu.parallel.grid import GridPCAATrainer
    from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
        VARIANTS,
        _checkpoint,
    )
    from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
        mark_run_completed,
        save_array,
    )
    from opensetgaitrecognition_pcaa_tpu.train.metrics import MetricLogger

    trainer = GridPCAATrainer(
        cfgs,
        variation,
        train_sets=[d[0] for d in data],
        valid_sets=[d[1] for d in data],
        mesh=mesh,
    )
    loggers = []
    for cfg in cfgs:
        os.makedirs(cfg.run_dir(), exist_ok=True)
        cfg.save(os.path.join(cfg.run_dir(), "config.json"))
        loggers.append(MetricLogger(cfg.run_dir(), cfg.to_dict()))

    for epoch in range(base_cfg.EPOCHS):
        m = trainer.run_epoch(epoch)
        if epoch % base_cfg.CHECKPOINT_FREQUENCY == 0:
            vacc = trainer.valid_accuracy()
            trainer.note_validation(vacc)
        for r, logger in enumerate(loggers):
            logger.log(
                {
                    "Total Loss Train": float(m["tot_loss"][r]),
                    "Discriminator Loss": float(m["d_loss"][r]),
                    "Train Accuracy": float(m["train_accuracy"][r]),
                },
                step=epoch,
            )

    payloads = trainer.best_run_payloads()
    best_accs = getattr(trainer, "_best_accs", np.zeros(len(cfgs)))
    for r, (cfg, payload, logger) in enumerate(
        zip(cfgs, payloads, loggers)
    ):
        _checkpoint(cfg.run_dir(), cfg.MODEL_NAME, trainer.mods, payload, cfg)
        if not VARIANTS[variation].learned_centroids:
            save_array(
                np.asarray(
                    jax.device_get(trainer.states.centroids)[0]
                    if hasattr(trainer.states.centroids, "ndim")
                    and trainer.states.centroids.ndim == 3
                    else jax.device_get(trainer.states.centroids)
                ),
                os.path.join(cfg.run_dir(), "discriminator_means.npy"),
            )
        logger.finish()
        mark_run_completed(
            cfg.run_dir(),
            {"best_valid_accuracy": float(best_accs[r])},
        )
    print(
        f"    best valid accs: "
        f"{np.round(getattr(trainer, '_best_accs', np.zeros(1)), 4)}"
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True, help="raw tracks root")
    p.add_argument("--gen-data-path", default="data/generated_dataset")
    p.add_argument("--models-path", default="models")
    p.add_argument("--model-name-base", default="PCAA_Abl2_")
    p.add_argument("--n-training-classes", type=int, nargs="+", default=[2, 4, 6, 8])
    p.add_argument("--n-tests", type=int, default=5)
    p.add_argument("--variants", nargs="+", default=["V1", "V2", "V3", "V4"])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--wandb-mode", default="disabled")
    p.add_argument(
        "--no-skip-completed",
        action="store_true",
        help="retrain runs whose folder already has a completion marker",
    )
    p.add_argument(
        "--grid-runs-per-device",
        type=int,
        default=2,
        help="lockstep runs per device in --grid mode (2 saturates a v5e's "
        "16 GB HBM at reference dims: ~3.5 GB params+moments+grads per run "
        "plus data); splits beyond capacity train in sequential chunks",
    )
    p.add_argument(
        "--compute-dtype",
        default=None,
        choices=["float32", "bfloat16"],
        help="override Config.COMPUTE_DTYPE (bfloat16 = validated fast path)",
    )
    p.add_argument(
        "--bf16-adam-nu",
        action="store_true",
        help="store Adam second moments in bf16 (cleared the 10-epoch "
        "paired quality gate, +9%% step throughput; "
        "tools/gate_optimizer_quality.py)",
    )
    p.add_argument(
        "--bf16-weight-cache",
        action="store_true",
        help="carry bf16 copies of the decoder kernels refreshed inside the "
        "Adam write — bit-identical to bf16 compute by construction "
        "(tests/test_optim.py::TestBF16WeightCache), +3%% throughput; "
        "requires --compute-dtype bfloat16",
    )
    p.add_argument(
        "--grid",
        action="store_true",
        help="train all splits of each (variant, openness) cell in lockstep "
        "on one device mesh (parallel/grid.py) instead of sequentially — "
        "the TPU-native replacement for the reference's sequential grid "
        "loop (SURVEY.md §2.2)",
    )
    args = p.parse_args()

    if args.grid:
        run_grid_mode(args)
        return

    base_cfg = default_config(
        DATA_PATH=args.data_path,
        GEN_DATA_PATH=args.gen_data_path,
        MODELS_PATH=args.models_path,
    )
    if args.epochs:
        base_cfg = base_cfg.replace(EPOCHS=args.epochs)
    if getattr(args, "compute_dtype", None):
        base_cfg = base_cfg.replace(COMPUTE_DTYPE=args.compute_dtype)
    if getattr(args, "bf16_adam_nu", False):
        base_cfg = base_cfg.replace(BF16_ADAM_NU=True)
    if getattr(args, "bf16_weight_cache", False):
        base_cfg = base_cfg.replace(BF16_WEIGHT_CACHE=True)

    rng = np.random.default_rng(0)  # splits_seed = 0 (PCAA_ablation.py:1132)
    for n_tr in args.n_training_classes:
        for i, train_classes in enumerate(
            unique_class_subsets(n_tr, args.n_tests, rng)
        ):
            # SEED=i so the 5 splits of an openness level get distinct
            # init/shuffle/noise streams (the reference's runs differ via
            # unseeded torch RNG, train_AAE.py:173-179); matches --grid mode.
            cfg = base_cfg.replace(
                TRAIN_CLASSES=tuple(train_classes),
                Openness=openness(n_tr, N_SUBJECTS),
                SEED=i,
            )
            generate_splits(
                data_path=cfg.DATA_PATH,
                gen_data_path=cfg.GEN_DATA_PATH,
                train_classes=train_classes,
                seed=0,
                nmax_points=cfg.NMAX,
                nsteps=cfg.NSTEPS,
                crop_step=cfg.CROP_STEP,
            )
            for v in args.variants:
                variation = VARIATION(v)
                name = f"{args.model_name_base}{v}.{n_tr}.{i + 1}"
                run_cfg = cfg.replace(
                    MODEL_NAME=name, NOTES=f"Ablation run, Variant {v[-1]}"
                )
                if not args.no_skip_completed and run_completed(run_cfg.run_dir()):
                    print(f"=== skipping completed {name} ===")
                    continue
                print(f"=== training {name} ===")
                out = train_pcaa(
                    run_cfg, variation, wandb_mode=args.wandb_mode
                )
                print(
                    f"{name}: best_valid_acc={out['best_valid_accuracy']:.4f} "
                    f"windows/s={out['windows_per_sec']:.1f}"
                )


if __name__ == "__main__":
    main()
