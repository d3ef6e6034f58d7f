#!/usr/bin/env python
"""OR-CED baseline grid (reference ``train_ORCED.py:283-329`` __main__):
same openness × split structure as the PCAA ablation, run names
``ORCED_.{n_tr}.{i}``, ORCED loss weights all 1, triplet margin 0.5.

``--grid`` trains all splits of an openness level in lockstep on one device
mesh (``parallel.grid.GridORCEDTrainer``) — the TPU-native replacement for
the reference's sequential grid loop — with the same best-by-valid-accuracy
checkpointing every CHECKPOINT_FREQUENCY epochs (``train_ORCED.py:255-276``)
and per-run E/G/ML run folders as the sequential path.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from opensetgaitrecognition_pcaa_tpu.config import N_SUBJECTS, default_config
from opensetgaitrecognition_pcaa_tpu.data.splits import generate_splits
from opensetgaitrecognition_pcaa_tpu.ops import openness
from opensetgaitrecognition_pcaa_tpu.train import train_orced
from opensetgaitrecognition_pcaa_tpu.train.run_folder import run_completed
from scripts.run_pcaa_ablation import unique_class_subsets


def run_grid_mode(args, base_cfg):
    import jax

    from opensetgaitrecognition_pcaa_tpu.config import SPLIT
    from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
    from opensetgaitrecognition_pcaa_tpu.parallel.grid import mesh_chunks
    from opensetgaitrecognition_pcaa_tpu.parallel.mesh import create_mesh

    n_dev = len(jax.devices())
    mesh = create_mesh(n_dev) if n_dev > 1 else None

    rng = np.random.default_rng(0)
    for n_tr in args.n_training_classes:
        subsets = unique_class_subsets(n_tr, args.n_tests, rng)
        gen_dirs = [
            f"{args.gen_data_path}_orcedgrid{n_tr}_{i}"
            for i in range(args.n_tests)
        ]

        all_cfgs = [
            base_cfg.replace(
                MODEL_NAME=f"{args.model_name_base}.{n_tr}.{i + 1}",
                TRAIN_CLASSES=tuple(subsets[i]),
                Openness=openness(n_tr, N_SUBJECTS),
                GEN_DATA_PATH=gen_dirs[i],
                SEED=i,
                NOTES="Grid-parallel ORCED run",
            )
            for i in range(args.n_tests)
        ]
        # resumability FIRST: completed runs drop out of the lockstep
        # chunks before any split regeneration / crop loading happens —
        # resuming a finished sweep costs seconds, not minutes of
        # preprocessing per openness level
        todo = [
            i
            for i in range(args.n_tests)
            if args.no_skip_completed or not run_completed(all_cfgs[i].run_dir())
        ]
        if len(todo) < args.n_tests:
            done = sorted(set(range(args.n_tests)) - set(todo))
            print(f"    skipping completed splits {[i + 1 for i in done]}")

        data = {}
        for i in todo:
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
        # chunk to device-memory capacity (runs beyond it would OOM HBM);
        # ragged tails whose run count the mesh's data axis doesn't divide
        # train unsharded (parallel.grid.mesh_chunks)
        cap = args.grid_runs_per_device * max(n_dev, 1)
        for chunk, use_mesh in mesh_chunks(todo, cap, n_dev):
            cfgs = [all_cfgs[i] for i in chunk]
            chunk_data = [data[i] for i in chunk]
            print(
                f"=== grid-training ORCED n_tr={n_tr} "
                f"(splits {[i + 1 for i in chunk]} lockstep"
                f"{'' if use_mesh else ', unsharded'}) ==="
            )
            # one function call per chunk: the trainer's device state
            # (params + f32 Adam moments, ~3.5 GB/run) must be GC'd before
            # the next chunk's trainer allocates, or chunk 2 OOMs HBM
            _run_orced_chunk(base_cfg, cfgs, chunk_data,
                             mesh if use_mesh else None)

        # Different openness levels never share executable shapes, so the
        # jit caches from this group only pin HBM (see
        # run_pcaa_ablation.run_grid_mode — the retained caches of nine
        # 50-epoch chunks OOMed the n_tr=8 stack in round 4).
        del data
        jax.clear_caches()


def _run_orced_chunk(base_cfg, cfgs, chunk_data, mesh):
    from opensetgaitrecognition_pcaa_tpu.parallel.grid import GridORCEDTrainer
    from opensetgaitrecognition_pcaa_tpu.train.metrics import MetricLogger
    from opensetgaitrecognition_pcaa_tpu.train.orced import write_orced_checkpoint
    from opensetgaitrecognition_pcaa_tpu.train.run_folder import mark_run_completed

    trainer = GridORCEDTrainer(
        cfgs,
        train_sets=[d[0] for d in chunk_data],
        valid_sets=[d[1] for d in chunk_data],
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
            vacc = trainer.valid_accuracy(epoch)
            trainer.note_validation(vacc)
        for r, logger in enumerate(loggers):
            logger.log(
                {
                    "Total Loss Train": float(m["tot_loss"][r]),
                    "KL Loss": float(m["kl_loss"][r]),
                    "Triplet Loss": float(m["trip_loss"][r]),
                    "Train Accuracy": float(m["train_accuracy"][r]),
                },
                step=epoch,
            )

    payloads = trainer.best_run_payloads()
    best_accs = getattr(trainer, "_best_accs", np.zeros(len(cfgs)))
    for r, (cfg, payload, logger) in enumerate(zip(cfgs, payloads, loggers)):
        write_orced_checkpoint(cfg.run_dir(), cfg.MODEL_NAME, payload)
        logger.finish()
        mark_run_completed(
            cfg.run_dir(),
            {"best_valid_accuracy": float(best_accs[r])},
        )
    print(f"    best valid accs: {np.round(best_accs, 4)}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--gen-data-path", default="data/generated_dataset")
    p.add_argument("--models-path", default="models")
    p.add_argument("--model-name-base", default="ORCED_")
    p.add_argument("--n-training-classes", type=int, nargs="+", default=[2, 4, 6, 8])
    p.add_argument("--n-tests", type=int, default=5)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--wandb-mode", default="disabled")
    p.add_argument("--no-skip-completed", action="store_true")
    p.add_argument(
        "--grid",
        action="store_true",
        help="train all splits of each openness level in lockstep on one "
        "device mesh (parallel/grid.py) instead of sequentially",
    )
    p.add_argument(
        "--grid-runs-per-device",
        type=int,
        default=2,
        help="lockstep runs per device in --grid mode; splits beyond "
        "HBM capacity train in sequential chunks",
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
        help="store Adam second moments in bf16 (cleared ORCED's own "
        "10-epoch paired quality gate; tools/gate_optimizer_quality.py "
        "--model orced)",
    )
    p.add_argument(
        "--bf16-weight-cache",
        action="store_true",
        help="carry bf16 copies of the decoder kernels refreshed inside "
        "the Adam write (bit-identical to bf16 compute by construction); "
        "requires --compute-dtype bfloat16",
    )
    args = p.parse_args()

    base_cfg = default_config(
        DATA_PATH=args.data_path,
        GEN_DATA_PATH=args.gen_data_path,
        MODELS_PATH=args.models_path,
        TRIPLET_W=1.0,
        CE_W=1.0,
        REC_W=1.0,
        KL_W=1.0,
        TRIPLET_MARGIN=0.5,
    )
    if args.epochs:
        base_cfg = base_cfg.replace(EPOCHS=args.epochs)
    if args.compute_dtype:
        base_cfg = base_cfg.replace(COMPUTE_DTYPE=args.compute_dtype)
    if args.bf16_adam_nu:
        base_cfg = base_cfg.replace(BF16_ADAM_NU=True)
    if args.bf16_weight_cache:
        base_cfg = base_cfg.replace(BF16_WEIGHT_CACHE=True)

    if args.grid:
        run_grid_mode(args, base_cfg)
        return

    rng = np.random.default_rng(0)
    for n_tr in args.n_training_classes:
        for i, train_classes in enumerate(
            unique_class_subsets(n_tr, args.n_tests, rng)
        ):
            name = f"{args.model_name_base}.{n_tr}.{i + 1}"
            # SEED=i: distinct per-run init/shuffle/noise streams, matching
            # --grid mode (the reference varies via unseeded torch RNG).
            cfg = base_cfg.replace(
                MODEL_NAME=name,
                TRAIN_CLASSES=tuple(train_classes),
                Openness=openness(n_tr, N_SUBJECTS),
                SEED=i,
                NOTES="ORCED grid run",
            )
            if not args.no_skip_completed and run_completed(cfg.run_dir()):
                print(f"=== skipping completed {name} ===")
                continue
            generate_splits(
                data_path=cfg.DATA_PATH,
                gen_data_path=cfg.GEN_DATA_PATH,
                train_classes=train_classes,
                seed=0,
                nmax_points=cfg.NMAX,
                nsteps=cfg.NSTEPS,
                crop_step=cfg.CROP_STEP,
            )
            print(f"=== training {name} ===")
            out = train_orced(cfg, wandb_mode=args.wandb_mode)
            print(
                f"{name}: best_valid_acc={out['best_valid_accuracy']:.4f} "
                f"windows/s={out['windows_per_sec']:.1f}"
            )


if __name__ == "__main__":
    main()
