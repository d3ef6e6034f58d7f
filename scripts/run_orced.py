#!/usr/bin/env python
"""OR-CED baseline grid (reference ``train_ORCED.py:283-329`` __main__):
same openness × split structure as the PCAA ablation, run names
``ORCED_.{n_tr}.{i}``, ORCED loss weights all 1, triplet margin 0.5."""

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

    rng = np.random.default_rng(0)
    for n_tr in args.n_training_classes:
        for i, train_classes in enumerate(
            unique_class_subsets(n_tr, args.n_tests, rng)
        ):
            name = f"{args.model_name_base}.{n_tr}.{i + 1}"
            cfg = base_cfg.replace(
                MODEL_NAME=name,
                TRAIN_CLASSES=tuple(train_classes),
                Openness=openness(n_tr, N_SUBJECTS),
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
