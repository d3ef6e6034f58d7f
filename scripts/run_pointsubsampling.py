#!/usr/bin/env python
"""Point-subsampling sweep: PCAA V4 at NMAX ∈ {50..150}, train + infer.

Reference oracle: ``train_pointsubsampling.py:19-71`` — for each openness ×
split × n_points: regenerate splits at that NMAX, train variant 4 (wandb
disabled), then run inference with ks = [1, 2, 4, 6]. Run names
``PCAA_npts_V4_{n_points}.{n_tr}.{i}``.
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
from opensetgaitrecognition_pcaa_tpu.infer import pcaa_inference
from opensetgaitrecognition_pcaa_tpu.ops import openness
from opensetgaitrecognition_pcaa_tpu.train import train_pcaa
from opensetgaitrecognition_pcaa_tpu.train.run_folder import run_completed
from scripts.run_pcaa_ablation import unique_class_subsets


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--gen-data-path", default="data/generated_dataset")
    p.add_argument("--models-path", default="models")
    p.add_argument("--figures-path", default="figures")
    p.add_argument("--model-name-base", default="PCAA_npts_V4_")
    p.add_argument("--n-training-classes", type=int, nargs="+", default=[2, 4, 6, 8])
    p.add_argument(
        "--n-points-subs", type=int, nargs="+", default=[50, 70, 90, 110, 130, 150]
    )
    p.add_argument("--n-tests", type=int, default=5)
    p.add_argument("--ks", type=int, nargs="+", default=[1, 2, 4, 6])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--no-skip-completed", action="store_true")
    args = p.parse_args()

    base_cfg = default_config(
        DATA_PATH=args.data_path,
        GEN_DATA_PATH=args.gen_data_path,
        MODELS_PATH=args.models_path,
        FIGURES_PATH=args.figures_path,
    )
    if args.epochs:
        base_cfg = base_cfg.replace(EPOCHS=args.epochs)

    rng = np.random.default_rng(0)
    for n_tr in args.n_training_classes:
        for i, train_classes in enumerate(
            unique_class_subsets(n_tr, args.n_tests, rng)
        ):
            for n_points in args.n_points_subs:
                # Effective per-run config (the reference mutates the shared
                # CONFIG's NMAX in place, train_pointsubsampling.py:53 —
                # here each run snapshot is immutable).
                # SEED=i: splits of an openness level get distinct init/
                # shuffle/noise streams, like the other grid drivers.
                cfg = base_cfg.replace(
                    NMAX=n_points,
                    TRAIN_CLASSES=tuple(train_classes),
                    Openness=openness(n_tr, N_SUBJECTS),
                    MODEL_NAME=f"{args.model_name_base}{n_points}.{n_tr}.{i + 1}",
                    SEED=i,
                    NOTES=f"Runs with different number of points "
                    f"({n_points}.{n_tr}.{i + 1})",
                )
                # resumability like the sibling grid drivers: a 120-run
                # sweep interrupted mid-way skips finished (run, NMAX)
                # cells — including their split regeneration — on restart.
                # Training done but inference artifacts missing (killed
                # between the two) → regenerate splits and redo inference.
                trained = not args.no_skip_completed and run_completed(
                    cfg.run_dir()
                )
                inferred = trained and all(
                    os.path.exists(
                        os.path.join(cfg.run_dir(), f"naive_seq_log_{k}.json")
                    )
                    for k in args.ks
                )
                if inferred:
                    print(f"=== skipping completed {cfg.MODEL_NAME} ===")
                    continue
                generate_splits(
                    data_path=cfg.DATA_PATH,
                    gen_data_path=cfg.GEN_DATA_PATH,
                    train_classes=train_classes,
                    seed=0,
                    nmax_points=n_points,
                    nsteps=cfg.NSTEPS,
                    crop_step=cfg.CROP_STEP,
                )
                if not trained:
                    print(f"=== training {cfg.MODEL_NAME} ===")
                    train_pcaa(cfg, VARIATION.V4, wandb_mode="disabled")
                else:
                    print(f"=== re-running inference for {cfg.MODEL_NAME} ===")
                pcaa_inference(
                    [cfg.MODEL_NAME],
                    ks=args.ks,
                    models_path=args.models_path,
                    figures_path=args.figures_path,
                    data_path=args.data_path,
                    variation=VARIATION.V4,
                    generate_dataset=False,  # just generated above at this NMAX
                )


if __name__ == "__main__":
    main()
