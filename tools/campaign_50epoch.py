#!/usr/bin/env python
"""Round-4 reference-epoch-count campaign driver (round-3 VERDICT item 6).

Drives the reference's published epoch count (EPOCHS=50,
``/root/reference/constants.py:57``) over the round-2 campaign shape:
PCAA V4 x openness {2,4,6,8} x 5 splits (grid lockstep, bench fast
path) + the same ORCED grid, then open-set inference over every run
folder and a results table. Each training phase runs in its own
subprocess: grid chunks accumulate HBM across chunks within one
process (the n_tr=8 chunk OOMed after nine 50-epoch chunks in the
first attempt), and ``--grid`` skip-completed makes re-invocation
resume for free.

Wall-clock per phase is logged so RESULTS_SYNTHETIC.md can compare
against the projected 1-core torch-CPU time (0.283 windows/s,
BASELINE_MEASURED.json).

Usage::

    python tools/campaign_50epoch.py [--root /tmp/campaign50]
"""
import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run(cmd):
    log("RUN " + " ".join(cmd))
    t0 = time.time()
    subprocess.run(cmd, check=True)
    log(f"done in {time.time() - t0:.0f}s")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="/tmp/campaign50")
    p.add_argument("--epochs", type=int, default=50)
    args = p.parse_args()

    root = args.root
    raw = os.path.join(root, "raw")
    gen = os.path.join(root, "gen")
    models = os.path.join(root, "models")
    figs = os.path.join(root, "figures")
    os.makedirs(root, exist_ok=True)

    if not (os.path.isdir(raw) and os.listdir(raw)):
        from opensetgaitrecognition_pcaa_tpu.data.synthetic import (
            generate_synthetic_raw_dataset,
        )

        log("generating synthetic raw dataset")
        generate_synthetic_raw_dataset(
            raw,
            n_subjects=10,
            tracks_per_scenario=10,
            frames_per_track=(60, 100),
            seed=42,
        )

    common = [
        "--data-path", raw, "--gen-data-path", gen, "--models-path", models,
        "--n-training-classes", "2", "4", "6", "8", "--n-tests", "5",
        "--epochs", str(args.epochs), "--grid",
        "--compute-dtype", "bfloat16", "--bf16-adam-nu",
        "--bf16-weight-cache",
    ]

    t_v4 = time.time()
    run([sys.executable, "scripts/run_pcaa_ablation.py", "--variants", "V4"]
        + common)
    t_v4 = time.time() - t_v4
    log(f"V4 training total {t_v4:.0f}s")

    t_orced = time.time()
    run([sys.executable, "scripts/run_orced.py"] + common)
    t_orced = time.time() - t_orced
    log(f"ORCED training total {t_orced:.0f}s")

    # ---- inference over every folder ----------------------------------
    from opensetgaitrecognition_pcaa_tpu.infer import (
        orced_inference,
        pcaa_inference,
    )

    # skip importer staging/backup dirs (NAME.importing.<pid> / NAME.replaced
    # can transiently hold a config.json — scripts/import_reference_run.py)
    def is_run(n):
        return ".importing." not in n and not n.endswith(".replaced")

    pcaa_names = sorted(
        n for n in os.listdir(models)
        if n.startswith("PCAA_Abl2_") and is_run(n)
    )
    orced_names = sorted(
        n for n in os.listdir(models)
        if n.startswith("ORCED_") and is_run(n)
    )
    log(f"inference over {len(pcaa_names)} PCAA + {len(orced_names)} ORCED")

    t_inf = time.time()
    pcaa_inference(
        pcaa_names, ks=[1, 6], models_path=models, figures_path=figs,
        data_path=raw,
    )
    t_pcaa_inf = time.time() - t_inf
    log(f"PCAA inference total {t_pcaa_inf:.0f}s")

    t_inf = time.time()
    orced_inference(
        orced_names, models_path=models, figures_path=figs, data_path=raw
    )
    t_orced_inf = time.time() - t_inf
    log(f"ORCED inference total {t_orced_inf:.0f}s")

    run([
        sys.executable, "scripts/collect_results.py",
        "--models-path", models,
        "--json", os.path.join(root, "results.json"),
        "--markdown", os.path.join(root, "results.md"),
    ])
    log(
        f"CAMPAIGN DONE v4_train={t_v4:.0f}s orced_train={t_orced:.0f}s "
        f"pcaa_inf={t_pcaa_inf:.0f}s orced_inf={t_orced_inf:.0f}s"
    )


if __name__ == "__main__":
    main()
