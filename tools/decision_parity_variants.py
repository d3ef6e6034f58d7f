#!/usr/bin/env python
"""Shared-weights decision parity for the V1 and V3 ablation variants.

Round-4 verdict item 3: every decision-level parity rung compared V4 +
ORCED only, leaving V1's frozen mean learner + learned-centroid extraction
(reference ``PCAA_ablation.py:28-378``) and V3's no-decoder / headless
encoder (``PCAA_ablation.py:392-743``) without an end-to-end decision
comparison — a variant-specific quirk regression would be invisible.

Flow (reduced dims, all CPU — the same regime as ``tools/decision_parity.py``):

1. generate splits with the reference's own ``MSRadarDataset.generate_splits``;
2. train one framework run per variant (``train_pcaa`` with VARIATION.V1 /
   V3) on those splits;
3. export each run to a reference-format torch folder
   (``scripts/export_reference_run.py`` — head presence and the mean
   learner are auto-detected from the checkpoint);
4. run the reference's ACTUAL ``CGAAE_inference`` with the matching
   ``VARIATION`` (``inference_PCAA.py:404-415`` head selection, ``:77-90``
   loader) and the framework's ``pcaa_inference`` on the SAME regenerated
   crops;
5. join decisions per crop (``tools/decision_parity.py`` window maps).

Appends a "variants" section to DECISION_PARITY.{json,md}.
"""

import argparse
import contextlib
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.decision_parity import (  # noqa: E402
    agreement,
    assert_window_alignment,
    framework_pcaa_window_map,
    patch_reference_constants,
    reference_pcaa_window_map,
    revote_windows,
    strip_usetex,
)
from tools.parity_vs_reference import (  # noqa: E402
    TINY,
    TRAIN_CLASSES,
    _stub_wandb,
    ensure_raw,
)

SECTION_BEGIN = "<!-- variants:begin -->"
SECTION_END = "<!-- variants:end -->"


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/dp_variants")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--ks", type=int, nargs="+", default=[1, 6])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--variants", nargs="+", default=["V1", "V3"], choices=["V1", "V3"]
    )
    args = p.parse_args()

    workdir = os.path.abspath(args.workdir)
    raw_dir = os.path.join(workdir, "raw")
    ref_dir = os.path.join(workdir, "ref")
    ensure_raw(raw_dir)
    if os.path.isdir(ref_dir):
        shutil.rmtree(ref_dir)
    os.makedirs(ref_dir)
    gen_dir = os.path.join(ref_dir, "data", "generated_dataset")

    _stub_wandb()
    os.chdir(ref_dir)  # reference reads models/ figures/ relative to cwd
    sys.path.insert(0, REFERENCE)
    import torch

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    constants = patch_reference_constants(raw_dir, gen_dir, args.epochs)

    from constants import SPLIT as REF_SPLIT
    from datasets import MSRadarDataset

    MSRadarDataset.generate_splits(
        train_classes=list(TRAIN_CLASSES),
        seed=0,
        safe_mode=False,
        nmax_points=constants.NMAX,
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    from opensetgaitrecognition_pcaa_tpu.config import SPLIT, VARIATION, Config
    from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
    from opensetgaitrecognition_pcaa_tpu.infer import pcaa_inference
    from opensetgaitrecognition_pcaa_tpu.train import train_pcaa
    from scripts.export_reference_run import export_reference_run

    import inference_PCAA

    strip_usetex(inference_PCAA.plt.rcParams)

    fw_models = os.path.join(workdir, "models_fw")
    fw_figs = os.path.join(workdir, "figures_fw")
    base_cfg = Config(
        NMAX=TINY["NMAX"],
        NSTEPS=TINY["NSTEPS"],
        CROP_STEP=TINY["CROP_STEP"],
        POINTNET_OUT_DIM=TINY["POINTNET_OUT_DIM"],
        DTC_FILTERS=tuple(TINY["DTC_FILTERS"]),
        SUP_LATENT_DIM=TINY["SUP_LATENT_DIM"],
        BATCH_SIZE=TINY["BATCH_SIZE"],
        EPOCHS=args.epochs,
        CHECKPOINT_FREQUENCY=TINY["CHECKPOINT_FREQUENCY"],
        TRAIN_CLASSES=tuple(TRAIN_CLASSES),
        GEN_DATA_PATH=gen_dir,
        DATA_PATH=raw_dir,
        MODELS_PATH=fw_models,
        FIGURES_PATH=fw_figs,
        SEED=args.seed,
        COMPUTE_DTYPE="float32",
    )

    ref_models = os.path.join(ref_dir, "models")
    os.makedirs(ref_models, exist_ok=True)

    rows = []
    for vname in args.variants:
        var = getattr(VARIATION, vname)
        name = f"FW_{vname}"
        print(f"[dpv] training framework {name} ({args.epochs} epochs)...")
        cfg = base_cfg.replace(MODEL_NAME=name)
        t0 = time.time()
        train_pcaa(cfg, var, verbose=False, resume=False)
        train_s = time.time() - t0
        export_reference_run(os.path.join(fw_models, name), ref_models)

        for k in args.ks:
            print(f"[dpv] {vname} k={k}: reference inference (torch, CPU)...")
            np.random.seed(10_000 + k)  # split-regen pad/subsample stream
            with open(os.path.join(workdir, "ref_infer.log"), "a") as log:
                with contextlib.redirect_stdout(log):
                    inference_PCAA.CGAAE_inference(
                        [name], ks=[k],
                        variation=getattr(inference_PCAA.VARIATION, vname),
                    )
            ref_preds = np.load(
                os.path.join(ref_models, name, f"final_preds_{k}.npy")
            )
            ref_test = MSRadarDataset(REF_SPLIT.TEST, sequential=True)
            ref_unseen = MSRadarDataset(REF_SPLIT.UNSEEN, sequential=True)
            (
                ref_map,
                val_subjects,
                ref_wins,
                n_test_wins,
                ref_test_labels,
            ) = reference_pcaa_window_map(ref_test, ref_unseen, ref_preds, k)
            ref_files = [
                os.path.basename(f) for f in ref_test.filenames
            ] + [os.path.basename(f) for f in ref_unseen.filenames]

            print(f"[dpv] {vname} k={k}: framework inference...")
            pcaa_inference(
                [name],
                [k],
                models_path=fw_models,
                figures_path=fw_figs,
                variation=var,
                generate_dataset=False,
                dump_calibration=True,
            )
            fw_preds = np.load(
                os.path.join(fw_models, name, f"final_preds_{k}.npy")
            )
            fw_test = RadarCropDataset(SPLIT.TEST, gen_dir, sequential=True)
            fw_unseen = RadarCropDataset(
                SPLIT.UNSEEN, gen_dir, sequential=True
            )
            fw_map = framework_pcaa_window_map(
                fw_test, fw_unseen, fw_preds, k, val_subjects
            )
            head = agreement(fw_map, ref_map)
            n_cls = len(TRAIN_CLASSES)

            # same-composition re-vote: framework per-crop scores voted on
            # the REFERENCE's exact window composition (crop agreement at
            # k > 1 also reflects the documented sequential-ordering
            # deviation; this isolates pure numerics)
            cal = dict(
                np.load(os.path.join(fw_models, name, "calibration.npz"))
            )
            ll_all = np.concatenate([cal["test_ll"], cal["unseen_ll"]])
            pred_all = np.concatenate([cal["test_preds"], cal["unseen_preds"]])
            files_all = list(fw_test.filenames) + list(fw_unseen.filenames)
            pos = {f: i for i, f in enumerate(files_all)}
            order = np.array([pos[f] for f in ref_files])
            lab_r = np.concatenate(
                [fw_test.labels, fw_unseen.labels]
            )[order]
            revote = revote_windows(
                ll_all[order], pred_all[order], ref_wins, k,
                float(cal["log_threshold"]), int(cal["n_labels"]),
            )
            assert_window_alignment(
                lab_r, ref_wins, n_test_wins, ref_test_labels
            )
            same_comp = float(np.mean(revote == ref_preds))
            n_sc_flips = int(np.sum(revote != ref_preds))

            row = dict(
                variant=vname,
                k=k,
                crop_agreement=head,
                same_composition_window_agreement=same_comp,
                n_same_composition_flips=n_sc_flips,
                unknown_rate_ref=float(np.mean(ref_preds == n_cls)),
                unknown_rate_fw=float(np.mean(fw_preds == n_cls)),
                n_windows_ref=len(ref_preds),
                n_windows_fw=len(fw_preds),
                train_s=train_s,
            )
            rows.append(row)
            print(
                f"[dpv] {vname} k={k}: crop agreement {head['agree']:.4f} "
                f"(n={head['n_common']}), same-composition "
                f"{same_comp:.4f} ({n_sc_flips} flips)"
            )

    # ---- splice into DECISION_PARITY.{json,md} ----------------------------
    dp_json = os.path.join(REPO, "DECISION_PARITY.json")
    with open(dp_json) as f:
        report = json.load(f)
    report["variants"] = dict(
        epochs=args.epochs, seed=args.seed, ks=args.ks, rows=rows
    )
    with open(dp_json, "w") as f:
        json.dump(report, f, indent=2)

    md = [
        SECTION_BEGIN,
        "",
        "## Ablation variants V1 / V3 (shared weights, reduced dims)\n",
        "`tools/decision_parity_variants.py` — framework-trained V1 (frozen",
        "mean learner, learned centroids; reference `PCAA_ablation.py:28-378`)",
        "and V3 (no decoder, headless encoder; `PCAA_ablation.py:392-743`)",
        "runs exported to torch folders and scored by the reference's own",
        f"`CGAAE_inference` with the matching VARIATION ({args.epochs}",
        "epochs):\n",
        "| variant | k | crop agreement | same-composition window "
        "agreement (flips) | n crops | unknown rate (ref / fw) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        h = r["crop_agreement"]
        md.append(
            f"| {r['variant']} | {r['k']} | {h['agree']:.4f} | "
            f"{r['same_composition_window_agreement']:.4f} "
            f"({r['n_same_composition_flips']}) | "
            f"{h['n_common']} | {r['unknown_rate_ref']:.4f} / "
            f"{r['unknown_rate_fw']:.4f} |"
        )
    md += [
        "",
        "Crop agreement at k > 1 reflects the documented sequential-ordering",
        "deviation (window composition); the same-composition column",
        "re-votes the framework's per-crop scores on the REFERENCE's exact",
        "windows — pure numerics.",
        "",
        SECTION_END,
    ]
    block = "\n".join(md)

    dp_md = os.path.join(REPO, "DECISION_PARITY.md")
    with open(dp_md) as f:
        text = f.read()
    if SECTION_BEGIN in text:
        pre = text.split(SECTION_BEGIN)[0]
        post = text.split(SECTION_END, 1)[1]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(dp_md, "w") as f:
        f.write(text)
    print(f"[dpv] wrote {dp_json} and updated DECISION_PARITY.md")


if __name__ == "__main__":
    main()
