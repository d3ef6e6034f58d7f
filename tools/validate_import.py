#!/usr/bin/env python
"""Validate ``scripts/import_reference_run.py`` on REAL reference-trained
weights (not the random-init fixtures of ``tests/test_import_reference.py``).

Flow:

1. generate splits with the reference's own ``MSRadarDataset.generate_splits``;
2. train the ACTUAL torch reference V4 at tiny dims
   (``PCAA_ablation.py:746-1122``) — producing a genuine reference run
   folder (``config.pkl`` + ``_E/_D/_G/_GPH.pt`` + ``discriminator_means.pt``)
   with real trained BatchNorm statistics;
3. run the reference's own ``CGAAE_inference`` (``inference_PCAA.py:382-469``)
   on that folder;
4. import the folder with ``import_reference_run`` and run the framework's
   ``pcaa_inference`` on the imported run, over the SAME regenerated crops;
5. join decisions per crop and report agreement.

At k=1 there is no window composition to differ (every crop is its own
window), so any disagreement would be importer/numeric drift — the expected
result is exact agreement (``DECISION_PARITY.md`` measured the same maps'
forward drift at ~1e-6 in the transplant direction). k>1 additionally picks
up the documented sequential window-composition deviation
(``data/dataset.py:66-73`` vs reference ``datasets.py:163-180,394-413``),
already quantified in ``DECISION_PARITY.md`` — this tool defaults to k=1.

ORCED is deliberately out of scope here: the reference's eval-time reparam
draws come from the unseeded torch RNG (``models.py:494-496``), so its own
decision self-agreement floor is ~0.29 (``DECISION_PARITY.md``) and a raw
decision comparison measures noise, not the importer. The importer's ORCED
maps are the same code paths round-trip-verified bit-exact per import, and
the CRN twin (``PARITY_CRN_ORCED.md``) already shows agreement 1.0 once the
noise is pinned.

Writes IMPORT_PARITY.{json,md} at the repo root.
"""

import argparse
import contextlib
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

from tools.decision_parity import (  # noqa: E402
    agreement,
    framework_pcaa_window_map,
    patch_reference_constants,
    reference_pcaa_window_map,
    strip_usetex,
)
from tools.parity_vs_reference import (  # noqa: E402
    TINY,
    TRAIN_CLASSES,
    _stub_wandb,
    ensure_raw,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/validate_import")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--ks", type=int, nargs="+", default=[1])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default=REPO)
    args = p.parse_args()

    workdir = os.path.abspath(args.workdir)
    out_dir = os.path.abspath(args.out_dir)
    raw_dir = os.path.join(workdir, "raw")
    ref_dir = os.path.join(workdir, "ref")
    ensure_raw(raw_dir)
    if os.path.isdir(ref_dir):
        shutil.rmtree(ref_dir)
    os.makedirs(ref_dir)
    gen_dir = os.path.join(ref_dir, "data", "generated_dataset")

    _stub_wandb()
    os.chdir(ref_dir)  # reference writes models/, figures/, data/ to cwd
    sys.path.insert(0, REFERENCE)
    import torch

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    constants = patch_reference_constants(raw_dir, gen_dir, args.epochs)
    n_cls = len(TRAIN_CLASSES)

    from constants import SPLIT as REF_SPLIT
    from datasets import MSRadarDataset

    MSRadarDataset.generate_splits(
        train_classes=list(TRAIN_CLASSES),
        seed=0,
        safe_mode=False,
        nmax_points=constants.NMAX,
    )

    # ---------------- reference training -----------------------------------
    ref_name = "REF_V4"
    config = dict(constants.CONFIG)
    config["MODEL_NAME"] = ref_name
    config["NOTES"] = ""
    print(f"[vi] training the torch reference V4 ({args.epochs} epochs)...")
    import PCAA_ablation

    with open(os.path.join(workdir, "ref_train.log"), "w") as log:
        with contextlib.redirect_stdout(log):
            PCAA_ablation.train_variant4(config, wandb_mode="disabled")
    ref_run = os.path.join(ref_dir, "models", ref_name)
    assert os.path.exists(os.path.join(ref_run, "config.pkl")), ref_run

    # ---------------- import into the framework ----------------------------
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scripts.import_reference_run import import_reference_run

    imp_models = os.path.join(workdir, "models_imported")
    if os.path.isdir(imp_models):
        shutil.rmtree(imp_models)
    print("[vi] importing the reference run folder...")
    imp_cfg = import_reference_run(
        ref_run,
        imp_models,
        DATA_PATH=raw_dir,
        GEN_DATA_PATH=gen_dir,
        FIGURES_PATH=os.path.join(workdir, "figures_imported"),
    )

    # attribution baseline: imported-encoder forward drift vs the trained
    # torch encoder on real crops (torch vs XLA elementwise/matmul order)
    from opensetgaitrecognition_pcaa_tpu.config import SPLIT, VARIATION
    from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
    from opensetgaitrecognition_pcaa_tpu.infer import pcaa_inference
    from opensetgaitrecognition_pcaa_tpu.infer.pcaa import pcaa_inference_setup

    from models import CGEncoder as RefCGEncoder

    ref_enc = RefCGEncoder(
        n_out_labels=n_cls, use_projection_head=True, nmax_points=constants.NMAX
    ).float()
    ref_enc.load_state_dict(
        torch.load(os.path.join(ref_run, f"{ref_name}_E.pt"), map_location="cpu")
    )
    ref_enc.eval()
    _, enc_i, vars_i, _ = pcaa_inference_setup(
        ref_name, VARIATION.V4, models_path=imp_models, generate_dataset=False
    )
    xp = RadarCropDataset(SPLIT.TEST, gen_dir).load_all()[0][:16]
    with torch.no_grad():
        _, ft = ref_enc(torch.tensor(xp).permute(0, 3, 1, 2))
    _, fj = enc_i.apply(vars_i, xp, train=False)
    drift = float(np.max(np.abs(np.asarray(fj) - ft.numpy())))
    print(f"[vi] imported-encoder max |latent drift| = {drift:.2e}")

    # ---------------- per-k decision comparison ----------------------------
    import inference_PCAA

    strip_usetex(inference_PCAA.plt.rcParams)

    rows = []
    for k in args.ks:
        print(f"[vi] k={k}: reference inference on its own run folder...")
        np.random.seed(10_000 + k)  # split-regeneration pad/subsample stream
        with open(os.path.join(workdir, "ref_infer.log"), "a") as log:
            with contextlib.redirect_stdout(log):
                inference_PCAA.CGAAE_inference(
                    [ref_name], ks=[k], variation=inference_PCAA.VARIATION.V4
                )
        ref_preds = np.load(os.path.join(ref_run, f"final_preds_{k}.npy"))

        # reference window composition (same process → same set-iteration
        # order as its dataset construction)
        ref_test = MSRadarDataset(REF_SPLIT.TEST, sequential=True)
        ref_unseen = MSRadarDataset(REF_SPLIT.UNSEEN, sequential=True)
        ref_map, val_subjects = reference_pcaa_window_map(
            ref_test, ref_unseen, ref_preds, k
        )

        # framework inference on the imported run, over the crops the
        # reference's setup just regenerated
        print(f"[vi] k={k}: framework inference on the IMPORTED run...")
        pcaa_inference(
            [ref_name],
            [k],
            models_path=imp_models,
            figures_path=os.path.join(workdir, "figures_imported"),
            variation=VARIATION.V4,
            generate_dataset=False,
        )
        fw_preds = np.load(
            os.path.join(imp_models, ref_name, f"final_preds_{k}.npy")
        )
        fw_test = RadarCropDataset(SPLIT.TEST, gen_dir, sequential=True)
        fw_unseen = RadarCropDataset(SPLIT.UNSEEN, gen_dir, sequential=True)
        fw_map = framework_pcaa_window_map(
            fw_test, fw_unseen, fw_preds, k, val_subjects
        )

        row = dict(k=k, **agreement(fw_map, ref_map))
        print(f"[vi] k={k}: agreement {row['agree']} over {row['n_common']}")
        rows.append(row)

    report = dict(
        epochs=args.epochs,
        seed=args.seed,
        dims=TINY,
        train_classes=list(TRAIN_CLASSES),
        imported_encoder_max_latent_drift=drift,
        rows=rows,
        imported_run=imp_cfg.run_dir(),
    )
    with open(os.path.join(out_dir, "IMPORT_PARITY.json"), "w") as f:
        json.dump(report, f, indent=2)

    lines = [
        "# Imported-run inference parity (reference-trained weights)",
        "",
        "`tools/validate_import.py`: the ACTUAL torch reference V4 was",
        f"trained ({args.epochs} epochs, tiny dims, seed {args.seed}), its run"
        " folder imported",
        "with `scripts/import_reference_run.py`, and the framework's",
        "`pcaa_inference` run on the imported folder was compared per crop",
        "against the reference's own `CGAAE_inference` on the same",
        "regenerated crops.",
        "",
        f"Imported-encoder forward drift vs the trained torch encoder: max "
        f"|latent Δ| = {drift:.2e}.",
        "",
        "| k | common crops | agreement |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['k']} | {r['n_common']} | {r['agree']:.4f} |")
    lines += [
        "",
        "At k=1 every crop is its own voting window, so composition cannot",
        "differ and any disagreement would be importer drift. k>1 adds the",
        "documented sequential window-composition deviation (which crops",
        "share a voting window), quantified in `DECISION_PARITY.md` — there",
        "the same-composition window agreement was exactly 1.0 with zero",
        "threshold or vote flips, so residual k>1 disagreement here is the",
        "composition effect, not importer drift (the k=1 row rules that",
        "out). ORCED is out of scope by design: the",
        "reference's unseeded eval reparam noise puts its own decision",
        "self-agreement at ~0.29, so a raw comparison measures noise — the",
        "importer's ORCED maps are round-trip-verified bit-exact per import",
        "and `PARITY_CRN_ORCED.md` shows agreement 1.0 with the noise pinned.",
        "",
    ]
    with open(os.path.join(out_dir, "IMPORT_PARITY.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"[vi] wrote {os.path.join(out_dir, 'IMPORT_PARITY.md')}")


if __name__ == "__main__":
    main()
