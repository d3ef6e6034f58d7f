#!/usr/bin/env python
"""Measured end-to-end decision parity vs the ACTUAL PyTorch reference.

BASELINE.json's north star is "open-set F1 within ±0.5% of the PyTorch
reference on identical splits". Round 1 only had module-level transplant
parity; this tool MEASURES the claim (judge round-1 item 2):

per seed s:
  1. generate a synthetic raw mmGait-like dataset (10 subjects, the frame
     schema of ``reference/datasets.py:100-104``), shared across seeds;
  2. run the reference's ``MSRadarDataset.generate_splits`` (seed 0) at
     reduced dims — both sides train on these IDENTICAL crop files;
  3. train reference ``train_variant4`` (``PCAA_ablation.py:746-1122``,
     wandb stubbed) and the framework's ``train_pcaa`` V4 on them;
  4. run the reference's ``CGAAE_inference`` (``inference_PCAA.py:382-469``,
     which regenerates the splits per its own contract) and then the
     framework's ``pcaa_inference`` with ``generate_dataset=False`` on the
     SAME regenerated crops — so both score identical eval windows;
  5. record both open-set F1 vectors (micro/macro/weighted per k).

The orchestrator runs each seed in a fresh subprocess (the reference's
``constants`` module is monkeypatched per run) and aggregates into
``PARITY_MEASURED.json`` + ``PARITY_MEASURED.md``.

Known irreducible noise floor (documented, not hidden):
- the reference's training draws UNSEEDED numpy noise (z0 at
  ``PCAA_ablation.py:913-926``) and its sequential dataset order iterates a
  python ``set`` of track-id strings (``datasets.py:397-413``), so even two
  reference runs differ; exact-decision parity is impossible by design
  (SURVEY.md §7.3). The comparison is therefore F1-level across seeds.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# Reduced dims: every shape-bearing key the reference reads at runtime.
# SUP_LATENT_DIM must stay 32 — the reference inference hardcodes
# ``cov=np.eye(32)`` (inference_PCAA.py:133).
TINY = dict(
    NMAX=48,
    NSTEPS=12,
    CROP_STEP=4,
    NFEATURES=4,
    POINTNET_OUT_DIM=64,
    DTC_FILTERS=[8, 8, 8, 8, 8, 16],
    SUP_LATENT_DIM=32,
    BATCH_SIZE=16,
    LR=1e-4,
    B1=0.9,
    B2=0.99,
    GP_WEIGHT=15,
    ADV_WEIGHT=1,
    SUPERVISION_FREQUENCY=1,
    CHECKPOINT_FREQUENCY=1,
)

TRAIN_CLASSES = [0, 1, 2, 3, 5, 7]  # 6 of 10 → 4 unseen subjects


def _stub_wandb():
    """wandb/umap are not installed in this image. The reference only calls
    wandb login/init(→run.finish)/log; umap is imported by its utils.py but
    never used (SURVEY.md §7.4)."""
    stub = types.ModuleType("wandb")
    stub.login = lambda *a, **k: None
    stub.log = lambda *a, **k: None

    class _Run:
        def finish(self):
            pass

    stub.init = lambda *a, **k: _Run()
    sys.modules["wandb"] = stub
    sys.modules["umap"] = types.ModuleType("umap")


def _stub_pytorch_metric_learning():
    """Faithful torch transcription of the two pytorch_metric_learning
    pieces ``train_ORCED.py:30-34`` uses (the library is not installed in
    this image). Semantics per Wang et al. CVPR 2019 and the library's
    documented defaults: MS mining on cosine similarity; triplet-margin loss
    over all (anchor, kept-pos, kept-neg) combinations with euclidean
    distances and AvgNonZeroReducer. CAVEAT (documented in
    PARITY_MEASURED.md): the reference ORCED run therefore uses this
    transcription, not the original library."""
    import torch

    class MultiSimilarityMiner:
        def __init__(self, epsilon=0.1):
            self.epsilon = epsilon

        def __call__(self, embeddings, labels):
            e = torch.nn.functional.normalize(embeddings, p=2, dim=1)
            sim = e @ e.T
            n = sim.shape[0]
            same = labels.unsqueeze(0) == labels.unsqueeze(1)
            eye = torch.eye(n, dtype=torch.bool, device=sim.device)
            pos_mask = same & ~eye
            neg_mask = ~same
            ninf = torch.tensor(float("-inf"), device=sim.device)
            pinf = torch.tensor(float("inf"), device=sim.device)
            hardest_neg = torch.where(neg_mask, sim, ninf).max(dim=1).values
            easiest_pos = torch.where(pos_mask, sim, pinf).min(dim=1).values
            keep_pos = pos_mask & (sim < hardest_neg.unsqueeze(1) + self.epsilon)
            keep_neg = neg_mask & (sim > easiest_pos.unsqueeze(1) - self.epsilon)
            a1, p = torch.where(keep_pos)
            a2, nn_ = torch.where(keep_neg)
            return a1, p, a2, nn_

    class TripletMarginLoss:
        def __init__(self, margin=0.05):
            self.margin = margin

        def __call__(self, embeddings, labels, indices_tuple=None):
            if indices_tuple is None or len(indices_tuple[0]) == 0:
                return embeddings.sum() * 0.0
            a1, p, a2, nn_ = indices_tuple
            n = embeddings.shape[0]
            keep_pos = torch.zeros((n, n), dtype=torch.bool, device=embeddings.device)
            keep_neg = torch.zeros((n, n), dtype=torch.bool, device=embeddings.device)
            keep_pos[a1, p] = True
            keep_neg[a2, nn_] = True
            # all (a, p, n) combos sharing the anchor (vectorized over B³)
            valid = keep_pos.unsqueeze(2) & keep_neg.unsqueeze(1)
            if not valid.any():
                return embeddings.sum() * 0.0
            d = torch.cdist(embeddings, embeddings, p=2)
            viol = torch.relu(d.unsqueeze(2) - d.unsqueeze(1) + self.margin)
            viol = torch.where(valid, viol, torch.zeros_like(viol))
            nz = viol > 0
            if nz.sum() == 0:
                return embeddings.sum() * 0.0
            return viol[nz].mean()

    pml = types.ModuleType("pytorch_metric_learning")
    miners_mod = types.ModuleType("pytorch_metric_learning.miners")
    losses_mod = types.ModuleType("pytorch_metric_learning.losses")
    miners_mod.MultiSimilarityMiner = MultiSimilarityMiner
    losses_mod.TripletMarginLoss = TripletMarginLoss
    pml.miners = miners_mod
    pml.losses = losses_mod
    sys.modules["pytorch_metric_learning"] = pml
    sys.modules["pytorch_metric_learning.miners"] = miners_mod
    sys.modules["pytorch_metric_learning.losses"] = losses_mod


def _shim_hardcoded_cuda():
    """The reference hardcodes ``.to("cuda")`` at inference_ORCED.py:247
    (SURVEY.md §7.3 — breaks CPU runs of that path). Map cuda→cpu."""
    import torch

    orig_to = torch.Tensor.to

    def to_cpu(self, *a, **k):
        a = tuple("cpu" if x == "cuda" else x for x in a)
        if k.get("device") == "cuda":
            k["device"] = "cpu"
        return orig_to(self, *a, **k)

    torch.Tensor.to = to_cpu


def ensure_raw(raw_dir: str):
    if os.path.isdir(raw_dir) and os.listdir(raw_dir):
        return
    sys.path.insert(0, REPO)
    from opensetgaitrecognition_pcaa_tpu.data.synthetic import (
        generate_synthetic_raw_dataset,
    )

    generate_synthetic_raw_dataset(
        raw_dir,
        n_subjects=10,
        tracks_per_scenario=10,
        frames_per_track=(40, 64),
        seed=42,
    )


def run_single_seed(args) -> dict:
    import numpy as np

    seed = args.single_seed
    seed_dir = os.path.abspath(os.path.join(args.workdir, f"seed{seed}"))
    ref_dir = os.path.join(seed_dir, "ref")
    raw_dir = os.path.abspath(os.path.join(args.workdir, "raw"))
    ensure_raw(raw_dir)
    if os.path.isdir(ref_dir):
        shutil.rmtree(ref_dir)
    os.makedirs(ref_dir)
    gen_dir = os.path.join(ref_dir, "data", "generated_dataset")

    # ---------------- reference side: patch constants, cwd=ref_dir --------
    _stub_wandb()
    os.chdir(ref_dir)  # reference writes models/, figures/, data/ to cwd
    sys.path.insert(0, REFERENCE)
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)

    import constants

    constants.DATA_PATH = raw_dir
    constants.GEN_DATA_PATH = gen_dir
    constants.EPOCHS = args.epochs
    constants.TRAIN_CLASSES = list(TRAIN_CLASSES)
    constants.WANDB_MODE = "disabled"
    for key, val in TINY.items():
        setattr(constants, key, val)
    constants.DEC_MLP_SIZE = (
        constants.NSTEPS * constants.NMAX * constants.NFEATURES
    )
    for key in list(constants.CONFIG):
        if hasattr(constants, key):
            constants.CONFIG[key] = getattr(constants, key)
    constants.CONFIG["EPOCHS"] = args.epochs
    constants.CONFIG["TRAIN_CLASSES"] = list(TRAIN_CLASSES)

    from datasets import MSRadarDataset

    MSRadarDataset.generate_splits(
        train_classes=list(TRAIN_CLASSES),
        seed=0,
        safe_mode=False,
        nmax_points=constants.NMAX,
    )

    # --- framework training FIRST (reads the same crop files before the
    # reference's inference regenerates them) ------------------------------
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
    from opensetgaitrecognition_pcaa_tpu.train import train_pcaa

    fw_name = "FW_V4"
    fw_models = os.path.join(seed_dir, "models_fw")
    fw_cfg = Config(
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
        FIGURES_PATH=os.path.join(seed_dir, "figures_fw"),
        MODEL_NAME=fw_name,
        SEED=seed,
        COMPUTE_DTYPE="float32",
    )
    print(f"[seed {seed}] training framework V4 ({args.epochs} epochs)...")
    fw_out = train_pcaa(fw_cfg, VARIATION.V4, verbose=False, resume=False)

    # --- reference training ------------------------------------------------
    ref_name = "REF_V4"
    config = dict(constants.CONFIG)
    config["MODEL_NAME"] = ref_name
    config["NOTES"] = ""
    print(f"[seed {seed}] training reference V4 ({args.epochs} epochs)...")
    import contextlib

    import PCAA_ablation

    with open(os.path.join(seed_dir, "ref_train.log"), "w") as log:
        with contextlib.redirect_stdout(log):
            PCAA_ablation.train_variant4(config, wandb_mode="disabled")

    # --- reference inference (regenerates splits per its own contract) ----
    print(f"[seed {seed}] reference open-set inference...")
    np.random.seed(10_000 + seed)  # pad/subsample RNG for the regeneration
    import inference_PCAA

    # no LaTeX in this image: keep the reference's plot but drop usetex
    _orig_update = type(inference_PCAA.plt.rcParams).update

    def _update_no_tex(self, other=(), **kw):
        d = dict(other, **kw)
        d.pop("text.usetex", None)
        _orig_update(self, d)

    inference_PCAA.plt.rcParams.update = types.MethodType(
        _update_no_tex, inference_PCAA.plt.rcParams
    )
    ks = [int(k) for k in args.ks]
    from opensetgaitrecognition_pcaa_tpu.infer import pcaa_inference

    # One k per CGAAE_inference call: its setup regenerates the splits for
    # EVERY k (the pad/subsample draws differ each time), so the framework
    # must score right after each regeneration to see identical crops.
    ref_metrics, fw_metrics = {}, {}
    for k in ks:
        with open(os.path.join(seed_dir, "ref_infer.log"), "a") as log:
            with contextlib.redirect_stdout(log):
                inference_PCAA.CGAAE_inference(
                    [ref_name], ks=[k], variation=inference_PCAA.VARIATION.V4
                )
        with open(
            os.path.join(ref_dir, "models", ref_name, f"naive_seq_log_{k}.json")
        ) as f:
            ref_metrics[str(k)] = json.load(f)

        print(f"[seed {seed}] framework open-set inference (k={k})...")
        pcaa_inference(
            [fw_name],
            [k],
            models_path=fw_models,
            figures_path=os.path.join(seed_dir, "figures_fw"),
            variation=VARIATION.V4,
            generate_dataset=False,
        )
        with open(os.path.join(fw_models, fw_name, f"naive_seq_log_{k}.json")) as f:
            fw_metrics[str(k)] = json.load(f)

    # ================= ORCED leg ==========================================
    ref_orced = fw_orced = None
    if not args.no_orced:
        from sklearn.metrics import f1_score

        _stub_pytorch_metric_learning()
        _shim_hardcoded_cuda()
        np.random.seed(20_000 + seed)
        torch.manual_seed(20_000 + seed)
        MSRadarDataset.generate_splits(
            train_classes=list(TRAIN_CLASSES),
            seed=0,
            safe_mode=False,
            nmax_points=constants.NMAX,
        )

        # framework ORCED first (same crop files as the reference's training)
        from opensetgaitrecognition_pcaa_tpu.train import train_orced

        fw_oname = "FW_ORCED"
        fw_ocfg = fw_cfg.replace(
            MODEL_NAME=fw_oname,
            TRIPLET_W=1.0,
            CE_W=1.0,
            REC_W=1.0,
            KL_W=1.0,
            TRIPLET_MARGIN=0.5,
        )
        print(f"[seed {seed}] training framework ORCED...")
        train_orced(fw_ocfg, verbose=False, resume=False)

        ref_oname = "REF_ORCED"
        oconfig = dict(constants.CONFIG)
        oconfig.update(
            MODEL_NAME=ref_oname,
            NOTES="",
            TRIPLET_W=1,
            CE_W=1,
            REC_W=1,
            KL_W=1,
            TRIPLET_MARGIN=0.5,
        )
        print(f"[seed {seed}] training reference ORCED...")
        import train_ORCED as ref_train_orced_mod

        with open(os.path.join(seed_dir, "ref_orced_train.log"), "w") as log:
            with contextlib.redirect_stdout(log):
                ref_train_orced_mod.train_ORCED(oconfig)

        print(f"[seed {seed}] reference ORCED open-set inference...")
        np.random.seed(30_000 + seed)  # regeneration RNG (authentic contract)
        import inference_ORCED

        with open(os.path.join(seed_dir, "ref_orced_infer.log"), "w") as log:
            with contextlib.redirect_stdout(log):
                inference_ORCED.ORCED_inference([ref_oname])
        rp = np.load(
            os.path.join(
                ref_dir, "figures", ref_oname, "ensemble_ood_final_preds_fixed.npy"
            )
        )
        rl = np.load(
            os.path.join(
                ref_dir, "figures", ref_oname, "ensemble_ood_final_labels_fixed.npy"
            )
        )
        ref_orced = {
            "f1_micro": float(f1_score(rl, rp, average="micro")),
            "f1_macro": float(f1_score(rl, rp, average="macro")),
            "f1_weighted": float(f1_score(rl, rp, average="weighted")),
        }

        print(f"[seed {seed}] framework ORCED open-set inference...")
        from opensetgaitrecognition_pcaa_tpu.infer import orced_inference

        fw_ores = orced_inference(
            [fw_oname],
            models_path=fw_models,
            figures_path=os.path.join(seed_dir, "figures_fw"),
            generate_dataset=False,
            batch_size=64,
        )[fw_oname]
        fw_orced = {
            m: float(fw_ores[m]) for m in ("f1_micro", "f1_macro", "f1_weighted")
        }

    result = {
        "seed": seed,
        "epochs": args.epochs,
        "train_classes": TRAIN_CLASSES,
        "dims": TINY,
        "ref": ref_metrics,
        "fw": fw_metrics,
        "ref_orced": ref_orced,
        "fw_orced": fw_orced,
        "fw_best_valid_acc": fw_out.get("best_valid_accuracy"),
    }
    with open(os.path.join(seed_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(f"[seed {seed}] done: {json.dumps(result['ref'])} vs {json.dumps(result['fw'])}")
    return result


def aggregate(args, results):
    ks = [str(k) for k in args.ks]
    rows = []
    for r in results:
        for k in ks:
            for metric in ("f1_micro", "f1_macro", "f1_weighted"):
                rows.append(
                    dict(
                        seed=r["seed"],
                        model="PCAA_V4",
                        k=int(k),
                        metric=metric,
                        ref=r["ref"][k][metric],
                        fw=r["fw"][k][metric],
                        delta=r["fw"][k][metric] - r["ref"][k][metric],
                    )
                )
        if r.get("ref_orced") and r.get("fw_orced"):
            for metric in ("f1_micro", "f1_macro", "f1_weighted"):
                rows.append(
                    dict(
                        seed=r["seed"],
                        model="ORCED",
                        k=None,
                        metric=metric,
                        ref=r["ref_orced"][metric],
                        fw=r["fw_orced"][metric],
                        delta=r["fw_orced"][metric] - r["ref_orced"][metric],
                    )
                )
    import numpy as np

    deltas = np.array([row["delta"] for row in rows])
    ref_spread = {}
    for k in ks:
        vals = [r["ref"][k]["f1_micro"] for r in results]
        ref_spread[k] = float(np.max(vals) - np.min(vals))

    summary = dict(
        n_seeds=len(results),
        epochs=args.epochs,
        ks=[int(k) for k in ks],
        dims=TINY,
        train_classes=TRAIN_CLASSES,
        mean_delta=float(np.mean(deltas)),
        mean_abs_delta=float(np.mean(np.abs(deltas))),
        max_abs_delta=float(np.max(np.abs(deltas))),
        ref_seed_spread_f1_micro=ref_spread,
        rows=rows,
    )
    md = [
        "# PARITY_MEASURED — framework vs the actual PyTorch reference\n",
        f"End-to-end open-set F1, both sides trained on IDENTICAL generated",
        f"splits and scored on IDENTICAL eval crops (see",
        f"`tools/parity_vs_reference.py`). {len(results)} seeds ×",
        f"k∈{{{', '.join(ks)}}} voting windows, {args.epochs} epochs, reduced dims",
        f"(NMAX={TINY['NMAX']}, NSTEPS={TINY['NSTEPS']},",
        f"filters={TINY['DTC_FILTERS']}, latent=32), synthetic 10-subject set,",
        f"train classes {TRAIN_CLASSES} (openness "
        f"{1 - (2 * len(TRAIN_CLASSES) / (len(TRAIN_CLASSES) + 10)) ** 0.5:.3f}).\n",
        "| seed | model | k | metric | reference | framework | Δ (fw−ref) |",
        "|---|---|---|---|---|---|---|",
    ]
    for row in rows:
        k_str = "—" if row["k"] is None else str(row["k"])
        md.append(
            f"| {row['seed']} | {row['model']} | {k_str} | {row['metric']} | "
            f"{row['ref']:.4f} | {row['fw']:.4f} | {row['delta']:+.4f} |"
        )
    # distribution-level comparison: is the framework's F1 distribution
    # statistically distinguishable from the reference's?
    md_groups = []
    group_stats = {}
    for model in ("PCAA_V4", "ORCED"):
        for k in [int(x) for x in ks] if model == "PCAA_V4" else [None]:
            for metric in ("f1_micro", "f1_macro", "f1_weighted"):
                sel = [
                    r
                    for r in rows
                    if r["model"] == model and r["k"] == k and r["metric"] == metric
                ]
                if not sel:
                    continue
                d = np.array([r["delta"] for r in sel])
                se = float(d.std(ddof=1) / np.sqrt(len(d))) if len(d) > 1 else 0.0
                group_stats[f"{model}/k={k}/{metric}"] = dict(
                    mean_ref=float(np.mean([r["ref"] for r in sel])),
                    mean_fw=float(np.mean([r["fw"] for r in sel])),
                    paired_mean_delta=float(d.mean()),
                    paired_se=se,
                )
                md_groups.append(
                    f"| {model} | {'—' if k is None else k} | {metric} | "
                    f"{np.mean([r['ref'] for r in sel]):.4f} | "
                    f"{np.mean([r['fw'] for r in sel]):.4f} | "
                    f"{d.mean():+.4f} ± {se:.4f} |"
                )
    summary["group_stats"] = group_stats
    # write the JSON only after group_stats lands in summary — an earlier
    # version dumped it first and the per-group paired-Δ stats never
    # reached the artifact
    out_json = os.path.join(REPO, "PARITY_MEASURED.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)

    md += [
        "",
        f"**mean Δ = {summary['mean_delta']:+.4f}**, "
        f"mean |Δ| = {summary['mean_abs_delta']:.4f}, "
        f"max |Δ| = {summary['max_abs_delta']:.4f}.",
        "",
        "### Distribution-level summary (mean over seeds, paired Δ ± SE)",
        "",
        "| model | k | metric | mean reference | mean framework | paired Δ ± SE |",
        "|---|---|---|---|---|---|",
        *md_groups,
        "",
        "Scope of this measurement: it compares END-TO-END (training +",
        "inference) F1 distributions, so its resolution is bounded by the",
        "reference's own training noise (unseeded torch/numpy draws); paired",
        "deltas within ~1–2 SE of zero show no detectable framework bias AT",
        "THIS NOISE FLOOR — they do not by themselves establish the ±0.5%",
        "BASELINE.json target. The fine-grained claims are carried by (a)",
        "DECISION_PARITY.md — the composed inference pipelines agree",
        "decision-for-decision on shared weights; (b) PARITY_CRN.md — twin",
        "trainings on ONE shared random realization (init/batch-order/noise",
        "recorded from the reference and replayed), which removes this",
        "noise floor by construction; and (c) the module-level",
        "weight-transplant tests (tests/test_parity.py) and decision-math",
        "transcription tests (tests/test_decision_parity.py) at f32/f64",
        "tolerance on identical inputs.",
        "",
        "Noise floor: the reference itself draws unseeded numpy training",
        "noise (`PCAA_ablation.py:913-926`) and iterates python sets for its",
        "sequential eval order (`datasets.py:397-413`), so two reference runs",
        "differ; the reference's own seed-to-seed f1_micro spread here is "
        f"{json.dumps(ref_spread)} per k. Deltas within that spread are",
        "training noise, not framework bias.",
        "",
        "ORCED caveat: `pytorch_metric_learning` is not installed in this",
        "image; the reference ORCED training ran with a faithful torch",
        "transcription of `MultiSimilarityMiner` + `TripletMarginLoss`",
        "(`tools/parity_vs_reference.py::_stub_pytorch_metric_learning`,",
        "semantics per Wang et al. CVPR 2019 and the library defaults), and",
        "with the hardcoded-cuda shim for `inference_ORCED.py:247`.",
    ]
    with open(os.path.join(REPO, "PARITY_MEASURED.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"\nwrote {out_json} and PARITY_MEASURED.md")
    print(
        f"mean delta {summary['mean_delta']:+.4f}  "
        f"max |delta| {summary['max_abs_delta']:.4f}"
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/parity_vs_reference")
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--ks", type=int, nargs="+", default=[1, 6])
    p.add_argument("--single-seed", type=int, default=None)
    p.add_argument("--no-orced", action="store_true", help="skip the ORCED leg")
    args = p.parse_args()

    if args.single_seed is not None:
        run_single_seed(args)
        return

    os.makedirs(args.workdir, exist_ok=True)
    results = []
    for s in args.seeds:
        res_path = os.path.join(args.workdir, f"seed{s}", "result.json")
        if not os.path.exists(res_path):
            print(f"=== seed {s} ===")
            subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--single-seed",
                    str(s),
                    "--workdir",
                    os.path.abspath(args.workdir),
                    "--epochs",
                    str(args.epochs),
                    "--ks",
                    *[str(k) for k in args.ks],
                ]
                + (["--no-orced"] if args.no_orced else []),
                check=True,
            )
        with open(res_path) as f:
            r = json.load(f)
        # a cached result from an earlier invocation with different
        # --epochs/--ks would crash the aggregate (missing k keys) or,
        # worse, silently mislabel the measurement
        ref_ks = set((r.get("ref") or {}).keys())
        if r.get("epochs") != args.epochs or not set(
            str(k) for k in args.ks
        ) <= ref_ks:
            raise SystemExit(
                f"{res_path} was produced with epochs={r.get('epochs')} / "
                f"ks={sorted(ref_ks)}, not the requested "
                f"epochs={args.epochs} / ks={args.ks} — use a fresh "
                "--workdir (or delete the stale seed dirs)"
            )
        results.append(r)
        # Aggregate incrementally: a multi-hour sweep interrupted at seed k
        # still leaves a complete PARITY_MEASURED for the seeds finished.
        aggregate(args, results)


if __name__ == "__main__":
    main()
