#!/usr/bin/env python
"""Shared-weights decision parity at the PUBLISHED reference dimensions.

Round-3 verdict item 1: every decision-level parity rung so far ran at
reduced dims (NMAX=48/NSTEPS=12). This tool closes that gap at the
configuration the paper actually publishes (``/root/reference/constants.py:
29-55``: NMAX=150, NSTEPS=30, CROP_STEP=6, POINTNET_OUT_DIM=1024,
DTC_FILTERS=[16..512], SUP_LATENT_DIM=32, EPOCHS=50):

1. ``--phase train`` (TPU): generate a synthetic raw set + full-dims splits,
   train one PCAA V4 and one ORCED run with the bench fast config
   (bf16 compute + BF16_ADAM_NU + BF16_WEIGHT_CACHE) on the TPU, and export
   both to reference-format torch run folders
   (``scripts/export_reference_run.py``).
2. ``--phase compare`` (CPU): run the reference's ACTUAL ``CGAAE_inference``
   / ``ORCED_inference`` (``inference_PCAA.py:382-469``,
   ``inference_ORCED.py:257-456``) on the exported folders, the framework's
   ``pcaa_inference`` / ``orced_inference`` on the SAME regenerated crops,
   and join decisions per crop exactly as ``tools/decision_parity.py`` does.
   ORCED pins the reference's eval-time reparametrization noise by recording
   every ``torch.randn_like`` draw (``models.py:494-496``) and replaying it
   through ``orced_inference(eps_streams=..., crop_order=...)`` — the
   pipelines are compared directly instead of against the reference's
   ~0.29 sampling-noise floor.
3. After each CPU comparison, a TPU subprocess (``--phase tpu-pcaa`` /
   ``--phase tpu-orced``) re-runs the framework inference on the very same
   on-disk crops through the TPU fast path (fused Pallas eval encoder +
   on-device scoring, ``infer/fast_encoder.py``) — the paths that only
   engage at these dims — and compares against the same reference decisions.

``--phase all`` orchestrates train → compare as subprocesses (the train
phase needs the TPU platform, the compare phase forces jax to CPU).

Writes ``DECISION_PARITY_FULL.json`` and splices a "Full reference dims"
section into ``DECISION_PARITY.md``.
"""

import argparse
import contextlib
import json
import os
import pickle
import shutil
import subprocess
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
    reference_pcaa_window_map,
    revote_windows,
    strip_usetex,
)
from tools.parity_vs_reference import (  # noqa: E402
    TRAIN_CLASSES,
    _shim_hardcoded_cuda,
    _stub_wandb,
)

PCAA_NAME = "FWFULL_V4"
ORCED_NAME = "FWFULL_ORCED"
LATENT = 32  # the reference hardcodes cov=np.eye(32) (inference_PCAA.py:133)
ORCED_BS = 64  # inference_ORCED.py:262


def paths(workdir):
    workdir = os.path.abspath(workdir)
    return dict(
        workdir=workdir,
        raw_dir=os.path.join(workdir, "raw_full"),
        ref_dir=os.path.join(workdir, "ref"),
        gen_dir=os.path.join(workdir, "ref", "data", "generated_dataset"),
        fw_models=os.path.join(workdir, "models_fw"),
        fw_figs=os.path.join(workdir, "figures_fw"),
        state_pcaa=os.path.join(workdir, "state_pcaa.pkl"),
        state_orced=os.path.join(workdir, "state_orced.pkl"),
        tpu_pcaa=os.path.join(workdir, "tpu_pcaa.json"),
        tpu_orced=os.path.join(workdir, "tpu_orced.json"),
    )


# ---------------------------------------------------------------------------
# phase: train (runs on the TPU — default platform)
# ---------------------------------------------------------------------------


def phase_train(args):
    P = paths(args.workdir)
    os.makedirs(P["workdir"], exist_ok=True)

    from opensetgaitrecognition_pcaa_tpu.config import VARIATION, Config
    from opensetgaitrecognition_pcaa_tpu.data.splits import generate_splits
    from opensetgaitrecognition_pcaa_tpu.data.synthetic import (
        generate_synthetic_raw_dataset,
    )
    from opensetgaitrecognition_pcaa_tpu.train import train_orced, train_pcaa
    from scripts.export_reference_run import export_reference_run

    if not (os.path.isdir(P["raw_dir"]) and os.listdir(P["raw_dir"])):
        # longer tracks than the reduced-dims harnesses: NSTEPS=30/CROP_STEP=6
        # needs 60-100-frame tracks for a healthy 6-12 crops per track
        generate_synthetic_raw_dataset(
            P["raw_dir"],
            n_subjects=10,
            tracks_per_scenario=10,
            frames_per_track=(60, 100),
            seed=42,
        )

    cfg = Config(  # full published dims are the Config defaults
        EPOCHS=args.epochs,
        TRAIN_CLASSES=tuple(TRAIN_CLASSES),
        DATA_PATH=P["raw_dir"],
        GEN_DATA_PATH=P["gen_dir"],
        MODELS_PATH=P["fw_models"],
        FIGURES_PATH=P["fw_figs"],
        MODEL_NAME=PCAA_NAME,
        SEED=args.seed,
        COMPUTE_DTYPE="bfloat16",
        BF16_ADAM_NU=True,
        BF16_WEIGHT_CACHE=True,
    )

    done = all(
        os.path.isdir(os.path.join(P["fw_models"], n))
        for n in (PCAA_NAME, ORCED_NAME)
    )
    wall = {}
    if args.skip_train and done:
        print("[full] --skip-train: reusing existing trained runs")
    else:
        print("[full] generating full-dims splits...")
        generate_splits(
            data_path=P["raw_dir"],
            gen_data_path=P["gen_dir"],
            train_classes=list(TRAIN_CLASSES),
            seed=0,
            nmax_points=cfg.NMAX,
            nsteps=cfg.NSTEPS,
            crop_step=cfg.CROP_STEP,
            verbose=False,
        )
        print(f"[full] training {PCAA_NAME} ({args.epochs} epochs, TPU bench config)...")
        t0 = time.time()
        train_pcaa(cfg, VARIATION.V4, verbose=True, resume=False)
        wall["pcaa_train_s"] = time.time() - t0
        print(f"[full] {PCAA_NAME} trained in {wall['pcaa_train_s']:.1f}s")
        t0 = time.time()
        print(f"[full] training {ORCED_NAME}...")
        train_orced(cfg.replace(MODEL_NAME=ORCED_NAME), verbose=True, resume=False)
        wall["orced_train_s"] = time.time() - t0
        print(f"[full] {ORCED_NAME} trained in {wall['orced_train_s']:.1f}s")

    ref_models = os.path.join(P["ref_dir"], "models")
    os.makedirs(ref_models, exist_ok=True)
    for name in (PCAA_NAME, ORCED_NAME):
        export_reference_run(os.path.join(P["fw_models"], name), ref_models)
    with open(os.path.join(P["workdir"], "train_wall.json"), "w") as f:
        json.dump(wall, f)
    print("[full] train phase done")


# ---------------------------------------------------------------------------
# phase: compare (forces jax to CPU; drives the torch reference in-process)
# ---------------------------------------------------------------------------


def patch_constants_fulldims(P):
    """Point the reference at the workdir; dims stay the PUBLISHED defaults."""
    import constants

    constants.DATA_PATH = P["raw_dir"]
    constants.GEN_DATA_PATH = P["gen_dir"]
    constants.TRAIN_CLASSES = list(TRAIN_CLASSES)
    constants.WANDB_MODE = "disabled"
    for key in list(constants.CONFIG):
        if hasattr(constants, key):
            constants.CONFIG[key] = getattr(constants, key)
    return constants


def crop_fingerprint(gen_dir):
    """sha256 over the on-disk TEST+UNSEEN crop bytes.

    The reference's inference drivers REGENERATE the crop set with unseeded
    pad/subsample draws (SURVEY §7.3), so the files in ``gen_dir`` only
    match a pickled calibration if nothing regenerated them in between —
    running the ORCED section (np.random.seed(30_000) stream) after the
    PCAA state dump rewrites every crop. ``phase_tpu_pcaa`` asserts this
    fingerprint so a stale-crop mismatch fails loudly instead of producing
    a bogus attribution matrix (observed: max|Δll| ≈ 12 and 0.82 agreement
    when scoring ORCED-regenerated crops against a PCAA-pass calibration).
    """
    import hashlib

    h = hashlib.sha256()
    for split in ("test", "unseen"):
        d = os.path.join(gen_dir, split)
        for name in sorted(os.listdir(d)):
            h.update(name.encode())
            with open(os.path.join(d, name), "rb") as f:
                h.update(f.read())
    return h.hexdigest()


def spawn_tpu_phase(phase, workdir):
    """Run a --phase tpu-* subprocess on the default (TPU) platform; the
    parent stays blocked (idle) so the child owns the 1 CPU core during its
    XLA compile (ops-hygiene note in CLAUDE.md)."""
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--phase",
        phase,
        "--workdir",
        workdir,
    ]
    print(f"[full] spawning TPU subprocess: {phase}...")
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        print(f"[full] WARNING: {phase} subprocess failed (rc={r.returncode})")
    return r.returncode == 0


def phase_compare(args):
    P = paths(args.workdir)
    _stub_wandb()
    os.chdir(P["ref_dir"])  # reference reads models/ figures/ relative to cwd
    sys.path.insert(0, REFERENCE)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    patch_constants_fulldims(P)

    from constants import SPLIT as REF_SPLIT
    from datasets import MSRadarDataset

    from opensetgaitrecognition_pcaa_tpu.config import SPLIT, VARIATION
    from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
    from opensetgaitrecognition_pcaa_tpu.infer import (
        orced_inference,
        pcaa_inference,
    )

    report = {
        "dims": dict(NMAX=150, NSTEPS=30, CROP_STEP=6, POINTNET_OUT_DIM=1024,
                     DTC_FILTERS=[16, 32, 64, 128, 256, 512],
                     SUP_LATENT_DIM=32),
        "epochs": args.epochs,
        "seed": args.seed,
        "ks": args.ks,
        "train_classes": list(TRAIN_CLASSES),
    }
    if args.merge_report:
        # start from the existing report so a partial re-run (e.g. a margin
        # re-measurement of one k with --no-orced --no-tpu) refreshes only
        # the sections it actually recomputes
        existing = os.path.join(REPO, "DECISION_PARITY_FULL.json")
        if os.path.isfile(existing):
            with open(existing) as f:
                old = json.load(f)
            old.update(report)
            old["ks"] = sorted(
                set(old.get("ks", [])) | set(args.ks), reverse=True
            )
            report = old
    if os.path.isfile(os.path.join(P["workdir"], "train_wall.json")):
        with open(os.path.join(P["workdir"], "train_wall.json")) as f:
            report["train_wall_s"] = json.load(f)

    # ---------------- PCAA ----------------
    import inference_PCAA

    strip_usetex(inference_PCAA.plt.rcParams)
    pcaa_rows = []
    for k in args.ks:
        print(f"[full] PCAA k={k}: reference inference (torch, CPU)...")
        np.random.seed(10_000 + k)  # split-regeneration pad/subsample stream
        t0 = time.time()
        with open(os.path.join(P["workdir"], "ref_pcaa_infer.log"), "a") as log:
            with contextlib.redirect_stdout(log):
                inference_PCAA.CGAAE_inference(
                    [PCAA_NAME], ks=[k], variation=inference_PCAA.VARIATION.V4
                )
        ref_s = time.time() - t0
        ref_preds = np.load(
            os.path.join(P["ref_dir"], "models", PCAA_NAME, f"final_preds_{k}.npy")
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
        ref_files = [os.path.basename(f) for f in ref_test.filenames] + [
            os.path.basename(f) for f in ref_unseen.filenames
        ]

        print(f"[full] PCAA k={k}: framework inference (flax, CPU)...")
        t0 = time.time()
        pcaa_inference(
            [PCAA_NAME],
            [k],
            models_path=P["fw_models"],
            figures_path=P["fw_figs"],
            variation=VARIATION.V4,
            generate_dataset=False,
            dump_calibration=True,
        )
        fw_s = time.time() - t0
        fw_preds = np.load(
            os.path.join(P["fw_models"], PCAA_NAME, f"final_preds_{k}.npy")
        )
        fw_test = RadarCropDataset(SPLIT.TEST, P["gen_dir"], sequential=True)
        fw_unseen = RadarCropDataset(SPLIT.UNSEEN, P["gen_dir"], sequential=True)
        fw_map = framework_pcaa_window_map(
            fw_test, fw_unseen, fw_preds, k, val_subjects
        )
        head = agreement(fw_map, ref_map)
        n_cls = len(TRAIN_CLASSES)

        # margin attribution of any disagreements: the framework's per-crop
        # |score − threshold| margins for every crop whose window decision
        # differs (one near-threshold member can flip an entire k-window;
        # the npz is this k's calibration as dumped by pcaa_inference on
        # THIS k's regenerated crops)
        cal_k = dict(
            np.load(os.path.join(P["fw_models"], PCAA_NAME, "calibration.npz"))
        )
        cal_k["log_threshold"] = float(cal_k["log_threshold"])
        cal_k["n_labels"] = int(cal_k["n_labels"])
        ll_all = np.concatenate([cal_k["test_ll"], cal_k["unseen_ll"]])
        files_all = list(fw_test.filenames) + list(fw_unseen.filenames)
        pos = {f: i for i, f in enumerate(files_all)}
        margin = ll_all - cal_k["log_threshold"]
        disagree = sorted(
            f for f in set(fw_map) & set(ref_map) if fw_map[f] != ref_map[f]
        )
        dis_margins = [
            dict(crop=f, fw_margin=float(margin[pos[f]]),
                 ref=int(ref_map[f]), fw=int(fw_map[f]))
            for f in disagree
        ]
        finite = np.isfinite(margin)
        median_abs_margin = float(np.median(np.abs(margin[finite])))

        # same-composition re-vote: the framework's per-crop scores voted on
        # the REFERENCE's window composition (the headline crop agreement at
        # k > 1 also reflects the documented sequential-ordering deviation —
        # different crops share a window; this isolates pure numerics, the
        # statistic the reduced-dims rung reports: tools/decision_parity.py)
        order = np.array([pos[f] for f in ref_files])
        ll_r = ll_all[order]
        pred_r = np.concatenate(
            [cal_k["test_preds"], cal_k["unseen_preds"]]
        )[order]
        lab_r = np.concatenate(
            [fw_test.labels, fw_unseen.labels]
        )[order]
        thr = cal_k["log_threshold"]
        revote = revote_windows(
            ll_r, pred_r, ref_wins, k, thr, cal_k["n_labels"]
        )
        assert_window_alignment(lab_r, ref_wins, n_test_wins, ref_test_labels)
        same_comp = float(np.mean(revote == ref_preds))
        sc_dis = revote != ref_preds
        sc_flip_margins = [
            dict(
                window=int(i),
                member_margins=[float(margin[j]) for j in order[ref_wins[i]]],
                ref=int(ref_preds[i]),
                fw=int(revote[i]),
            )
            for i in np.flatnonzero(sc_dis)
        ]

        row = dict(
            k=k,
            crop_agreement=head,
            same_composition_window_agreement=same_comp,
            n_same_composition_flips=int(sc_dis.sum()),
            same_composition_flip_margins=sc_flip_margins,
            unknown_rate_ref=float(np.mean(ref_preds == n_cls)),
            unknown_rate_fw=float(np.mean(fw_preds == n_cls)),
            n_windows_ref=len(ref_preds),
            n_windows_fw=len(fw_preds),
            ref_inference_s=ref_s,
            fw_inference_s=fw_s,
            n_disagree_crops=len(disagree),
            disagree_margins=dis_margins,
            median_abs_margin=median_abs_margin,
        )
        pcaa_rows.append(row)
        print(
            f"[full] PCAA k={k}: crop agreement {head['agree']:.4f} "
            f"(n={head['n_common']}), same-composition window agreement "
            f"{same_comp:.4f} ({int(sc_dis.sum())} flips), "
            f"ref {ref_s:.0f}s vs fw {fw_s:.0f}s"
        )
        if k == args.ks[-1]:
            # hand the last k's reference decisions (and the on-disk crops, as
            # regenerated by THIS k's reference pass) to the TPU subprocess,
            # plus the framework's CPU calibration scores — the baseline the
            # TPU attribution configs are measured against (per-crop score
            # deltas, threshold movement, flip margins). cal_k IS this k's
            # calibration (dumped above by the same pcaa_inference call).
            with open(P["state_pcaa"], "wb") as f:
                pickle.dump(
                    dict(k=k, ref_map=ref_map, val_subjects=val_subjects,
                         fw_map_cpu=fw_map, cal_cpu=cal_k,
                         crop_fingerprint=crop_fingerprint(P["gen_dir"])),
                    f,
                )
    if args.merge_report and "pcaa_cpu" in report:
        done_ks = {r["k"] for r in pcaa_rows}
        pcaa_rows = [
            r for r in report["pcaa_cpu"] if r["k"] not in done_ks
        ] + pcaa_rows
        pcaa_rows.sort(key=lambda r: -r["k"])
    report["pcaa_cpu"] = pcaa_rows
    if not args.no_tpu and spawn_tpu_phase("tpu-pcaa", P["workdir"]):
        with open(P["tpu_pcaa"]) as f:
            report["pcaa_tpu"] = json.load(f)

    # ---------------- ORCED (pinned reparam noise) ----------------
    if not args.no_orced:
        from tools.parity_twin_orced import RandnRecorder

        _shim_hardcoded_cuda()
        import inference_ORCED

        strip_usetex(inference_ORCED.plt.rcParams)
        print("[full] ORCED: reference inference (torch+scipy mvn, CPU — slow)...")
        np.random.seed(30_000)  # split-regeneration stream
        randn = RandnRecorder()
        randn.install()
        t0 = time.time()
        with open(os.path.join(P["workdir"], "ref_orced_infer.log"), "a") as log:
            with contextlib.redirect_stdout(log):
                inference_ORCED.ORCED_inference([ORCED_NAME])
        ref_s = time.time() - t0
        randn.uninstall()
        print(f"[full] ORCED reference inference: {ref_s:.0f}s")
        fig_dir = os.path.join(P["ref_dir"], "figures", ORCED_NAME)
        ref_preds = np.load(
            os.path.join(fig_dir, "ensemble_ood_final_preds_fixed.npy")
        )
        ref_labels = np.load(
            os.path.join(fig_dir, "ensemble_ood_final_labels_fixed.npy")
        )

        # crop order the reference's shuffle=False loaders iterated, and the
        # recorded eps stream sliced per split (assembly per
        # tools/parity_twin_orced.py:426-460)
        ro = {
            s: MSRadarDataset(getattr(REF_SPLIT, s.upper()))
            for s in ("train", "test", "unseen")
        }
        order = {
            s: [os.path.basename(f) for f in ds.filenames]
            for s, ds in ro.items()
        }
        n_tr, n_te, n_un = (len(order[s]) for s in ("train", "test", "unseen"))
        n_tr_keep = (n_tr // ORCED_BS) * ORCED_BS
        b_tr = n_tr_keep // ORCED_BS
        b_te, b_un = -(-n_te // ORCED_BS), -(-n_un // ORCED_BS)
        assert len(randn.draws) == b_tr + b_te + b_un, (
            len(randn.draws),
            (b_tr, b_te, b_un),
        )
        eps_streams = {
            "train": np.concatenate(randn.draws[:b_tr]),
            "test": np.concatenate(randn.draws[b_tr : b_tr + b_te]),
            "unseen": np.concatenate(randn.draws[b_tr + b_te :]),
        }
        assert eps_streams["test"].shape == (n_te, LATENT)
        assert eps_streams["unseen"].shape == (n_un, LATENT)
        eps_streams["train"] = np.concatenate(
            [eps_streams["train"],
             np.zeros((n_tr - n_tr_keep, LATENT), np.float32)]
        )

        print("[full] ORCED: framework inference with pinned eps (CPU)...")
        t0 = time.time()
        orced_inference(
            [ORCED_NAME],
            models_path=P["fw_models"],
            figures_path=P["fw_figs"],
            generate_dataset=False,
            batch_size=ORCED_BS,
            eps_streams=eps_streams,
            crop_order=order,
        )
        fw_s = time.time() - t0
        fw_preds = np.load(
            os.path.join(
                P["fw_figs"], ORCED_NAME, "ensemble_ood_final_preds_fixed.npy"
            )
        )
        fw_labels = np.load(
            os.path.join(
                P["fw_figs"], ORCED_NAME, "ensemble_ood_final_labels_fixed.npy"
            )
        )
        assert len(fw_preds) == len(ref_preds), (len(fw_preds), len(ref_preds))
        assert np.array_equal(fw_labels, ref_labels), "composition mismatch"
        agree = float(np.mean(fw_preds == ref_preds))
        n_cls = len(TRAIN_CLASSES)
        report["orced_cpu"] = dict(
            pinned_eps_agreement=agree,
            n_decisions=int(len(ref_preds)),
            unknown_rate_ref=float(np.mean(ref_preds == n_cls)),
            unknown_rate_fw=float(np.mean(fw_preds == n_cls)),
            ref_inference_s=ref_s,
            fw_inference_s=fw_s,
        )
        print(
            f"[full] ORCED pinned-eps agreement {agree:.4f} "
            f"(n={len(ref_preds)}), ref {ref_s:.0f}s vs fw {fw_s:.0f}s"
        )
        with open(P["state_orced"], "wb") as f:
            pickle.dump(
                dict(eps_streams=eps_streams, crop_order=order,
                     ref_preds=ref_preds, ref_labels=ref_labels),
                f,
            )
        if not args.no_tpu and spawn_tpu_phase("tpu-orced", P["workdir"]):
            with open(P["tpu_orced"]) as f:
                report["orced_tpu"] = json.load(f)

    write_report(report)


# ---------------------------------------------------------------------------
# phases: tpu-pcaa / tpu-orced (default platform — the real chip)
# ---------------------------------------------------------------------------


def _require_tpu():
    import jax

    plat = jax.devices()[0].platform
    if plat == "cpu":
        print("[full] no TPU available — tpu phase skipped")
        return False
    return True


def phase_tpu_pcaa(args):
    """TPU eval-path ATTRIBUTION matrix (round-4 verdict item 2).

    Round 4 measured the TPU fast path flipping 12/927 full-dims decisions
    vs both the torch reference and the framework's own CPU f32 pass, with
    no attribution. This phase re-scores the SAME on-disk crops through a
    2×2 of TPU eval configurations — {fused Pallas kernel, plain XLA} ×
    {HIGHEST (full-f32 MXU passes), DEFAULT (single-bf16-pass) matmul
    precision} — and for each reports crop agreement vs the reference and
    vs the CPU pass, per-crop log-likelihood deltas, threshold movement,
    the flipped crops' |score − threshold| margins, and the open-set F1
    delta. Separates kernel effects from MXU precision effects.
    Reference decision semantics: ``inference_PCAA.py:241-314``.
    """
    if not _require_tpu():
        sys.exit(3)
    P = paths(args.workdir)
    with open(P["state_pcaa"], "rb") as f:
        st = pickle.load(f)
    k = st["k"]
    cal_cpu = st["cal_cpu"]
    if "crop_fingerprint" in st:
        now = crop_fingerprint(P["gen_dir"])
        if now != st["crop_fingerprint"]:
            raise SystemExit(
                "[full] tpu-pcaa: on-disk crops do not match the pickled "
                "CPU calibration (a later inference pass regenerated them "
                "with fresh unseeded pad/subsample draws) — re-run "
                "--phase compare so the state dump and the crops agree"
            )
    from opensetgaitrecognition_pcaa_tpu.config import SPLIT, VARIATION
    from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
    from opensetgaitrecognition_pcaa_tpu.infer.artifacts import openset_metrics
    from opensetgaitrecognition_pcaa_tpu.infer.pcaa import (
        _window_vote,
        calibrate_open_set,
        pcaa_inference_setup,
    )

    cfg_i, enc_i, vars_i, means_i = pcaa_inference_setup(
        PCAA_NAME,
        VARIATION.V4,
        models_path=P["fw_models"],
        generate_dataset=False,
    )
    fw_test = RadarCropDataset(SPLIT.TEST, P["gen_dir"], sequential=True)
    fw_unseen = RadarCropDataset(SPLIT.UNSEEN, P["gen_dir"], sequential=True)
    crop_files = list(fw_test.filenames) + list(fw_unseen.filenames)

    def vote(cal):
        """k-window decisions exactly as ``naive_sequential_procedure``."""
        p1, l1 = _window_vote(
            cal["test_ll"], cal["test_preds"], cal["test_labels"], k,
            cal["log_threshold"], cal["n_labels"],
        )
        p2, l2 = _window_vote(
            cal["unseen_ll"], cal["unseen_preds"], cal["unseen_labels"], k,
            cal["log_threshold"], cal["n_labels"],
            keep_mask=~cal["is_val"], true_label_override=cal["n_labels"],
        )
        return np.array(p1 + p2), np.array(l1 + l2)

    cpu_preds, cpu_labels = vote(cal_cpu)
    cpu_f1 = openset_metrics(cpu_labels, cpu_preds)["f1_micro"]
    cpu_ll = np.concatenate([cal_cpu["test_ll"], cal_cpu["unseen_ll"]])
    cpu_margin = cpu_ll - cal_cpu["log_threshold"]

    configs = [
        # (name, use_pallas, precision) — pallas_highest is the shipped
        # eval default (infer/pcaa.py::_encode_split; its PointNet stage
        # internally routes to folded XLA — the fused kernel's multi-pass
        # f32 schedule OOMs scoped VMEM, ops/pallas/pointnet_infer.py);
        # pallas_default was round 4's shipped path (the 12-flip
        # measurement); the xla_* rows isolate the kernel from MXU
        # precision.
        ("pallas_highest", True, "highest"),
        ("pallas_default", True, None),
        ("xla_highest", False, "highest"),
        ("xla_default", False, None),
    ]
    rows = []
    for name, use_pallas, prec in configs:
        t0 = time.time()
        cal_t = calibrate_open_set(
            enc_i, vars_i, means_i, cfg_i, seed=0, unseen_valid_ratio=0.2,
            precision=prec, use_pallas=use_pallas,
        )
        wall = time.time() - t0
        cal = cal_t._asdict()
        preds, labels = vote(cal)
        assert np.array_equal(labels, cpu_labels), "window composition moved"
        fw_map = framework_pcaa_window_map(
            fw_test, fw_unseen, preds, k, st["val_subjects"]
        )
        ll = np.concatenate([cal["test_ll"], cal["unseen_ll"]])
        finite = np.isfinite(ll) & np.isfinite(cpu_ll)
        dll = np.abs(ll[finite] - cpu_ll[finite])
        margin = ll - cal["log_threshold"]

        # flipped crops vs the CPU pass: their margins on BOTH sides
        flipped = sorted(
            f for f in set(fw_map) & set(st["fw_map_cpu"])
            if fw_map[f] != st["fw_map_cpu"][f]
        )
        pos = {f: i for i, f in enumerate(crop_files)}
        flip_margins = [
            dict(
                crop=f,
                margin_cpu=float(cpu_margin[pos[f]]),
                margin_tpu=float(margin[pos[f]]),
            )
            for f in flipped
        ]
        f1 = openset_metrics(labels, preds)["f1_micro"]
        row = dict(
            config=name,
            use_pallas=use_pallas,
            precision=prec or "default",
            crop_agreement_vs_ref=agreement(fw_map, st["ref_map"]),
            crop_agreement_vs_fw_cpu=agreement(fw_map, st["fw_map_cpu"]),
            n_flipped_vs_cpu=len(flipped),
            max_abs_ll_delta_vs_cpu=float(dll.max()) if dll.size else 0.0,
            median_abs_ll_delta_vs_cpu=(
                float(np.median(dll)) if dll.size else 0.0
            ),
            threshold_delta_vs_cpu=float(
                cal["log_threshold"] - cal_cpu["log_threshold"]
            ),
            median_abs_margin_all=float(
                np.median(np.abs(cpu_margin[np.isfinite(cpu_margin)]))
            ),
            flip_margins=flip_margins,
            f1_micro=f1,
            f1_micro_delta_vs_cpu=float(f1 - cpu_f1),
            inference_s=wall,
        )
        rows.append(row)
        a = row["crop_agreement_vs_ref"]
        print(
            f"[full] PCAA TPU k={k} {name}: vs ref {a['agree']:.4f}, "
            f"vs cpu {row['crop_agreement_vs_fw_cpu']['agree']:.4f} "
            f"({len(flipped)} flips, max|Δll| "
            f"{row['max_abs_ll_delta_vs_cpu']:.2e}, ΔF1 "
            f"{row['f1_micro_delta_vs_cpu']:+.4f}), {wall:.0f}s"
        )

    res = dict(k=k, f1_micro_cpu=cpu_f1, configs=rows)
    with open(P["tpu_pcaa"], "w") as f:
        json.dump(res, f, indent=2)


def phase_tpu_orced(args):
    if not _require_tpu():
        sys.exit(3)
    P = paths(args.workdir)
    with open(P["state_orced"], "rb") as f:
        st = pickle.load(f)
    from opensetgaitrecognition_pcaa_tpu.infer import orced_inference

    def run():
        t0 = time.time()
        orced_inference(
            [ORCED_NAME],
            models_path=P["fw_models"],
            figures_path=P["fw_figs"],
            generate_dataset=False,
            batch_size=ORCED_BS,
            eps_streams=st["eps_streams"],
            crop_order=st["crop_order"],
        )
        return time.time() - t0

    # cold = compile + dispatch + compute; warm reuses the process-lifetime
    # compile cache (infer/common.py::_runner + _orced_fwd), so cold − warm
    # ≈ XLA compile cost over the tunnel. Round 4 (no scan-length sharing)
    # paid one compile PER SPLIT SHAPE: 276 s total; pad_to_steps collapses
    # the three split scans onto one executable (round-4 verdict item 5).
    cold_s = run()
    warm_s = run()
    fw_preds = np.load(
        os.path.join(
            P["fw_figs"], ORCED_NAME, "ensemble_ood_final_preds_fixed.npy"
        )
    )
    agree = float(np.mean(fw_preds == st["ref_preds"]))
    res = dict(
        pinned_eps_agreement_vs_ref=agree,
        n_decisions=int(len(fw_preds)),
        inference_s=cold_s,
        inference_warm_s=warm_s,
    )
    with open(P["tpu_orced"], "w") as f:
        json.dump(res, f, indent=2)
    print(
        f"[full] ORCED TPU: agreement vs ref {agree:.4f}, "
        f"cold {cold_s:.0f}s / warm {warm_s:.0f}s"
    )


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------

SECTION_BEGIN = "<!-- fulldims:begin -->"
SECTION_END = "<!-- fulldims:end -->"


def write_report(report):
    out = os.path.join(REPO, "DECISION_PARITY_FULL.json")
    def _np_safe(o):
        return o.tolist() if hasattr(o, "tolist") else str(o)

    with open(out, "w") as f:
        json.dump(report, f, indent=2, default=_np_safe)
    md = [
        SECTION_BEGIN,
        "",
        "## Full reference dims (published config)\n",
        "`tools/decision_parity_full.py` — the SAME measurement at the",
        "configuration the paper publishes (`constants.py:29-55`: NMAX=150,",
        f"NSTEPS=30, CROP_STEP=6, D=1024, latent=32), {report['epochs']} epochs,",
        "trained ON THE TPU with the bench fast config (bf16 compute +",
        "BF16_ADAM_NU + BF16_WEIGHT_CACHE), exported to torch run folders by",
        "`scripts/export_reference_run.py`, and scored by the reference's own",
        "inference drivers on CPU.\n",
        "### PCAA\n",
        "| k | crop agreement | same-composition window agreement "
        "(flips) | n crops | unknown rate (ref / fw) | "
        "ref / fw inference s |",
        "|---|---|---|---|---|---|",
    ]
    for r in report.get("pcaa_cpu", []):
        h = r["crop_agreement"]
        if "same_composition_window_agreement" in r:
            sc = (
                f"{r['same_composition_window_agreement']:.4f} "
                f"({r['n_same_composition_flips']})"
            )
        else:
            sc = "—"
        md.append(
            f"| {r['k']} | {h['agree']:.4f} | {sc} | {h['n_common']} | "
            f"{r['unknown_rate_ref']:.4f} / {r['unknown_rate_fw']:.4f} | "
            f"{r['ref_inference_s']:.0f} / {r['fw_inference_s']:.0f} |"
        )
    md += [
        "",
        "Crop agreement at k > 1 also reflects the documented",
        "sequential-ordering deviation (different crops share a voting",
        "window); the same-composition column re-votes the framework's",
        "per-crop scores on the REFERENCE's exact window composition",
        "(reference loop `inference_PCAA.py:241-314`) — pure numerics.",
        "Any same-composition flips carry their member-crop",
        "|score − threshold| margins in DECISION_PARITY_FULL.json",
        "(`same_composition_flip_margins`).",
    ]
    if "pcaa_tpu" in report:
        t = report["pcaa_tpu"]
        md += [
            "",
            f"#### TPU eval-path attribution at k={t['k']}\n",
            "The same on-disk crops re-scored on the TPU through "
            "{fused Pallas, plain XLA} × {HIGHEST = full-f32 MXU passes, "
            "DEFAULT = single-bf16-pass matmuls}, each vs the reference "
            "and vs the framework's own CPU f32 pass "
            "(`--phase tpu-pcaa`):\n",
            "| config | vs ref | vs fw CPU | flips | max\\|Δll\\| vs CPU | "
            "Δthreshold | ΔF1_micro | s |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in t["configs"]:
            a, b = r["crop_agreement_vs_ref"], r["crop_agreement_vs_fw_cpu"]
            md.append(
                f"| {r['config']} | {a['agree']:.4f} | {b['agree']:.4f} | "
                f"{r['n_flipped_vs_cpu']} | "
                f"{r['max_abs_ll_delta_vs_cpu']:.2e} | "
                f"{r['threshold_delta_vs_cpu']:+.2e} | "
                f"{r['f1_micro_delta_vs_cpu']:+.4f} | "
                f"{r['inference_s']:.0f} |"
            )
        flips = [
            m for r in t["configs"] for m in r["flip_margins"]
        ]
        if flips:
            worst = max(abs(m["margin_cpu"]) for m in flips)
            med = t["configs"][0]["median_abs_margin_all"]
            verdict = (
                " — knife-edge crops, not systematic divergence."
                if worst < 0.1 * med
                else "."
            )
            md += [
                "",
                f"Flipped crops' CPU-side |score − threshold| margins are all "
                f"≤ {worst:.3g}; the median |margin| over ALL crops is "
                f"{med:.3g}{verdict}",
            ]
        else:
            md += [
                "",
                "No config flips any decision vs the CPU pass.",
            ]
    if "orced_cpu" in report:
        o = report["orced_cpu"]
        md += [
            "",
            "### ORCED (eval-time reparam noise PINNED)\n",
            f"- framework (CPU) vs reference, identical eps replayed per crop:"
            f" **{o['pinned_eps_agreement']:.4f}** (n={o['n_decisions']})",
            f"- unknown rates ref/fw: {o['unknown_rate_ref']:.4f} /"
            f" {o['unknown_rate_fw']:.4f}",
            f"- same-crop wall-clock: reference {o['ref_inference_s']:.0f}s"
            f" (scipy 32-D mvn cdf per sample×class) vs framework"
            f" {o['fw_inference_s']:.0f}s (factorized product-of-Φ)",
        ]
    if "orced_tpu" in report:
        t = report["orced_tpu"]
        warm = (
            f", warm re-run {t['inference_warm_s']:.0f}s — the cold/warm gap"
            " is XLA compile over the tunnel (one executable for all three"
            " splits via `pad_to_steps`)"
            if "inference_warm_s" in t
            else ""
        )
        md += [
            f"- framework (TPU fused trunk) vs reference, same pinned eps: "
            f"**{t['pinned_eps_agreement_vs_ref']:.4f}** "
            f"(n={t['n_decisions']}, cold {t['inference_s']:.0f}s{warm})",
        ]
    if "train_wall_s" in report:
        w = report["train_wall_s"]
        if w:
            md += [
                "",
                f"Training wall-clock on one v5e chip: PCAA V4 "
                f"{w.get('pcaa_train_s', float('nan')):.0f}s, ORCED "
                f"{w.get('orced_train_s', float('nan')):.0f}s "
                f"({report['epochs']} epochs, full dims).",
            ]
    md += ["", SECTION_END]
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
    print(f"[full] wrote {out} and updated DECISION_PARITY.md")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/dp_full")
    p.add_argument(
        "--phase",
        default="all",
        choices=["all", "train", "compare", "tpu-pcaa", "tpu-orced"],
    )
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ks", type=int, nargs="+", default=[6, 2, 1])
    p.add_argument("--no-orced", action="store_true")
    p.add_argument("--no-tpu", action="store_true")
    p.add_argument(
        "--merge-report",
        action="store_true",
        help="update DECISION_PARITY_FULL.json in place: keep sections and "
        "pcaa rows (for other ks) from the existing report instead of "
        "overwriting — for partial re-runs",
    )
    p.add_argument(
        "--skip-train",
        action="store_true",
        help="reuse existing trained runs in the workdir (re-exports only)",
    )
    args = p.parse_args()

    if args.phase == "train":
        phase_train(args)
    elif args.phase == "compare":
        phase_compare(args)
    elif args.phase == "tpu-pcaa":
        phase_tpu_pcaa(args)
    elif args.phase == "tpu-orced":
        phase_tpu_orced(args)
    else:  # all: train (TPU) then compare (CPU) as subprocesses
        base = [sys.executable, os.path.abspath(__file__), "--workdir",
                os.path.abspath(args.workdir), "--epochs", str(args.epochs),
                "--seed", str(args.seed)]
        tr = base + ["--phase", "train"]
        if args.skip_train:
            tr.append("--skip-train")
        r = subprocess.run(tr, cwd=REPO)
        if r.returncode != 0:
            sys.exit(r.returncode)
        cmp_cmd = base + ["--phase", "compare", "--ks"] + [
            str(k) for k in args.ks
        ]
        if args.no_orced:
            cmp_cmd.append("--no-orced")
        if args.no_tpu:
            cmp_cmd.append("--no-tpu")
        if args.merge_report:
            cmp_cmd.append("--merge-report")
        r = subprocess.run(cmp_cmd, cwd=REPO)
        sys.exit(r.returncode)


if __name__ == "__main__":
    main()
