#!/usr/bin/env python
"""Quantify the Youden-J knife edge behind PARITY_CRN's regime-flip cells.

PARITY_CRN.md attributes its large-|Δ| cells to threshold-REGIME flips:
the reference picks its rejection threshold as the Youden-J argmax
(``inference_PCAA.py:225-231``), and at the twin harness's reduced dims
the J curve allegedly has two near-tied optima — a reject-most threshold
(unknown rate ≈ 1) and an accept-most one (unknown rate ≈ 0) — so twins
whose scores differ only by float-reduction drift can land on opposite
sides, moving F1 by ~0.7 while measuring nothing about implementation
bias.  This tool turns "allegedly" into a number.

For every twin seed recorded by ``tools/parity_twin.py`` it loads the
THREE trained weight sets of that seed's realization — the torch
reference (transplanted into flax via ``tools/transplant.py``), the
framework twin, and the ε-perturbed chaos control — re-runs the shared
scoring path (``infer/pcaa.py``: encode → ``log_joint_likelihood`` →
``underflow_tied``), and for EVERY candidate threshold-validation
subject (the procedure draws 1 of the ~4 unseen subjects) computes:

- ``J*``            — max Youden J over all ROC thresholds;
- ``J_other``       — max J restricted to thresholds in the OTHER
                      rejection regime (crop-level unknown rate on the
                      eval population crossing 0.5);
- ``margin = J* − J_other`` — how much J the argmax actually has over
                      the competing regime.

A small margin (≲ a few J points, i.e. a handful of crops out of ~1 100
re-ranking across the threshold) on BOTH sides of a flip cell proves the
flip measures threshold-selection sensitivity, not a between-
implementation behavioral difference.

Writes ``KNIFE_EDGE.json`` + a markdown table to stdout; run after a
``parity_twin.py`` sweep with the same ``--workdir``.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402

from opensetgaitrecognition_pcaa_tpu.config import (  # noqa: E402
    SPLIT,
    VARIATION,
)
from opensetgaitrecognition_pcaa_tpu.data.dataset import (  # noqa: E402
    RadarCropDataset,
)
from opensetgaitrecognition_pcaa_tpu.infer.pcaa import (  # noqa: E402
    _encode_split,
    pcaa_inference_setup,
)
from opensetgaitrecognition_pcaa_tpu.ops import (  # noqa: E402
    log_joint_likelihood,
    underflow_tied,
)
from opensetgaitrecognition_pcaa_tpu.ops.openset import roc_points  # noqa: E402
from tools.transplant import torch_cg_encoder_to_flax  # noqa: E402

FW_NAME = "TWIN_FW_V4"
CTRL_NAME = "TWIN_FWP_V4"
REF_NAME = "TWIN_REF_V4"


def side_scores(encoder, enc_vars, means, ds_test, ds_unseen):
    """(test_ll, unseen_ll, test/unseen labels) through the shared path."""
    test_fvs, _ = _encode_split(encoder, enc_vars, ds_test)
    unseen_fvs, _ = _encode_split(encoder, enc_vars, ds_unseen)
    test_ll = underflow_tied(
        np.asarray(log_joint_likelihood(test_fvs, means))
    )
    unseen_ll = underflow_tied(
        np.asarray(log_joint_likelihood(unseen_fvs, means))
    )
    return test_ll, unseen_ll


def regime_margins(test_ll, unseen_ll, unseen_labels, val_subject):
    """J*, its regime, and the best-J of the OTHER regime, for one
    choice of threshold-validation subject (mirrors
    ``infer/pcaa.py::naive_sequential_procedure`` score construction)."""
    is_val = unseen_labels == val_subject
    scores = np.concatenate([unseen_ll[is_val], test_ll])
    det_labels = np.concatenate(
        [np.zeros(int(is_val.sum())), np.ones(len(test_ll))]
    )
    fpr, tpr, thr = roc_points(det_labels, scores)
    j = tpr - fpr

    # crop-level unknown rate on the decision population (test + kept
    # unseen): a crop is rejected when its score fails to EXCEED the
    # threshold (the vote tests ``ll > t``, infer/pcaa.py::_window_vote)
    eval_ll = np.concatenate([test_ll, unseen_ll[~is_val]])
    ur = np.array([float(np.mean(eval_ll <= t)) for t in thr])

    best = int(np.argmax(j))
    reject_regime = ur[best] >= 0.5
    other = ur < 0.5 if reject_regime else ur >= 0.5
    j_other = float(j[other].max()) if other.any() else float("nan")
    return {
        "j_star": float(j[best]),
        "j_other_regime": j_other,
        "margin": float(j[best]) - j_other,
        "chosen_regime": "reject" if reject_regime else "accept",
        "chosen_unknown_rate": float(ur[best]),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/twinC")
    p.add_argument("--out", default=os.path.join(REPO, "KNIFE_EDGE.json"))
    p.add_argument(
        "--merge-prior",
        default=None,
        help="path to an existing KNIFE_EDGE.json whose rows (for seeds "
        "whose workdirs are gone) are merged into the summary — extends "
        "a recorded analysis without the original trained twins",
    )
    args = p.parse_args()

    seeds = sorted(
        int(d[4:])
        for d in os.listdir(args.workdir)
        if d.startswith("seed")
        and os.path.exists(os.path.join(args.workdir, d, "result.json"))
    )
    rows = []
    if args.merge_prior:
        with open(args.merge_prior) as f:
            prior_rows = json.load(f)["rows"]
        rows += [r for r in prior_rows if r["seed"] not in seeds]
    for s in seeds:
        seed_dir = os.path.join(args.workdir, f"seed{s}")
        fw_models = os.path.join(seed_dir, "models_fw")
        cfg, encoder, fw_vars, fw_means = pcaa_inference_setup(
            FW_NAME,
            VARIATION.V4,
            models_path=fw_models,
            generate_dataset=False,
        )
        _, _, ctrl_vars, ctrl_means = pcaa_inference_setup(
            CTRL_NAME,
            VARIATION.V4,
            models_path=fw_models,
            generate_dataset=False,
        )
        ref_run = os.path.join(seed_dir, "ref", "models", REF_NAME)
        ref_sd = torch.load(
            os.path.join(ref_run, f"{REF_NAME}_E.pt"), map_location="cpu"
        )
        ref_p, ref_s = torch_cg_encoder_to_flax(ref_sd, use_projection_head=True)
        ref_vars = {"params": ref_p, "batch_stats": ref_s}
        ref_means = torch.load(
            os.path.join(ref_run, "discriminator_means.pt"),
            map_location="cpu",
        ).numpy()

        ds_test = RadarCropDataset(
            SPLIT.TEST, cfg.GEN_DATA_PATH, sequential=True
        )
        ds_unseen = RadarCropDataset(
            SPLIT.UNSEEN, cfg.GEN_DATA_PATH, sequential=True
        )
        unseen_labels = ds_unseen.labels
        subjects = [int(u) for u in np.unique(unseen_labels)]
        # The subject the real procedure drew (both sides run inference
        # with seed=0: ``naive_sequential_procedure`` default and
        # ``inference_PCAA.py:123``) — replicate the draw exactly.
        drawn = int(
            np.random.default_rng(0).choice(
                np.unique(unseen_labels),
                size=int(np.ceil(0.2 * len(subjects))),
                replace=False,
            )[0]
        )

        for side, (vars_, means) in {
            "ref": (ref_vars, ref_means),
            "fw": (fw_vars, fw_means),
            "ctrl": (ctrl_vars, ctrl_means),
        }.items():
            test_ll, unseen_ll = side_scores(
                encoder, vars_, means, ds_test, ds_unseen
            )
            for subj in subjects:
                m = regime_margins(test_ll, unseen_ll, unseen_labels, subj)
                rows.append(
                    dict(
                        seed=s,
                        side=side,
                        val_subject=subj,
                        drawn=subj == drawn,
                        **m,
                    )
                )
                print(
                    f"[seed {s}] {side:4s} val_subj={subj}: J*={m['j_star']:.4f} "
                    f"({m['chosen_regime']}, ur={m['chosen_unknown_rate']:.2f}) "
                    f"margin over other regime = {m['margin']:.4f}"
                )

    # Decisive cross-reference: at the subject the real procedure drew,
    # does a small two-regime J margin predict the recorded CRN flips?
    crn_path = os.path.join(REPO, "PARITY_CRN.json")
    crn_flips = {}
    if os.path.exists(crn_path):
        with open(crn_path) as f:
            for r in json.load(f)["rows"]:
                if r["metric"] == "f1_micro":
                    crn_flips[r["seed"]] = (
                        crn_flips.get(r["seed"], False) or r["regime_flip"]
                    )
    seeds_all = sorted({r["seed"] for r in rows})
    drawn_table = []
    for s in seeds_all:
        cell = [
            r
            for r in rows
            if r["seed"] == s and r["drawn"] and r["side"] in ("ref", "fw")
        ]
        if not cell:
            continue
        min_margin = min(r["margin"] for r in cell)
        drawn_table.append(
            {
                "seed": s,
                "min_margin_ref_fw": min_margin,
                "crn_flip": crn_flips.get(s),
            }
        )
        print(
            f"drawn-subject seed {s}: min(ref,fw) J margin {min_margin:.4f}"
            f"  CRN flip cell: {crn_flips.get(s)}"
        )

    margins = np.array([r["margin"] for r in rows if np.isfinite(r["margin"])])
    flip_pairs = 0
    pair_count = 0
    for s in seeds_all:
        for subj in {r["val_subject"] for r in rows if r["seed"] == s}:
            pick = {
                r["side"]: r["chosen_regime"]
                for r in rows
                if r["seed"] == s and r["val_subject"] == subj
            }
            if "ref" in pick and "fw" in pick:
                pair_count += 1
                flip_pairs += pick["ref"] != pick["fw"]
    summary = {
        "workdir": args.workdir,
        "merged_prior": args.merge_prior,
        "n_rows": len(rows),
        "margin_mean": float(margins.mean()),
        "margin_median": float(np.median(margins)),
        "margin_max": float(margins.max()),
        "fw_vs_ref_regime_disagreements": int(flip_pairs),
        "fw_vs_ref_pairs": int(pair_count),
        "drawn_subject_table": drawn_table,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(
        f"\nwrote {args.out}: {len(rows)} (seed, side, val_subject) cells; "
        f"J margin over the competing regime: mean {margins.mean():.4f}, "
        f"median {np.median(margins):.4f}, max {margins.max():.4f}; "
        f"fw-vs-ref regime disagreements {flip_pairs}/{pair_count}"
    )


if __name__ == "__main__":
    main()
