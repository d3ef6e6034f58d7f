"""PCAA open-set inference: k-window voting with Gaussian-mixture rejection.

Behavioral oracle: reference ``inference_PCAA.py`` (setup ``:34-114``,
procedure ``:117-347``, driver ``:382-469``):

1. encode every sequential TEST and UNSEEN crop → 32-d latents;
2. score each latent by the mean of unit-covariance Gaussian pdfs centred at
   the run's ``discriminator_means`` (here: in log space — order-identical,
   see ``ops/openset.py``);
3. pick the rejection threshold by Youden's J on the ROC of
   {seen-test = positive} vs {a 20% subject subset of UNSEEN = negative};
4. slide non-overlapping k-crop windows over each sequential split (batches
   mixing labels are skipped, reference ``inference_PCAA.py:241-246``); if
   more than k/2 crops in the window score above the threshold the window is
   classified as the majority argmax class, otherwise as "unknown"
   (= ``n_labels``);
5. write metrics JSON / preds+labels npy / confusion-matrix PNG with the
   reference's exact filename patterns.

TPU restructuring: the reference re-runs the encoder per k-window after the
likelihood pass (same crops, deterministic eval) — here per-crop latents,
predictions and log-likelihoods are computed **once** in a batched jitted
pass and the voting is pure numpy over the cached arrays. Decisions are
identical; the encoder work drops by 2×.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import numpy as np

from opensetgaitrecognition_pcaa_tpu.config import (
    ALL_SCENARIOS,
    SCENARIO,
    SPLIT,
    VARIATION,
    Config,
    variation_from_model_name,
)
from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
from opensetgaitrecognition_pcaa_tpu.data.splits import generate_splits
from opensetgaitrecognition_pcaa_tpu.infer.artifacts import (
    openset_metrics,
    plot_openset_confusion_matrix,
    save_json,
)
from opensetgaitrecognition_pcaa_tpu.infer.common import batched_apply
from opensetgaitrecognition_pcaa_tpu.models import CGEncoder
from opensetgaitrecognition_pcaa_tpu.ops import (
    best_youden_threshold,
    log_joint_likelihood,
    underflow_tied,
)
from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
    load_params,
    module_path,
)


def pcaa_inference_setup(
    model_name: str,
    variation: VARIATION,
    *,
    models_path: str = "models",
    data_path: Optional[str] = None,
    generate_dataset: bool = True,
    force_pc_subsampling: int = 0,
):
    """Load config + encoder weights + centroids for one run
    (reference ``CGAAE_inference_setup``, ``inference_PCAA.py:34-114``)."""
    run_dir = os.path.join(models_path, model_name)
    cfg = Config.load(os.path.join(run_dir, "config.json"))

    if generate_dataset:
        generate_splits(
            data_path=data_path or cfg.DATA_PATH,
            gen_data_path=cfg.GEN_DATA_PATH,
            train_classes=cfg.TRAIN_CLASSES,
            seed=0,
            force_pc_subsampling=force_pc_subsampling,
            nmax_points=cfg.NMAX,
            nsteps=cfg.NSTEPS,
            crop_step=cfg.CROP_STEP,
            verbose=False,
        )

    # Projection head exists for V1/V2/V4 in the reference loader
    # (inference_PCAA.py:77-90). NOTE: the reference *trains* V2 without a
    # head (train_AAE.py:38) then builds one at inference — loading those
    # weights would crash upstream. We make V2 consistent: head iff the
    # trained encoder had one.
    use_head = variation in (VARIATION.V1, VARIATION.V4)
    encoder = CGEncoder(
        n_out_labels=cfg.n_classes,
        sup_latent_dim=cfg.SUP_LATENT_DIM,
        pointnet_out_dim=cfg.POINTNET_OUT_DIM,
        dtc_filters=tuple(cfg.DTC_FILTERS),
        use_projection_head=use_head,
    )
    # Pin on device once so repeated jitted passes don't re-upload weights.
    enc_vars = jax.device_put(load_params(module_path(run_dir, model_name, "E")))
    means = np.load(os.path.join(run_dir, "discriminator_means.npy"))
    return cfg, encoder, enc_vars, means


def _encode_split(
    encoder, enc_vars, dataset: RadarCropDataset, batch_size=256,
    precision: Optional[str] = "highest", use_pallas: bool = True,
):
    """→ (latents (n, d), argmax predictions (n,)) for a whole split.

    On TPU the forward routes through the fused Pallas eval encoder
    (``infer/fast_encoder.py``); the flax apply is the CPU fallback — both
    are float-tolerance identical (tested).

    ``precision`` and ``use_pallas`` apply on TPU only. The default is
    ``"highest"`` (full-f32 MXU passes): DEFAULT precision's single-bf16-pass
    matmuls perturb latents enough to flip knife-edge open-set decisions vs
    the CPU/torch f32 reference at full dims (12/927 in round 4; the
    attribution matrix in DECISION_PARITY.md isolates precision — not the
    Pallas kernel — as the cause). Under ``"highest"`` the PointNet stage
    runs the folded-XLA chain (the fused kernel's multi-pass f32 schedule
    OOMs scoped VMEM — ``ops/pallas/pointnet_infer.py`` guard); the eval
    pass stays tunnel-dispatch-bound, so the cost is small. Latency-critical
    serving paths keep DEFAULT (``infer/serving.py`` module docstring).
    """
    x, _ = dataset.load_all()
    on_tpu = jax.devices()[0].platform != "cpu"
    fwd = _encode_fn(encoder, on_tpu, precision, use_pallas)
    fvs, preds = batched_apply(fwd, x, batch_size, params=enc_vars)
    return fvs, preds.astype(np.int64)


@functools.lru_cache(maxsize=32)
def _encode_fn(
    encoder, on_tpu: bool, precision: Optional[str] = None,
    use_pallas: bool = True,
):
    """Stable per-(encoder, platform, precision, kernel-path) forward
    closure, so repeated ``batched_apply`` calls (seed loops in the parity
    tools) hit the cached XLA compile (``infer/common.py::_runner``) instead
    of re-tracing. Flax modules hash by their field values, so equal-config
    encoders from separate ``pcaa_inference_setup`` calls share one entry."""
    from opensetgaitrecognition_pcaa_tpu.infer.fast_encoder import (
        fused_encoder_apply,
    )

    def fwd(chunk, variables):
        if on_tpu:
            logits, fv = fused_encoder_apply(
                variables,
                chunk,
                use_projection_head=encoder.use_projection_head,
                use_pallas=use_pallas,
                precision=precision,
            )
        else:
            logits, fv = encoder.apply(variables, chunk, train=False)
        return fv, logits.argmax(axis=1)

    return fwd


def _window_vote(
    log_liks: np.ndarray,
    preds: np.ndarray,
    labels: np.ndarray,
    k: int,
    log_threshold: float,
    n_labels: int,
    keep_mask: Optional[np.ndarray] = None,
    true_label_override: Optional[int] = None,
) -> Tuple[List[int], List[int]]:
    """Non-overlapping k-windows in sequential order; majority vote or reject.

    Mirrors the decision loop at ``inference_PCAA.py:241-314``: windows with
    mixed ground-truth labels are skipped; a window whose first element is
    excluded by ``keep_mask`` is skipped (the reference's
    validation-unseen-subject filter checks ``test_gt_labels[0]``,
    ``inference_PCAA.py:289``); ``drop_last`` semantics (tail < k dropped).
    """
    out_preds: List[int] = []
    out_labels: List[int] = []
    n = len(log_liks)
    for start in range(0, n - k + 1, k):
        sl = slice(start, start + k)
        lab = labels[sl]
        if len(np.unique(lab)) != 1:
            continue
        if keep_mask is not None and not keep_mask[start]:
            continue
        n_above = int(np.sum(log_liks[sl] > log_threshold))
        if n_above > k / 2:
            vote = int(np.argmax(np.bincount(preds[sl])))
        else:
            vote = n_labels
        out_preds.append(vote)
        out_labels.append(
            int(lab[0]) if true_label_override is None else true_label_override
        )
    return out_preds, out_labels


class OpenSetCalibration(NamedTuple):
    """Per-crop scores + the Youden-J rejection threshold for one run.

    Everything the k-window decision stage (eval voting OR the exported
    serving function, ``infer/serving.py``) needs, computed in one batched
    pass per split.
    """

    log_threshold: float
    test_ll: np.ndarray
    test_preds: np.ndarray
    test_labels: np.ndarray
    unseen_ll: np.ndarray
    unseen_preds: np.ndarray
    unseen_labels: np.ndarray
    is_val: np.ndarray  # unseen crops held out as threshold-validation
    n_labels: int


def calibrate_open_set(
    encoder,
    enc_vars,
    discriminator_means: np.ndarray,
    cfg: Config,
    *,
    scenarios_list: Sequence[SCENARIO] = ALL_SCENARIOS,
    seed: int = 0,
    unseen_valid_ratio: float = 0.2,
    precision: Optional[str] = "highest",
    use_pallas: bool = True,
) -> OpenSetCalibration:
    """Score the sequential TEST/UNSEEN splits and pick the rejection
    threshold (reference ``inference_PCAA.py:195-231`` — steps 1–3 of the
    module docstring). ``precision``/``use_pallas`` select the TPU encoder
    path (``_encode_split``); CPU ignores both."""
    rng = np.random.default_rng(seed)

    ds_test = RadarCropDataset(
        SPLIT.TEST, cfg.GEN_DATA_PATH, scenarios=scenarios_list, sequential=True
    )
    ds_unseen = RadarCropDataset(
        SPLIT.UNSEEN, cfg.GEN_DATA_PATH, scenarios=scenarios_list, sequential=True
    )

    # --- single batched encoder pass per split -------------------------
    test_fvs, test_preds = _encode_split(
        encoder, enc_vars, ds_test, precision=precision, use_pallas=use_pallas
    )
    unseen_fvs, unseen_preds = _encode_split(
        encoder, enc_vars, ds_unseen, precision=precision,
        use_pallas=use_pallas,
    )

    # underflow_tied: scores whose linear-space pdf underflows to 0.0 are
    # tied in the reference's roc_curve — replicate those ties so log-space
    # decisions match the reference's even in the underflow regime.
    test_ll = underflow_tied(
        np.asarray(log_joint_likelihood(test_fvs, discriminator_means))
    )
    unseen_ll = underflow_tied(
        np.asarray(log_joint_likelihood(unseen_fvs, discriminator_means))
    )

    # --- 20% of unseen subjects → threshold-validation set -------------
    unseen_labels = ds_unseen.labels
    unseen_subjects = np.unique(unseen_labels)
    val_subjects = rng.choice(
        unseen_subjects,
        size=int(np.ceil(unseen_valid_ratio * len(unseen_subjects))),
        replace=False,
    )
    is_val = np.isin(unseen_labels, val_subjects)

    # --- Youden-J threshold: seen-test (pos) vs unseen-valid (neg) ------
    scores = np.concatenate([unseen_ll[is_val], test_ll])
    det_labels = np.concatenate(
        [np.zeros(int(is_val.sum())), np.ones(len(test_ll))]
    )
    log_threshold = best_youden_threshold(det_labels, scores)

    return OpenSetCalibration(
        log_threshold=log_threshold,
        test_ll=test_ll,
        test_preds=test_preds,
        test_labels=ds_test.labels,
        unseen_ll=unseen_ll,
        unseen_preds=unseen_preds,
        unseen_labels=unseen_labels,
        is_val=is_val,
        n_labels=ds_test.n_classes,
    )


def naive_sequential_procedure(
    k: int,
    encoder,
    enc_vars,
    discriminator_means: np.ndarray,
    cfg: Config,
    figures_folder: str,
    model_folder: str,
    scenarios_list: Sequence[SCENARIO] = ALL_SCENARIOS,
    seed: int = 0,
    unseen_valid_ratio: float = 0.2,
    force_pc_subsampling: int = 0,
    cal=None,
) -> Tuple[Dict, np.ndarray, np.ndarray]:
    # ``cal`` is k-independent (fixed seed; k only enters the pure-numpy
    # window vote below) — pcaa_inference computes it ONCE and passes it in
    # so a ks sweep doesn't re-encode the TEST/UNSEEN splits per k.
    if cal is None:
        cal = calibrate_open_set(
            encoder,
            enc_vars,
            discriminator_means,
            cfg,
            scenarios_list=scenarios_list,
            seed=seed,
            unseen_valid_ratio=unseen_valid_ratio,
        )
    log_threshold, n_labels = cal.log_threshold, cal.n_labels

    # --- k-window voting ------------------------------------------------
    p1, l1 = _window_vote(
        cal.test_ll, cal.test_preds, cal.test_labels, k, log_threshold, n_labels
    )
    p2, l2 = _window_vote(
        cal.unseen_ll,
        cal.unseen_preds,
        cal.unseen_labels,
        k,
        log_threshold,
        n_labels,
        keep_mask=~cal.is_val,
        true_label_override=n_labels,
    )
    final_preds = np.array(p1 + p2)
    final_labels = np.array(l1 + l2)

    # --- artifacts --------------------------------------------------------
    plot_openset_confusion_matrix(
        final_labels,
        final_preds,
        n_labels,
        os.path.join(
            figures_folder, f"openset_confusion_matrix_naive_seq_{k}.png"
        ),
    )
    out_log = {"n_steps": k, **openset_metrics(final_labels, final_preds)}

    # reference filename switch (inference_PCAA.py:333-345)
    if force_pc_subsampling and tuple(scenarios_list) == ALL_SCENARIOS:
        json_name = f"naive_seq_log_{k}_subsampled{force_pc_subsampling}.json"
    elif not force_pc_subsampling and tuple(scenarios_list) != ALL_SCENARIOS:
        sc = "_".join(s.value for s in scenarios_list)
        json_name = f"naive_seq_log_{k}_scenarios{sc}.json"
    else:
        json_name = f"naive_seq_log_{k}.json"
    save_json(out_log, os.path.join(model_folder, json_name))

    return out_log, final_preds, final_labels


def pcaa_inference(
    model_names: Sequence[str],
    ks: Sequence[int],
    *,
    models_path: str = "models",
    figures_path: str = "figures",
    data_path: Optional[str] = None,
    force_pc_subsampling: int = 0,
    scenarios_list: Sequence[SCENARIO] = ALL_SCENARIOS,
    variation: Optional[VARIATION] = None,
    generate_dataset: bool = True,
    dump_calibration: bool = False,
) -> Dict:
    """Driver over runs × voting-window sizes
    (reference ``CGAAE_inference``, ``inference_PCAA.py:382-469``).

    ``dump_calibration``: also write the per-crop calibration arrays
    (scores, threshold, predictions, val mask) to
    ``<model_folder>/calibration.npz`` — the parity harnesses use it to
    attribute window-level decision flips to their member crops'
    |score − threshold| margins without re-encoding the splits."""
    if force_pc_subsampling and tuple(scenarios_list) != ALL_SCENARIOS:
        raise ValueError(
            "force_pc_subsampling and scenarios_list cannot both be non-default"
        )

    all_logs: Dict = {}
    for model_name in model_names:
        model_folder = os.path.join(models_path, model_name)
        figures_folder = os.path.join(figures_path, model_name)
        os.makedirs(figures_folder, exist_ok=True)
        var = variation or variation_from_model_name(model_name)

        cfg, encoder, enc_vars, means = pcaa_inference_setup(
            model_name,
            var,
            models_path=models_path,
            data_path=data_path,
            generate_dataset=generate_dataset,
            force_pc_subsampling=force_pc_subsampling,
        )

        out_log: Dict = {}
        # k-independent calibration (encoder passes + threshold), once per run
        cal = calibrate_open_set(
            encoder,
            enc_vars,
            means,
            cfg,
            scenarios_list=scenarios_list,
            seed=0,
            unseen_valid_ratio=0.2,
        )
        if dump_calibration:
            np.savez(
                os.path.join(model_folder, "calibration.npz"),
                **cal._asdict(),
            )
        for k in ks:
            metrics, final_preds, final_labels = naive_sequential_procedure(
                k,
                encoder,
                enc_vars,
                means,
                cfg,
                figures_folder,
                model_folder,
                scenarios_list=scenarios_list,
                seed=0,
                unseen_valid_ratio=0.2,
                force_pc_subsampling=force_pc_subsampling,
                cal=cal,
            )

            # preds/labels npy contract (inference_PCAA.py:440-455)
            if force_pc_subsampling and tuple(scenarios_list) == ALL_SCENARIOS:
                suffix = f"{k}_subsampled{force_pc_subsampling}"
            elif not force_pc_subsampling and tuple(scenarios_list) != ALL_SCENARIOS:
                sc = "_".join(s.value for s in scenarios_list)
                suffix = f"{k}_scenarios{sc}"
            else:
                suffix = f"{k}"
            np.save(
                os.path.join(model_folder, f"final_preds_{suffix}.npy"), final_preds
            )
            np.save(
                os.path.join(model_folder, f"final_labels_{suffix}.npy"),
                final_labels,
            )

            out_log[k] = {
                "f1_micro": metrics["f1_micro"],
                "f1_macro": metrics["f1_macro"],
                "f1_weighted": metrics["f1_weighted"],
            }

        save_json(
            out_log,
            os.path.join(
                model_folder,
                f"naive_seq_log_subsampled{force_pc_subsampling}.json",
            ),
        )
        all_logs[model_name] = out_log
    return all_logs
