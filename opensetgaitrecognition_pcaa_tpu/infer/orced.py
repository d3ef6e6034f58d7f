"""OR-CED open-set inference: ensemble OOD detection.

Behavioral oracle: reference ``inference_ORCED.py``:

1. a training-set statistics pass collects per-sample latents, per-sample
   Chamfer reconstruction errors (``avg_out=False``) and predictions
   (``:282-307``);
2. per class k: mean/std of rec-error over all class-k samples; mean/std of
   latents over *correctly predicted* class-k samples (``:89-98``);
3. a test sample is "unseen" if EITHER
   - latent criterion: the cdf-difference score ``compute_prob`` exceeds
     0.95 for **all** classes (``:103-122``), OR
   - reconstruction criterion: its rec-error exceeds μ_k + 2σ_k of its
     predicted class (``:98,124-126``);
   (the per-class rec-error pdf ``p_re_k`` is computed by the reference but
   never used in the decision — dropped here);
4. the unseen split leaves out one subject (the first encountered) to mirror
   PCAA's threshold-validation subject (``:360-369,389``); batches are
   filtered by their *first* label only, as in the reference.

Parity quirk kept: the latent "covariance" passed to the cdf is
``diag(std)`` — standard deviations on the diagonal, not variances
(``inference_ORCED.py:107``; see ``ops/openset.py``).
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from opensetgaitrecognition_pcaa_tpu.config import SPLIT, Config
from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
from opensetgaitrecognition_pcaa_tpu.data.splits import generate_splits
from opensetgaitrecognition_pcaa_tpu.infer.artifacts import (
    openset_metrics,
    plot_openset_confusion_matrix,
    save_json,
)
from opensetgaitrecognition_pcaa_tpu.infer.common import batched_apply
from opensetgaitrecognition_pcaa_tpu.models import (
    GaussianMeanLearner,
    ORCEDDecoder,
    ORCEDEncoder,
)
from opensetgaitrecognition_pcaa_tpu.ops import hyperrectangle_prob, seq_chamfer
from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
    load_params,
    module_path,
)


class ORCEDClassStats(NamedTuple):
    """Per-class statistics behind the OR-ensemble decision: these (plus the
    fixed 0.95 latent threshold) are everything the decision stage needs, so
    they are what the serving export bakes (``infer/serving.py``)."""

    means_z: np.ndarray  # (K, d) latent means over correctly-predicted
    stds_z: np.ndarray  # (K, d) latent stds over correctly-predicted
    thresholds_re: np.ndarray  # (K,) rec-error μ_k + 2σ_k
    n_classes: int


def orced_class_stats(
    rec_err_tr: np.ndarray,
    f_vecs_tr: np.ndarray,
    gt_labels: np.ndarray,
    pred_labels: np.ndarray,
) -> ORCEDClassStats:
    """Training-split statistics pass (reference ``inference_ORCED.py:89-98``)."""
    n_classes = len(np.unique(gt_labels))
    correct = gt_labels == pred_labels

    means_z, stds_z, thresholds_re = [], [], []
    for k in range(n_classes):
        mean_re = np.mean(rec_err_tr[gt_labels == k])
        std_re = np.std(rec_err_tr[gt_labels == k])
        sel = f_vecs_tr[correct][gt_labels[correct] == k]
        means_z.append(np.mean(sel, axis=0))
        stds_z.append(np.std(sel, axis=0))
        thresholds_re.append(mean_re + 2 * std_re)

    return ORCEDClassStats(
        means_z=np.stack(means_z),
        stds_z=np.stack(stds_z),
        thresholds_re=np.array(thresholds_re),
        n_classes=n_classes,
    )


def orced_criteria(
    stats: ORCEDClassStats,
    thresholds_g: float,
    x_test_prediction: np.ndarray,
    z_test: np.ndarray,
    re_test: np.ndarray,
):
    """→ ``(latent_bools, rec_err_bools)`` — the two OR-ensemble rejection
    criteria, host f64 numpy (reference ``inference_ORCED.py:103-132``).
    The single implementation behind ``orced_apply_ood`` AND the serving
    artifacts' host epilogue (``infer/serving.py`` — the criterion stays on
    the host because TPU f64 is float-float emulation whose erf both
    compiles pathologically and carries ~49-bit precision)."""
    n_classes = stats.n_classes

    # latent criterion: score > 0.95 for ALL classes → unseen
    p_z_ks = np.stack(
        [
            # quirk: diag(std), not diag(std²) — see module docstring
            hyperrectangle_prob(stats.means_z[k], stats.stds_z[k], z_test)
            for k in range(n_classes)
        ]
    )  # (K, n_test)
    latent_bools = np.sum(1 - p_z_ks < 1 - thresholds_g, axis=0) == n_classes

    # reconstruction criterion: error above predicted-class μ+2σ → unseen
    thr_re = stats.thresholds_re[np.asarray(x_test_prediction)]
    rec_err_bools = np.asarray(re_test) > thr_re
    return latent_bools, rec_err_bools


def orced_apply_ood(
    stats: ORCEDClassStats,
    thresholds_g: float,
    x_test_prediction: np.ndarray,
    z_test: np.ndarray,
    re_test: np.ndarray,
) -> np.ndarray:
    """OR-ensemble decision given the baked stats
    (reference ``inference_ORCED.py:103-132``)."""
    latent_bools, rec_err_bools = orced_criteria(
        stats, thresholds_g, x_test_prediction, z_test, re_test
    )
    out = np.array(x_test_prediction, dtype=np.int64)
    out[np.logical_or(latent_bools, rec_err_bools)] = stats.n_classes
    return out


def orced_ensemble_ood_detection(
    rec_err_tr: np.ndarray,
    f_vecs_tr: np.ndarray,
    thresholds_g: float,
    gt_labels: np.ndarray,
    pred_labels: np.ndarray,
    x_test_prediction: np.ndarray,
    z_test: np.ndarray,
    re_test: np.ndarray,
) -> np.ndarray:
    """Reference ``ORCED_ensemble_ood_detection`` (``inference_ORCED.py:48-132``)."""
    stats = orced_class_stats(rec_err_tr, f_vecs_tr, gt_labels, pred_labels)
    return orced_apply_ood(stats, thresholds_g, x_test_prediction, z_test, re_test)


def _orced_pass(
    encoder, decoder, enc_vars, dec_vars, x, key, batch_size=128, eps=None,
    precision: Optional[str] = "highest", pad_to_steps: int = 0,
):
    """Batched eval pass → (preds, latents, per-sample rec errors).

    On TPU the encoder trunk routes through the fused Pallas eval path
    (``infer/fast_encoder.py``); note the reparametrization noise stream
    then differs from the flax-derived one — irrelevant for parity, the
    reference's own noise is unseeded torch ``randn`` (SURVEY.md §7.3).

    ``eps``: optional per-sample reparam draws ``(len(x), latent)`` replayed
    instead of PRNG sampling (rows aligned with ``x``) — the CRN parity
    path (``tools/parity_twin_orced.py``); forces the flax (non-fused)
    encoder.
    """
    on_tpu = jax.devices()[0].platform != "cpu"

    eps_chunks = None
    if eps is not None:
        from opensetgaitrecognition_pcaa_tpu.infer.common import chunk_rows

        assert eps.shape[0] == x.shape[0], (eps.shape, x.shape)
        # chunked by batched_apply's OWN policy → rows stay aligned with x
        eps_chunks = chunk_rows(
            np.asarray(eps, np.float32), batch_size, pad_to_steps
        )

    # key and eps ride through params (traced jit arguments) so fwd itself
    # is a stable per-(modules, platform, replay-mode) object — repeated
    # same-shape passes (the twin tools' seed loops call this three times
    # per seed) reuse the cached XLA compile (infer/common.py::_runner)
    fwd = _orced_fwd(encoder, decoder, on_tpu, eps_chunks is not None,
                     precision)
    # default_matmul_precision reaches the ops that take no explicit
    # precision arg (flax encoder/decoder applies, XLA chamfer); it must be
    # active at TRACE time, which is safe here because fwd is cached PER
    # precision value — each setting gets its own runner/compile.
    ctx = (
        jax.default_matmul_precision(precision)
        if precision is not None
        else contextlib.nullcontext()
    )
    with ctx:
        preds, zs, res = batched_apply(
            fwd, x, batch_size, params=(enc_vars, dec_vars, eps_chunks, key),
            with_index=True, pad_to_steps=pad_to_steps,
        )
    return preds.astype(np.int64), zs, res


@functools.lru_cache(maxsize=32)
def _orced_fwd(encoder, decoder, on_tpu: bool, has_eps: bool,
               precision: Optional[str] = None):
    """Stable forward closure for ``_orced_pass`` (see its docstring).

    ``precision`` is pinned per closure (it keys this cache) and applied via
    ``jax.default_matmul_precision`` in ``_orced_pass``, so it reaches the
    flax encoder (eps-replay path), the decoder and the Chamfer matmuls; the
    fused TPU trunk takes it explicitly."""
    from opensetgaitrecognition_pcaa_tpu.infer.fast_encoder import (
        fused_orced_encoder_apply,
    )

    def fwd(chunk, params, step_idx):
        # fold the chunk index in → fresh reparam noise per chunk (the
        # reference draws fresh torch noise per batch; a fixed key would
        # repeat the same eps rows every batch_size samples).
        e_vars, d_vars, ec, key = params
        k = jax.random.fold_in(key, step_idx)
        if has_eps:
            logits, z, mu, logvar = encoder.apply(
                e_vars, chunk, train=False, eps=ec[step_idx],
                rngs={"reparam": k},
            )
        elif on_tpu:
            logits, z, mu, logvar = fused_orced_encoder_apply(
                e_vars, chunk, k, use_pallas=True, precision=precision
            )
        else:
            logits, z, mu, logvar = encoder.apply(
                e_vars, chunk, train=False, rngs={"reparam": k}
            )
        rec = decoder.apply(d_vars, z)
        if on_tpu:
            # forward-only per-sample Chamfer → the fused kernel (no HBM
            # distance tensor; equal-or-faster than XLA forward, measured)
            from opensetgaitrecognition_pcaa_tpu.ops.pallas import (
                seq_chamfer_pallas,
            )

            re = seq_chamfer_pallas(rec, chunk, avg_out=False)
        else:
            re = seq_chamfer(rec, chunk, avg_out=False)
        return logits.argmax(axis=1), z, re

    return fwd


def orced_inference_setup(
    model_name: str,
    *,
    models_path: str = "models",
    data_path: Optional[str] = None,
    generate_dataset: bool = True,
):
    run_dir = os.path.join(models_path, model_name)
    cfg = Config.load(os.path.join(run_dir, "config.json"))
    if generate_dataset:
        generate_splits(
            data_path=data_path or cfg.DATA_PATH,
            gen_data_path=cfg.GEN_DATA_PATH,
            train_classes=cfg.TRAIN_CLASSES,
            seed=0,
            nmax_points=cfg.NMAX,
            nsteps=cfg.NSTEPS,
            crop_step=cfg.CROP_STEP,
            verbose=False,
        )

    encoder = ORCEDEncoder(
        n_out_labels=cfg.n_classes,
        sup_latent_dim=cfg.SUP_LATENT_DIM,
        pointnet_out_dim=cfg.POINTNET_OUT_DIM,
        dtc_filters=tuple(cfg.DTC_FILTERS),
    )
    decoder = ORCEDDecoder(
        nsteps=cfg.NSTEPS, nmax_points=cfg.NMAX, nfeatures=cfg.NFEATURES
    )
    mean_learner = GaussianMeanLearner(cfg.SUP_LATENT_DIM)
    # Pin weights on device once — host-numpy params re-upload per jit call
    # otherwise (the 860 MB decoder costs ~minutes per transfer over the
    # axon tunnel).
    enc_vars = jax.device_put(load_params(module_path(run_dir, model_name, "E")))
    dec_vars = jax.device_put(load_params(module_path(run_dir, model_name, "G")))
    ml_vars = load_params(module_path(run_dir, model_name, "ML"))

    # cluster means: eval-mode mean learner on the identity one-hots
    # (reference inference_ORCED.py:246-251; computed though unused by the
    # ensemble decision — kept for contract parity).
    oh = jnp.eye(cfg.n_classes, dtype=jnp.float32)
    cluster_means = np.asarray(mean_learner.apply(ml_vars, oh, train=False))

    return cfg, encoder, decoder, enc_vars, dec_vars, cluster_means


def orced_inference(
    model_names: Sequence[str],
    *,
    models_path: str = "models",
    figures_path: str = "figures",
    data_path: Optional[str] = None,
    generate_dataset: bool = True,
    batch_size: int = 64,
    seed: int = 0,
    eps_streams: Optional[Dict[str, np.ndarray]] = None,
    crop_order: Optional[Dict[str, Sequence[str]]] = None,
) -> Dict:
    """Full OR-CED evaluation driver (reference ``ORCED_inference``,
    ``inference_ORCED.py:257-456``).

    CRN-parity replay hooks (``tools/parity_twin_orced.py``):

    - ``crop_order``: optional ``{"train"|"test"|"unseen": [basenames]}``
      evaluation order override (e.g. the reference's raw ``os.listdir``
      order) — the order is decision-relevant through the train stats
      pass's ``drop_last`` truncation and the unseen batch filter;
    - ``eps_streams``: optional ``{"train"|"test"|"unseen":
      (n_crops, latent)}`` recorded reparam draws (rows aligned with the
      evaluation order) replayed instead of PRNG noise.
    """
    results: Dict = {}
    for model_name in model_names:
        figures_folder = os.path.join(figures_path, model_name)
        os.makedirs(figures_folder, exist_ok=True)

        cfg, encoder, decoder, enc_vars, dec_vars, _ = orced_inference_setup(
            model_name,
            models_path=models_path,
            data_path=data_path,
            generate_dataset=generate_dataset,
        )
        # distinct keys per pass: the reference draws fresh torch noise for
        # every batch of every loader (advisor round-1 finding 2)
        key_tr, key_te, key_un = jax.random.split(jax.random.PRNGKey(seed), 3)

        # All three loaders honor the run's SUBSAMPLE_FACTOR, matching the
        # reference's construction (inference_ORCED.py:186-221). The
        # reference's subsample draw is unseeded global np.random
        # (datasets.py:424-432); we use an explicit per-split seeded rng.
        ds_train = RadarCropDataset(
            SPLIT.TRAIN,
            cfg.GEN_DATA_PATH,
            subsample_factor=cfg.SUBSAMPLE_FACTOR,
            subsample_rng=np.random.default_rng(seed),
        )
        ds_test = RadarCropDataset(
            SPLIT.TEST,
            cfg.GEN_DATA_PATH,
            subsample_factor=cfg.SUBSAMPLE_FACTOR,
            subsample_rng=np.random.default_rng(seed + 1),
        )
        ds_unseen = RadarCropDataset(
            SPLIT.UNSEEN,
            cfg.GEN_DATA_PATH,
            subsample_factor=cfg.SUBSAMPLE_FACTOR,
            subsample_rng=np.random.default_rng(seed + 2),
        )

        # training statistics pass (drop_last=True in the reference loader,
        # inference_ORCED.py:191-197)
        eps_tr = eps_te = eps_un = None
        if eps_streams is not None:
            eps_tr = eps_streams.get("train")
            eps_te = eps_streams.get("test")
            eps_un = eps_streams.get("unseen")

        def reorder(ds, x, y, split_key):
            if crop_order is None or split_key not in crop_order:
                return x, y
            pos = {f: i for i, f in enumerate(ds.filenames)}
            idx = np.array(
                [pos[os.path.basename(f)] for f in crop_order[split_key]]
            )
            assert len(idx) == len(x), (split_key, len(idx), len(x))
            return x[idx], y[idx]

        x_tr, y_tr = ds_train.load_all()
        x_tr, y_tr = reorder(ds_train, x_tr, y_tr, "train")
        n_keep = (len(y_tr) // batch_size) * batch_size

        # Pad all three split scans to ONE step count so they share a single
        # compiled executable — each distinct scan length is a separate XLA
        # compile (~80 s over the axon tunnel at full dims; was 3 compiles =
        # the bulk of the round-4 276 s ORCED TPU inference).
        x_te, y_te = ds_test.load_all()
        x_te, y_te = reorder(ds_test, x_te, y_te, "test")
        x_un, y_un = ds_unseen.load_all()
        x_un, y_un = reorder(ds_unseen, x_un, y_un, "unseen")
        steps = max(
            -(-n // batch_size) for n in (n_keep, len(y_te), len(y_un))
        )

        tr_preds, tr_z, tr_re = _orced_pass(
            encoder, decoder, enc_vars, dec_vars, x_tr[:n_keep], key_tr,
            batch_size, eps=None if eps_tr is None else eps_tr[:n_keep],
            pad_to_steps=steps,
        )
        gt_labels = y_tr[:n_keep].astype(np.int64)
        n_labels = len(np.unique(gt_labels))
        thresholds_g = 0.95  # inference_ORCED.py:310

        # seen test set
        te_preds, te_z, te_re = _orced_pass(
            encoder, decoder, enc_vars, dec_vars, x_te, key_te, batch_size,
            eps=eps_te, pad_to_steps=steps,
        )
        # per-class train stats once — identical inputs for both splits
        # (orced_ensemble_ood_detection would redo this K-class pass twice)
        stats = orced_class_stats(tr_re, tr_z, gt_labels, tr_preds)
        test_open_preds = orced_apply_ood(
            stats, thresholds_g, te_preds, te_z, te_re
        )

        # unseen set: leave out the first-encountered subject (fairness vs
        # PCAA's validation subject); batch-level filter by first label.
        un_preds, un_z, un_re = _orced_pass(
            encoder, decoder, enc_vars, dec_vars, x_un, key_un, batch_size,
            eps=eps_un, pad_to_steps=steps,
        )
        leave_out = int(y_un[0])
        keep = []
        for start in range(0, len(y_un), batch_size):
            sl = slice(start, min(start + batch_size, len(y_un)))
            if int(y_un[start]) != leave_out:
                keep.append(np.arange(sl.start, sl.stop))
        keep_idx = (
            np.concatenate(keep) if keep else np.empty((0,), dtype=np.int64)
        )
        unseen_open_preds = orced_apply_ood(
            stats,
            thresholds_g,
            un_preds[keep_idx],
            un_z[keep_idx],
            un_re[keep_idx],
        )

        final_preds = np.concatenate([test_open_preds, unseen_open_preds])
        final_labels = np.concatenate(
            [y_te.astype(np.int64), np.full(len(unseen_open_preds), n_labels)]
        )

        metrics = openset_metrics(final_labels, final_preds)
        plot_openset_confusion_matrix(
            final_labels,
            final_preds,
            n_labels,
            os.path.join(figures_folder, "openset_cnfmtrx_ensemble_ood_fixed.png"),
        )
        np.save(
            os.path.join(figures_folder, "ensemble_ood_final_preds_fixed.npy"),
            final_preds,
        )
        np.save(
            os.path.join(figures_folder, "ensemble_ood_final_labels_fixed.npy"),
            final_labels,
        )
        # beyond-reference: persist the metrics next to the run (the
        # reference only PRINTS them, inference_ORCED.py:425-428), so
        # scripts/collect_results.py can aggregate ORCED cells too.
        save_json(
            metrics,
            os.path.join(models_path, model_name, "ensemble_ood_log.json"),
        )
        results[model_name] = metrics
    return results
