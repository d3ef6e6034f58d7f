"""AOT-compiled serving: bake a trained run into a portable decision artifact.

The reference has no deployment story — its inference scripts
(``inference_PCAA.py``, ``inference_ORCED.py``) re-generate the dataset and
re-run python decision loops around the torch modules. Here a trained run
folder is compiled ONCE into a self-contained ``jax.export`` (StableHLO)
artifact whose only runtime dependency is jax: no flax model definitions,
no framework code, no dataset access. The artifact computes the full
open-set decision end-to-end on device:

- **PCAA** (``export_pcaa_decision``): ``(B, k, T, N, C)`` windows of k
  sequential crops → ``(B,)`` decisions (train-class index, or ``n_labels``
  = "unknown") + per-window above-threshold counts. Encoder weights, the
  discriminator mixture centres and the Youden-J rejection threshold
  (calibrated by ``infer/pcaa.py::calibrate_open_set`` at export time) are
  baked in as constants.
- **ORCED** (``export_orced_decision``): ``(B, T, N, C)`` crops + a
  ``(B, latent)`` reparametrization draw → the graph emits the forward
  triple ``(preds, z, rec_error)``; ``ServingArtifact.decide`` applies the
  host f64 OR-ensemble criterion (``orced_decide_host``, per-class stats
  carried in the meta JSON) → ``(B,)`` decisions plus the two criterion
  flags. Encoder+decoder weights are baked into the graph; the tiny f64
  criterion deliberately stays on the HOST, mirroring the production eval
  path (``infer/orced.py``): TPU f64 is float-float emulation whose erf
  compiles pathologically and carries ~49 mantissa bits — a fused
  on-device criterion would be slower to deploy and less faithful to the
  reference's numpy f64 decisions. The reparam noise is an explicit INPUT
  because the model samples it even in eval (reference quirk,
  ``models.py:446-500``); the loader draws it from a seeded numpy
  Generator by default — any standard-normal source is faithful, the
  reference's own draw is unseeded torch ``randn``.

The batch dimension is symbolic (``jax.export.symbolic_shape``), so one
artifact serves any batch size, and artifacts are exported for BOTH cpu and
tpu platforms (the decision graph is pure XLA — the Pallas fast paths are
deliberately not used here, they are single-platform custom calls).

Decision parity with the eval pipelines: the scoring / criteria math runs
in float64 exactly like the numpy eval path (the model forward stays f32 —
the trace runs under ``jax.enable_x64()`` and the only dtype-sensitive
model input, the ORCED eps, is passed explicitly in f32), so decisions
match the eval pipeline except where a score sits within ~1 ulp of its
threshold: the PCAA threshold is itself one of the calibration scores, and
BLAS-vs-XLA f64 summation order can differ in the last ulp. Exactness is
regression-tested in ``tests/test_serving.py`` on margin-checked fixtures.
On TPU, in-graph f64 (the PCAA mixture scoring) is float-float emulation
(~49 mantissa bits) — decisions still agree away from sub-1e-9 threshold
margins; the ORCED criterion avoids the question entirely by running on
the host (see the ORCED bullet above).

Artifact container: ``MAGIC | u64-LE meta length | meta JSON | StableHLO
blob`` in one file; ``load_serving_artifact`` returns a callable wrapper.

Note on size: constants are embedded in the artifact, so an ORCED artifact
carries the full 215M-parameter decoder (~860 MB at reference dims) — that
is the model, not overhead. PCAA artifacts only need the encoder (~5 MB).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from opensetgaitrecognition_pcaa_tpu.config import (
    SPLIT,
    VARIATION,
    variation_from_model_name,
)

_MAGIC = b"OSGRSRV1"
# ln(2**-1075): np.exp(x) rounds to exact 0.0 below this — the f64
# underflow-tie boundary replicated from ops/openset.py::underflow_tied
# (values within 1 ulp of the boundary may differ from numpy's correctly
# rounded exp; see module docstring).
_EXP_UNDERFLOW = -1075.0 * float(np.log(2.0))


def _log_joint_likelihood64(fv: jnp.ndarray, means: jnp.ndarray) -> jnp.ndarray:
    """f64 transcription of ``ops/openset.py::log_joint_likelihood`` (which
    is the log-space equivalent of reference ``inference_PCAA.py:129-136``),
    including the underflow ties."""
    x = fv.astype(jnp.float64)
    sq = (
        jnp.sum(x * x, axis=1)[:, None]
        + jnp.sum(means * means, axis=1)[None, :]
        - 2.0 * x @ means.T
    )
    d = means.shape[1]
    log_pdf = -0.5 * sq - 0.5 * d * jnp.log(2.0 * jnp.pi)
    ll = jax.nn.logsumexp(log_pdf, axis=1) - jnp.log(float(means.shape[0]))
    return jnp.where(ll < _EXP_UNDERFLOW, -jnp.inf, ll)


def make_pcaa_decision_fn(encoder, n_labels: int, k: int):
    """→ ``decide(variables, means_f64, log_threshold_f64, windows)``.

    ``windows``: ``(B, k, T, N, C)`` f32, k sequential crops per row.
    Returns ``(decisions (B,) int32, n_above (B,) int32)`` — the k-window
    majority vote with likelihood-threshold rejection, decision-identical
    to ``infer/pcaa.py::_window_vote`` (reference ``inference_PCAA.py:
    241-314``) for single-label windows.
    """

    def decide(variables, means, log_threshold, windows):
        b = windows.shape[0]
        flat = windows.reshape((b * k,) + windows.shape[2:])
        logits, fv = encoder.apply(variables, flat, train=False)
        preds = jnp.argmax(logits, axis=1).astype(jnp.int32).reshape(b, k)
        ll = _log_joint_likelihood64(fv, means).reshape(b, k)
        n_above = jnp.sum(ll > log_threshold, axis=1).astype(jnp.int32)
        counts = jnp.sum(
            jax.nn.one_hot(preds, n_labels, dtype=jnp.int32), axis=1
        )  # (b, n_labels)
        majority = jnp.argmax(counts, axis=1).astype(jnp.int32)
        decisions = jnp.where(
            n_above * 2 > k, majority, jnp.int32(n_labels)
        )
        return decisions, n_above

    return decide


def make_orced_forward_fn(encoder, decoder):
    """→ ``forward(e_vars, d_vars, x, eps)`` — the DEVICE part of the
    OR-CED decision.

    ``x``: ``(B, T, N, C)`` f32 crops; ``eps``: ``(B, latent)`` f32 reparam
    draw. Returns ``(preds (B,) i32, z (B, latent) f32, re (B,) f32)`` —
    argmax class, latent sample, per-crop Chamfer reconstruction error.
    The f64 OR-ensemble criterion itself (reference ``inference_ORCED.py:
    103-132``) runs as a HOST epilogue (``orced_decide_host``) on these
    three small outputs, exactly like the production eval path
    (``infer/orced.py``): TPU "f64" is float-float emulation — its erf
    compiles pathologically (a toy f64-erf graph took 229 s of remote
    compile; the fused full graph never finished) and carries only ~49
    mantissa bits, so fusing the criterion on-device would be both slower
    to deploy and LESS faithful to the reference's numpy f64 decisions.
    """
    from opensetgaitrecognition_pcaa_tpu.ops import seq_chamfer

    def forward(e_vars, d_vars, x, eps):
        logits, z, _mu, _logvar = encoder.apply(e_vars, x, train=False, eps=eps)
        preds = jnp.argmax(logits, axis=1).astype(jnp.int32)
        rec = decoder.apply(d_vars, z)
        re = seq_chamfer(rec, x, avg_out=False)  # (B,) f32
        return preds, z, re

    return forward


def orced_decide_host(
    preds, z, re, means_z, stds_z, thr_re, n_labels: int,
    threshold_g: float = 0.95,
):
    """Host f64 epilogue over ``make_orced_forward_fn`` outputs →
    ``(decisions (B,) i64, latent_flag (B,) bool, rec_flag (B,) bool)``.

    Delegates to the eval pipeline's single criterion implementation
    (``infer/orced.py::orced_criteria`` — diag(std) quirk and all), so
    artifact decisions are bit-identical to ``orced_inference``'s."""
    from opensetgaitrecognition_pcaa_tpu.infer.orced import (
        ORCEDClassStats,
        orced_criteria,
    )

    preds = np.asarray(preds)
    stats = ORCEDClassStats(
        means_z=np.asarray(means_z, np.float64),
        stds_z=np.asarray(stds_z, np.float64),
        thresholds_re=np.asarray(thr_re, np.float64),
        n_classes=int(n_labels),
    )
    latent_flag, rec_flag = orced_criteria(
        stats, threshold_g, preds,
        np.asarray(z, np.float64), np.asarray(re, np.float64),
    )
    decisions = np.array(preds, dtype=np.int64)
    decisions[latent_flag | rec_flag] = int(n_labels)
    return decisions, latent_flag, rec_flag


def _write_artifact(out_path: str, meta: Dict, exported) -> str:
    blob = exported.serialize()
    meta_bytes = json.dumps(meta).encode("utf-8")
    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(blob)
    return out_path


class ServingArtifact:
    """Loaded decision artifact: ``meta`` dict + device-callable function."""

    def __init__(self, meta: Dict, exported):
        self.meta = meta
        self._exported = exported

    def call(self, *args):
        """Raw call with the exported signature (see ``meta['inputs']``)."""
        return self._exported.call(*args)

    def decide(
        self,
        x: np.ndarray,
        *,
        eps: Optional[np.ndarray] = None,
        seed: int = 0,
    ):
        """Convenience wrapper: PCAA takes ``x=(B,k,T,N,C)`` windows →
        ``(decisions, n_above)``; ORCED takes ``x=(B,T,N,C)`` crops (``eps``
        drawn from ``np.random.default_rng(seed)`` unless given), runs the
        device forward and the host f64 OR-ensemble epilogue →
        ``(decisions, latent_flag, rec_flag)``."""
        x = np.asarray(x, np.float32)
        if self.meta["model"] == "pcaa":
            return self.call(x)
        if eps is None:
            eps = (
                np.random.default_rng(seed)
                .standard_normal((x.shape[0], self.meta["latent_dim"]))
                .astype(np.float32)
            )
        preds, z, re = self.call(x, np.asarray(eps, np.float32))
        return orced_decide_host(
            preds, z, re,
            self.meta["means_z"], self.meta["stds_z"],
            self.meta["thresholds_re"], self.meta["n_labels"],
            self.meta.get("threshold_g", 0.95),
        )


def load_serving_artifact(path: str) -> ServingArtifact:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:  # not assert: must survive python -O (public API)
            raise ValueError(f"not a serving artifact: {path!r}")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        exported = jax_export.deserialize(f.read())
    return ServingArtifact(meta, exported)


def _export_multi_platform(fun, specs: Sequence[jax.ShapeDtypeStruct]):
    """Export for cpu+tpu under an x64 trace (see module docstring)."""
    with jax.enable_x64():
        return jax_export.export(jax.jit(fun), platforms=("cpu", "tpu"))(
            *specs
        )


def export_pcaa_decision(
    model_name: str,
    k: int,
    *,
    models_path: str = "models",
    data_path: Optional[str] = None,
    out_path: Optional[str] = None,
    generate_dataset: bool = True,
    seed: int = 0,
    unseen_valid_ratio: float = 0.2,
    variation: Optional[VARIATION] = None,
) -> Tuple[str, Dict]:
    """Calibrate + compile one trained PCAA run into a decision artifact.

    Runs the eval pipeline's own calibration (``calibrate_open_set`` —
    threshold selection on the generated TEST/UNSEEN splits, reference
    ``inference_PCAA.py:195-231``), then bakes weights + centres +
    threshold into an exported function. Returns ``(path, meta)``.
    """
    from opensetgaitrecognition_pcaa_tpu.infer.pcaa import (
        calibrate_open_set,
        pcaa_inference_setup,
    )

    var = variation or variation_from_model_name(model_name)
    cfg, encoder, enc_vars, means = pcaa_inference_setup(
        model_name,
        var,
        models_path=models_path,
        data_path=data_path,
        generate_dataset=generate_dataset,
    )
    cal = calibrate_open_set(
        encoder,
        enc_vars,
        means,
        cfg,
        seed=seed,
        unseen_valid_ratio=unseen_valid_ratio,
    )

    decide = make_pcaa_decision_fn(encoder, cal.n_labels, k)
    enc_host = jax.device_get(enc_vars)
    means64 = np.asarray(means, np.float64)
    thr = np.float64(cal.log_threshold)

    def baked(windows):
        return decide(enc_host, means64, thr, windows)

    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct(
        (b, k, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES), jnp.float32
    )
    exported = _export_multi_platform(baked, [spec])

    meta = {
        "format": "osgr-serving-v1",
        "model": "pcaa",
        "model_name": model_name,
        "variation": var.value,
        "k": k,
        "n_labels": cal.n_labels,
        "unknown_label": cal.n_labels,
        "log_threshold": float(cal.log_threshold),
        "inputs": [f"windows (b, {k}, {cfg.NSTEPS}, {cfg.NMAX}, "
                   f"{cfg.NFEATURES}) f32"],
        "outputs": ["decisions (b,) i32", "n_above_threshold (b,) i32"],
    }
    out_path = out_path or os.path.join(
        models_path, model_name, f"serving_decision_k{k}.osgr"
    )
    return _write_artifact(out_path, meta, exported), meta


def export_orced_decision(
    model_name: str,
    *,
    models_path: str = "models",
    data_path: Optional[str] = None,
    out_path: Optional[str] = None,
    generate_dataset: bool = True,
    batch_size: int = 64,
    seed: int = 0,
) -> Tuple[str, Dict]:
    """Calibrate + compile one trained OR-CED run into a decision artifact.

    Runs the eval pipeline's training-split statistics pass (reference
    ``inference_ORCED.py:282-307`` → per-class stats ``:89-98``), then bakes
    encoder+decoder weights and the stats. Returns ``(path, meta)``.
    """
    from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
    from opensetgaitrecognition_pcaa_tpu.infer.orced import (
        _orced_pass,
        orced_class_stats,
        orced_inference_setup,
    )

    cfg, encoder, decoder, enc_vars, dec_vars, _ = orced_inference_setup(
        model_name,
        models_path=models_path,
        data_path=data_path,
        generate_dataset=generate_dataset,
    )
    ds_train = RadarCropDataset(
        SPLIT.TRAIN,
        cfg.GEN_DATA_PATH,
        subsample_factor=cfg.SUBSAMPLE_FACTOR,
        subsample_rng=np.random.default_rng(seed),
    )
    x_tr, y_tr = ds_train.load_all()
    n_keep = (len(y_tr) // batch_size) * batch_size  # drop_last, as in eval
    # the TRAIN split's reparam key exactly as orced_inference derives it
    # (infer/orced.py: key_tr, key_te, key_un = split(PRNGKey(seed), 3)) —
    # so the baked per-class stats match the eval pipeline's for this seed
    key_tr = jax.random.split(jax.random.PRNGKey(seed), 3)[0]
    tr_preds, tr_z, tr_re = _orced_pass(
        encoder,
        decoder,
        enc_vars,
        dec_vars,
        x_tr[:n_keep],
        key_tr,
        batch_size,
    )
    stats = orced_class_stats(
        tr_re, tr_z, y_tr[:n_keep].astype(np.int64), tr_preds
    )

    forward = make_orced_forward_fn(encoder, decoder)
    # bake HOST copies re-read from the run folder — enc_vars/dec_vars are
    # device-pinned (orced_inference_setup) and a device_get of the ~860 MB
    # decoder over the axon tunnel costs minutes; the local msgpack is free
    from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
        load_params,
        module_path,
    )

    run_dir = os.path.join(models_path, model_name)
    e_host = load_params(module_path(run_dir, model_name, "E"))
    d_host = load_params(module_path(run_dir, model_name, "G"))

    def baked(x, eps):
        return forward(e_host, d_host, x, eps)

    (b,) = jax_export.symbolic_shape("b")
    latent = cfg.SUP_LATENT_DIM
    specs = [
        jax.ShapeDtypeStruct(
            (b, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES), jnp.float32
        ),
        jax.ShapeDtypeStruct((b, latent), jnp.float32),
    ]
    exported = _export_multi_platform(baked, specs)

    meta = {
        "format": "osgr-serving-v1",
        "model": "orced",
        "model_name": model_name,
        "n_labels": stats.n_classes,
        "unknown_label": stats.n_classes,
        "latent_dim": latent,
        "inputs": [
            f"crops (b, {cfg.NSTEPS}, {cfg.NMAX}, {cfg.NFEATURES}) f32",
            f"eps (b, {latent}) f32 reparam draw",
        ],
        # the GRAPH emits the forward triple; ``ServingArtifact.decide``
        # applies the host f64 OR-ensemble epilogue (orced_decide_host)
        # from the stats below → (decisions, latent_flag, rec_flag)
        "outputs": [
            "preds (b,) i32",
            f"z (b, {latent}) f32",
            "rec_error (b,) f32",
        ],
        "threshold_g": 0.95,
        "means_z": np.asarray(stats.means_z, np.float64).tolist(),
        "stds_z": np.asarray(stats.stds_z, np.float64).tolist(),
        "thresholds_re": np.asarray(
            stats.thresholds_re, np.float64
        ).tolist(),
    }
    out_path = out_path or os.path.join(
        models_path, model_name, "serving_decision.osgr"
    )
    return _write_artifact(out_path, meta, exported), meta
