"""Serving-export tests: AOT decision artifacts vs the eval pipelines.

Covers ``infer/serving.py``: decision-function semantics against numpy
transcriptions of the reference decision rules, export/deserialize
roundtrips with a symbolic batch dimension, and end-to-end agreement of a
loaded artifact with the eval pipeline on a trained tiny run.

Boundary note: the artifact computes scores in f64 like the eval path, but
its encoder runs the whole batch in one XLA call while the eval pipeline
chunks (``batched_apply``) — different fusion can move f32 latents by an
ulp, so end-to-end comparisons exclude windows whose score sits within
1e-9 of the threshold (the threshold is itself one of the calibration
scores; see the serving module docstring).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export as jax_export

from opensetgaitrecognition_pcaa_tpu.config import SPLIT, VARIATION
from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
from opensetgaitrecognition_pcaa_tpu.infer.orced import (
    ORCEDClassStats,
    _orced_pass,
    orced_apply_ood,
    orced_class_stats,
    orced_ensemble_ood_detection,
)
from opensetgaitrecognition_pcaa_tpu.infer.serving import (
    _export_multi_platform,
    _log_joint_likelihood64,
    export_orced_decision,
    export_pcaa_decision,
    load_serving_artifact,
    make_orced_forward_fn,
    make_pcaa_decision_fn,
    orced_decide_host,
)
from opensetgaitrecognition_pcaa_tpu.models import (
    CGEncoder,
    ORCEDDecoder,
    ORCEDEncoder,
)
from opensetgaitrecognition_pcaa_tpu.ops import (
    log_joint_likelihood,
    seq_chamfer,
    underflow_tied,
)

T, N, C, NL, K, LAT = 6, 16, 4, 3, 4, 8


@pytest.fixture(scope="module")
def tiny_pcaa():
    enc = CGEncoder(
        n_out_labels=NL,
        sup_latent_dim=LAT,
        pointnet_out_dim=32,
        dtc_filters=(8, 16),
        use_projection_head=True,
    )
    ev = enc.init(
        jax.random.PRNGKey(0), jnp.zeros((2, T, N, C), jnp.float32), train=False
    )
    means = np.random.default_rng(0).normal(size=(NL, LAT))
    return enc, ev, means


@pytest.fixture(scope="module")
def tiny_orced():
    key = jax.random.PRNGKey(0)
    enc = ORCEDEncoder(
        n_out_labels=NL, sup_latent_dim=LAT, pointnet_out_dim=32,
        dtc_filters=(8, 16),
    )
    dec = ORCEDDecoder(nsteps=T, nmax_points=N, nfeatures=C)
    ev = enc.init(
        {"params": key, "reparam": key},
        jnp.zeros((2, T, N, C), jnp.float32),
        train=False,
    )
    dv = dec.init(key, jnp.zeros((2, LAT), jnp.float32))
    return enc, dec, ev, dv


def _numpy_pcaa_decisions(enc, ev, means, thr, windows):
    """Transcription of the reference's accept/vote/reject rule
    (``inference_PCAA.py:241-314``) over single-label windows."""
    b, k = windows.shape[:2]
    logits, fv = enc.apply(ev, windows.reshape((-1,) + windows.shape[2:]),
                           train=False)
    preds = np.asarray(logits).argmax(1).reshape(b, k)
    ll = underflow_tied(
        np.asarray(log_joint_likelihood(np.asarray(fv, np.float64), means))
    ).reshape(b, k)
    out = []
    for i in range(b):
        n_above = int((ll[i] > thr).sum())
        out.append(
            int(np.argmax(np.bincount(preds[i]))) if n_above > k / 2 else NL
        )
    return np.array(out), ll


class TestPCAADecisionFn:
    def test_matches_numpy_vote(self, tiny_pcaa):
        enc, ev, means = tiny_pcaa
        decide = jax.jit(make_pcaa_decision_fn(enc, NL, K))
        w = np.random.default_rng(1).normal(size=(6, K, T, N, C)).astype(
            np.float32
        )
        # place the threshold at the scores' median so both branches
        # (accept-vote and reject) are exercised
        _, ll = _numpy_pcaa_decisions(enc, ev, means, 0.0, w)
        # median of the scores, nudged off the exact tie so strict-> is
        # unambiguous → both branches (accept-vote and reject) exercised
        thr = np.nextafter(np.float64(np.median(ll)), -np.inf)
        expected, ll = _numpy_pcaa_decisions(enc, ev, means, thr, w)
        assert np.min(np.abs(ll - thr)) > 1e-9  # margin-checked fixture
        with jax.enable_x64():
            dec, n_above = decide(ev, means, thr, jnp.asarray(w))
        np.testing.assert_array_equal(np.asarray(dec), expected)
        assert set(np.asarray(dec)) & {NL}, "fixture never rejects"
        assert set(np.asarray(dec)) - {NL}, "fixture never accepts"

    def test_export_roundtrip_symbolic_batch(self, tiny_pcaa):
        enc, ev, means = tiny_pcaa
        decide = make_pcaa_decision_fn(enc, NL, K)
        thr = np.float64(-12.0)

        def baked(w):
            return decide(ev, np.asarray(means, np.float64), thr, w)

        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, K, T, N, C), jnp.float32)
        exported = _export_multi_platform(baked, [spec])
        again = jax_export.deserialize(exported.serialize())
        for bs in (2, 5):
            w = np.random.default_rng(bs).normal(
                size=(bs, K, T, N, C)
            ).astype(np.float32)
            d1, n1 = again.call(w)
            d2, n2 = exported.call(w)
            np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
            np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
            assert np.asarray(d1).shape == (bs,)

    def test_load_rejects_non_artifact(self, tmp_path):
        junk = tmp_path / "weights.msgpack"
        junk.write_bytes(b"\x00" * 64)  # 8 zero bytes would be a 0 meta-len
        with pytest.raises(ValueError, match="not a serving artifact"):
            load_serving_artifact(str(junk))

    def test_underflow_ties_replicated(self):
        # scores whose f64 exp underflows to 0.0 must map to -inf exactly
        # like ops/openset.py::underflow_tied (away from the 1-ulp boundary)
        fv = np.zeros((2, LAT))
        fv[0, 0] = 60.0  # squared distance ~3600 → ll ~ -1800: underflows
        means = np.zeros((1, LAT))
        with jax.enable_x64():
            ll = np.asarray(
                jax.jit(_log_joint_likelihood64)(
                    jnp.asarray(fv, jnp.float32), jnp.asarray(means)
                )
            )
        ref = underflow_tied(np.asarray(log_joint_likelihood(fv, means)))
        assert ll[0] == -np.inf and ref[0] == -np.inf
        assert np.isfinite(ll[1]) and np.isfinite(ref[1])
        np.testing.assert_allclose(ll[1], ref[1], rtol=1e-12)


class TestORCEDDecisionFn:
    def test_forward_plus_host_epilogue_matches_numpy_ensemble(
        self, tiny_orced
    ):
        # the artifact decision = jitted device forward + host f64 epilogue
        # (infer/serving.py design note: TPU f64 is emulated, so the
        # criterion stays on the host) — must equal the eval pipeline's
        # numpy OR-ensemble on an independently-computed forward
        enc, dec, ev, dv = tiny_orced
        rng = np.random.default_rng(2)
        means_z = rng.normal(size=(NL, LAT))
        stds_z = np.abs(rng.normal(size=(NL, LAT))) + 0.5
        thr_re = np.abs(rng.normal(size=(NL,))) * 5 + 20
        x = rng.normal(size=(7, T, N, C)).astype(np.float32)
        eps = rng.standard_normal((7, LAT)).astype(np.float32)

        forward = jax.jit(make_orced_forward_fn(enc, dec))
        f_preds, f_z, f_re = jax.device_get(
            forward(ev, dv, jnp.asarray(x), jnp.asarray(eps))
        )
        d, lf, rf = orced_decide_host(
            f_preds, f_z, f_re, means_z, stds_z, thr_re, NL
        )

        # same forward outside, then the numpy decision rule
        logits, z, _, _ = enc.apply(ev, x, train=False, eps=jnp.asarray(eps))
        preds = np.asarray(logits).argmax(1)
        np.testing.assert_array_equal(f_preds, preds)
        re = np.asarray(seq_chamfer(dec.apply(dv, z), x, avg_out=False))
        np.testing.assert_allclose(f_re, re, rtol=1e-6)
        stats = ORCEDClassStats(means_z, stds_z, thr_re, NL)
        expected = orced_apply_ood(stats, 0.95, preds, np.asarray(z), re)
        np.testing.assert_array_equal(np.asarray(d), expected)
        # criterion flags must explain every rejection
        rej = np.asarray(d) == NL
        np.testing.assert_array_equal(
            rej, np.asarray(lf) | np.asarray(rf)
        )

    def test_stats_split_equals_monolith(self):
        # orced_class_stats + orced_apply_ood ≡ orced_ensemble_ood_detection
        rng = np.random.default_rng(3)
        n_tr, n_te = 64, 17
        re_tr = np.abs(rng.normal(size=n_tr)) + 1
        z_tr = rng.normal(size=(n_tr, LAT))
        gt = rng.integers(0, NL, size=n_tr)
        pr = np.where(rng.random(n_tr) < 0.7, gt, rng.integers(0, NL, n_tr))
        te_pred = rng.integers(0, NL, size=n_te)
        z_te = rng.normal(size=(n_te, LAT)) * 2
        re_te = np.abs(rng.normal(size=n_te)) * 3
        mono = orced_ensemble_ood_detection(
            re_tr, z_tr, 0.95, gt, pr, te_pred, z_te, re_te
        )
        stats = orced_class_stats(re_tr, z_tr, gt, pr)
        split = orced_apply_ood(stats, 0.95, te_pred, z_te, re_te)
        np.testing.assert_array_equal(mono, split)


def _sequential_windows(ds, k):
    """Single-label non-overlapping k-windows + their start indices
    (the composition rule of ``infer/pcaa.py::_window_vote``)."""
    x, y = ds.load_all()
    x, y = np.asarray(x), np.asarray(y)
    wins, starts = [], []
    for s in range(0, len(y) - k + 1, k):
        if len(np.unique(y[s : s + k])) != 1:
            continue
        wins.append(x[s : s + k])
        starts.append(s)
    return np.stack(wins), np.array(starts)


class TestEndToEndArtifacts:
    def test_pcaa_artifact_matches_eval_pipeline(self, trained_v4_run):
        cfg, model_name = trained_v4_run
        path, meta = export_pcaa_decision(
            model_name,
            K,
            models_path=cfg.MODELS_PATH,
            generate_dataset=False,
        )
        assert meta["n_labels"] == cfg.n_classes
        art = load_serving_artifact(path)
        assert art.meta["model"] == "pcaa" and art.meta["k"] == K

        from opensetgaitrecognition_pcaa_tpu.infer.pcaa import (
            _window_vote,
            calibrate_open_set,
            pcaa_inference_setup,
        )

        _, encoder, enc_vars, means = pcaa_inference_setup(
            model_name,
            VARIATION.V4,
            models_path=cfg.MODELS_PATH,
            generate_dataset=False,
        )
        cal = calibrate_open_set(encoder, enc_vars, means, cfg)
        assert meta["log_threshold"] == cal.log_threshold

        # eval decisions on the seen-test split
        ev_preds, _ = _window_vote(
            cal.test_ll, cal.test_preds, cal.test_labels, K,
            cal.log_threshold, cal.n_labels,
        )
        ds_test = RadarCropDataset(
            SPLIT.TEST, cfg.GEN_DATA_PATH, sequential=True
        )
        wins, starts = _sequential_windows(ds_test, K)
        dec, _ = art.decide(wins)
        dec = np.asarray(dec)
        assert len(dec) == len(ev_preds)

        # exclude knife-edge windows (threshold IS a calibration score)
        margins = np.array(
            [
                np.min(np.abs(cal.test_ll[s : s + K] - cal.log_threshold))
                for s in starts
            ]
        )
        safe = margins > 1e-9
        assert safe.sum() >= 0.9 * len(dec)
        np.testing.assert_array_equal(dec[safe], np.array(ev_preds)[safe])

    def test_orced_artifact_matches_eval_pipeline(self, trained_orced_run):
        cfg, model_name = trained_orced_run
        path, meta = export_orced_decision(
            model_name,
            models_path=cfg.MODELS_PATH,
            generate_dataset=False,
            batch_size=32,
        )
        art = load_serving_artifact(path)
        assert art.meta["model"] == "orced"
        assert art.meta["latent_dim"] == cfg.SUP_LATENT_DIM

        from opensetgaitrecognition_pcaa_tpu.infer.orced import (
            orced_inference_setup,
        )

        _, encoder, decoder, enc_vars, dec_vars, _ = orced_inference_setup(
            model_name, models_path=cfg.MODELS_PATH, generate_dataset=False
        )
        # training stats exactly as the export computed them
        ds_train = RadarCropDataset(
            SPLIT.TRAIN,
            cfg.GEN_DATA_PATH,
            subsample_factor=cfg.SUBSAMPLE_FACTOR,
            subsample_rng=np.random.default_rng(0),
        )
        x_tr, y_tr = ds_train.load_all()
        n_keep = (len(y_tr) // 32) * 32
        tr_preds, tr_z, tr_re = _orced_pass(
            encoder, decoder, enc_vars, dec_vars, x_tr[:n_keep],
            jax.random.split(jax.random.PRNGKey(0), 3)[0], 32,
        )
        stats = orced_class_stats(
            tr_re, tr_z, y_tr[:n_keep].astype(np.int64), tr_preds
        )

        ds_test = RadarCropDataset(SPLIT.TEST, cfg.GEN_DATA_PATH)
        x_te, _ = ds_test.load_all()
        x_te = np.asarray(x_te)[:48]
        eps = (
            np.random.default_rng(9)
            .standard_normal((len(x_te), cfg.SUP_LATENT_DIM))
            .astype(np.float32)
        )
        dec_art, _, _ = art.decide(x_te, eps=eps)

        # eval path with the SAME eps → same preds/z/re up to chunking ulps
        te_preds, te_z, te_re = _orced_pass(
            encoder, decoder, enc_vars, dec_vars, x_te,
            jax.random.PRNGKey(1), 32, eps=eps,
        )
        expected = orced_apply_ood(stats, 0.95, te_preds, te_z, te_re)
        agree = float(np.mean(np.asarray(dec_art) == expected))
        assert agree >= 0.95, agree

    def test_decide_draws_eps_when_missing(self, trained_orced_run):
        cfg, model_name = trained_orced_run
        path = os.path.join(
            cfg.MODELS_PATH, model_name, "serving_decision.osgr"
        )
        art = load_serving_artifact(path)  # written by the test above
        ds_test = RadarCropDataset(SPLIT.TEST, cfg.GEN_DATA_PATH)
        x_te, _ = ds_test.load_all()
        x = np.asarray(x_te)[:8]
        d1, _, _ = art.decide(x, seed=5)
        d2, _, _ = art.decide(x, seed=5)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


@pytest.fixture(scope="module")
def trained_v4_run(generated_splits, tmp_path_factory):
    from opensetgaitrecognition_pcaa_tpu.train import train_pcaa

    from tests.test_train import tiny_config

    gen, _ = generated_splits
    tmp = tmp_path_factory.mktemp("srv_v4")
    name = "SRV_V4.3.1"
    cfg = tiny_config(gen, tmp, name, EPOCHS=2)
    x_t, y_t = RadarCropDataset(SPLIT.TRAIN, gen).load_all()
    x_v, y_v = RadarCropDataset(SPLIT.VALID, gen).load_all()
    train_pcaa(cfg, VARIATION.V4, datasets=(x_t, y_t, x_v, y_v), verbose=False)
    return cfg, name


@pytest.fixture(scope="module")
def trained_orced_run(generated_splits, tmp_path_factory):
    from opensetgaitrecognition_pcaa_tpu.train import train_orced

    from tests.test_train import tiny_config

    gen, _ = generated_splits
    tmp = tmp_path_factory.mktemp("srv_orced")
    name = "SRV_ORCED.3.1"
    cfg = tiny_config(gen, tmp, name, EPOCHS=2)
    x_t, y_t = RadarCropDataset(SPLIT.TRAIN, gen).load_all()
    x_v, y_v = RadarCropDataset(SPLIT.VALID, gen).load_all()
    train_orced(cfg, datasets=(x_t, y_t, x_v, y_v), verbose=False)
    return cfg, name
