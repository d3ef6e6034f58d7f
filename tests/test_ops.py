"""Ops tests: Chamfer, losses, GP, open-set math, centroids.

Where possible the oracle is the actual reference formula executed through
an independent library (torch / scipy / sklearn, all baked into the image),
not a reimplementation — e.g. Chamfer is checked against a literal
torch transcription of ``utils.py:88-132`` semantics via brute-force numpy.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.stats import multivariate_normal, norm
from sklearn.metrics import roc_curve

from opensetgaitrecognition_pcaa_tpu.ops import (
    best_youden_threshold,
    cg_kl_divergence,
    cross_entropy,
    gradient_penalty,
    hyperrectangle_prob,
    log_joint_likelihood,
    normal_pdf,
    openness,
    sample_distant_points,
    seq_chamfer,
)
from opensetgaitrecognition_pcaa_tpu.ops.losses import (
    multi_similarity_mine,
    triplet_loss_with_ms_miner,
)


def brute_force_chamfer(preds, gts):
    """Direct transcription of utils.py:98-107 semantics in numpy."""
    B, T, N, C = gts.shape
    loss1 = np.zeros((B, T))
    loss2 = np.zeros((B, T))
    for b in range(B):
        for t in range(T):
            d = ((gts[b, t][:, None, :] - preds[b, t][None, :, :]) ** 2).sum(-1)
            loss1[b, t] = d.min(axis=0).sum()  # min over gt pts per pred pt
            loss2[b, t] = d.min(axis=1).sum()  # min over pred pts per gt pt
    return loss1 + loss2


class TestChamfer:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(0)
        gts = rng.normal(size=(2, 3, 17, 4)).astype(np.float32)
        preds = rng.normal(size=(2, 3, 17, 4)).astype(np.float32)
        expected = brute_force_chamfer(preds, gts)
        got = seq_chamfer(jnp.array(preds), jnp.array(gts))
        np.testing.assert_allclose(float(got), expected.mean(), rtol=1e-4)
        got_per = seq_chamfer(jnp.array(preds), jnp.array(gts), avg_out=False)
        np.testing.assert_allclose(np.array(got_per), expected.mean(1), rtol=1e-4)

    def test_zero_for_identical_clouds(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 2, 9, 4)).astype(np.float32)
        assert abs(float(seq_chamfer(jnp.array(x), jnp.array(x)))) < 1e-3

    def test_permutation_invariant(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 2, 9, 4)).astype(np.float32)
        perm = x[:, :, rng.permutation(9), :]
        a = float(seq_chamfer(jnp.array(perm), jnp.array(x)))
        assert abs(a) < 1e-3

    def test_grad_finite(self):
        rng = np.random.default_rng(3)
        x = jnp.array(rng.normal(size=(2, 2, 9, 4)).astype(np.float32))
        y = jnp.array(rng.normal(size=(2, 2, 9, 4)).astype(np.float32))
        g = jax.grad(lambda p: seq_chamfer(p, y))(x)
        assert np.isfinite(np.array(g)).all()


class TestLosses:
    def test_cross_entropy_matches_torch(self):
        import torch

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(8, 5)).astype(np.float32)
        labels = rng.integers(0, 5, 8)
        want = torch.nn.CrossEntropyLoss()(
            torch.tensor(logits), torch.tensor(labels)
        ).item()
        got = float(cross_entropy(jnp.array(logits), jnp.array(labels)))
        assert abs(want - got) < 1e-5

    def test_cg_kl_closed_form(self):
        # KL(N(mu, e^lv) || N(mu_k, I)) summed over dims, batch mean.
        rng = np.random.default_rng(1)
        mu = rng.normal(size=(4, 6)).astype(np.float32)
        lv = rng.normal(scale=0.3, size=(4, 6)).astype(np.float32)
        mu_k = rng.normal(size=(4, 6)).astype(np.float32)
        var = np.exp(lv)
        want = (0.5 * (var + (mu - mu_k) ** 2 - 1 - lv)).sum(1).mean()
        got = float(cg_kl_divergence(jnp.array(mu), jnp.array(lv), jnp.array(mu_k)))
        assert abs(want - got) < 1e-4

    def test_kl_zero_at_prior(self):
        mu = jnp.zeros((3, 8))
        lv = jnp.zeros((3, 8))
        assert abs(float(cg_kl_divergence(mu, lv, mu))) < 1e-6


class TestTriplet:
    def test_miner_masks(self):
        emb = jnp.array(
            [[1.0, 0.0], [0.99, 0.14], [0.0, 1.0], [-0.14, 0.99]], jnp.float32
        )
        emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
        labels = jnp.array([0, 0, 1, 1])
        keep_pos, keep_neg = multi_similarity_mine(emb, labels)
        assert keep_pos.shape == (4, 4)
        # positives/negatives masks only select correct label structure
        same = np.equal(labels[:, None], labels[None, :])
        assert not np.any(np.array(keep_pos) & ~same)
        assert not np.any(np.array(keep_neg) & same)

    def test_loss_zero_for_perfectly_separated(self):
        # Well-separated clusters, margin smaller than the gap → no violations
        # survive MS mining thresholds.
        emb = jnp.array(
            [[1.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [-1.0, 0.0]], jnp.float32
        )
        labels = jnp.array([0, 0, 1, 1])
        loss = float(triplet_loss_with_ms_miner(emb, labels, margin=0.5))
        assert loss == pytest.approx(0.0, abs=1e-6)

    def test_loss_positive_for_mixed(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(16, 8)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        labels = jnp.array(rng.integers(0, 4, 16))
        loss = float(triplet_loss_with_ms_miner(jnp.array(emb), labels, margin=0.5))
        assert loss > 0


class TestGradientPenalty:
    def test_unit_slope_critic_gives_zero(self):
        # critic(x) = sum(x)/sqrt(D) has gradient norm exactly 1 everywhere.
        D = 16
        critic = lambda x: jnp.sum(x, axis=1) / jnp.sqrt(D)
        rng = np.random.default_rng(0)
        z = jnp.array(rng.normal(size=(8, D)).astype(np.float32))
        c = jnp.array(rng.normal(size=(8, D)).astype(np.float32))
        a = jnp.array(rng.uniform(size=(8, 1)).astype(np.float32))
        gp = float(gradient_penalty(critic, z, c, a))
        assert gp == pytest.approx(0.0, abs=1e-6)

    def test_known_linear_critic(self):
        # critic(x) = 3 * sum(x): slope = 3*sqrt(D) → gp = (3*sqrt(D)-1)^2
        D = 4
        critic = lambda x: 3.0 * jnp.sum(x, axis=1)
        z = jnp.zeros((5, D))
        c = jnp.ones((5, D))
        a = jnp.full((5, 1), 0.5)
        gp = float(gradient_penalty(critic, z, c, a))
        want = (3 * np.sqrt(D) - 1) ** 2
        assert gp == pytest.approx(want, rel=1e-5)

    def test_differentiable_through_params(self):
        # double-diff: d(gp)/d(critic params) must exist and be finite
        def critic_with(w, x):
            return jnp.tanh(x @ w).sum(axis=1)

        rng = np.random.default_rng(1)
        w = jnp.array(rng.normal(size=(6, 3)).astype(np.float32))
        z = jnp.array(rng.normal(size=(4, 6)).astype(np.float32))
        c = jnp.array(rng.normal(size=(4, 6)).astype(np.float32))
        a = jnp.array(rng.uniform(size=(4, 1)).astype(np.float32))
        g = jax.grad(
            lambda w_: gradient_penalty(lambda x: critic_with(w_, x), z, c, a)
        )(w)
        assert np.isfinite(np.array(g)).all()


class TestOpenSetMath:
    def test_openness(self):
        assert openness(10, 10) == pytest.approx(0.0)
        assert openness(2, 10) == pytest.approx(1 - np.sqrt(4 / 12))

    def test_log_joint_likelihood_vs_scipy(self):
        rng = np.random.default_rng(0)
        means = rng.normal(size=(4, 8))
        x = rng.normal(size=(10, 8))
        want = np.log(
            np.mean(
                [multivariate_normal(m, np.eye(8)).pdf(x) for m in means], axis=0
            )
        )
        got = log_joint_likelihood(x, means)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_youden_threshold_vs_sklearn(self):
        rng = np.random.default_rng(1)
        pos = rng.normal(1.0, 1.0, 200)
        neg = rng.normal(-1.0, 1.0, 150)
        scores = np.concatenate([pos, neg])
        labels = np.concatenate([np.ones(200), np.zeros(150)])
        fpr, tpr, thr = roc_curve(labels, scores)
        want = thr[np.argmax(tpr - fpr)]
        got = best_youden_threshold(labels, scores)
        assert got == pytest.approx(want)

    def test_youden_threshold_inf_when_no_threshold_beats_chance(self):
        # max J == 0: sklearn's leading (0, 0, inf) point wins the argmax
        # and the reference rejects everything; the best FINITE score would
        # instead accept every sample (anti-correlated scores).
        labels = np.array([1.0, 0.0])
        scores = np.array([0.1, 0.9])
        fpr, tpr, thr = roc_curve(labels, scores)
        want = thr[np.argmax(tpr - fpr)]
        got = best_youden_threshold(labels, scores)
        assert np.isinf(want) and np.isinf(got) and got > 0

    def test_hyperrectangle_prob_vs_scipy_mvn(self):
        rng = np.random.default_rng(2)
        d = 5
        mean = rng.normal(size=d)
        cov_diag = rng.uniform(0.5, 2.0, size=d)
        z = rng.normal(size=(3, d))
        # scipy oracle = exactly the reference compute_prob
        # (inference_ORCED.py:18-45)
        mvn = multivariate_normal(mean, np.diag(cov_diag))
        for i in range(3):
            a = mean - np.abs(z[i] - mean)
            b = mean + np.abs(z[i] - mean)
            want = mvn.cdf(b) - mvn.cdf(a)
            got = hyperrectangle_prob(mean, cov_diag, z[i : i + 1])[0]
            assert got == pytest.approx(want, abs=1e-6)

    def test_normal_pdf_vs_scipy(self):
        x = np.linspace(-3, 3, 11)
        np.testing.assert_allclose(
            normal_pdf(x, 0.5, 1.3), norm.pdf(x, 0.5, 1.3), rtol=1e-12
        )


class TestCentroids:
    def test_min_distance_invariant(self):
        pts = sample_distant_points(32, 8, min_dist=10, sphere_radius=10)
        assert pts.shape == (8, 32)
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        assert d[d > 0].min() >= 10
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 10.0, rtol=1e-5)

    def test_deterministic_given_seed(self):
        a = sample_distant_points(16, 4, 5, 10, seed=42)
        b = sample_distant_points(16, 4, 5, 10, seed=42)
        np.testing.assert_array_equal(a, b)
