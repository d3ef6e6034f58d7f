"""Open-set scoring math: likelihoods, thresholds, rejection statistics.

Numerics note (SURVEY.md §7.3): the reference scores PCAA samples with a
32-D unit-covariance Gaussian-mixture *pdf* (``inference_PCAA.py:129-136``),
whose values live around 1e-40 and underflow float32 easily. All mixture
scoring here is done in **log space**; every reference comparison against
these scores (ROC threshold selection, `> threshold` counting) is
order-preserving under log, so decisions are unchanged.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erf, logsumexp


def openness(n_train: int, n_test: int) -> float:
    """Openness metric ``1 - sqrt(2 n_tr / (n_tr + n_te))`` (ref ``utils.py:212-213``)."""
    return float(1.0 - np.sqrt((2.0 * n_train) / (n_train + n_test)))


def log_joint_likelihood(x: np.ndarray, means: np.ndarray) -> np.ndarray:
    """Log of the mean of unit-covariance Gaussian pdfs centred at ``means``.

    Log-space equivalent of reference ``joint_likelihood``
    (``inference_PCAA.py:129-136``):
    ``log( (1/K) * sum_k N(x; m_k, I) )``.

    :param x: ``(n, d)`` or ``(d,)`` feature vectors.
    :param means: ``(K, d)`` mixture centres.
    :returns: ``(n,)`` log-likelihoods (scalar for a single vector).
    """
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    means = np.asarray(means, dtype=np.float64)
    d = means.shape[1]
    # squared distances (n, K)
    sq = (
        (x * x).sum(axis=1)[:, None]
        + (means * means).sum(axis=1)[None, :]
        - 2.0 * x @ means.T
    )
    log_pdf = -0.5 * sq - 0.5 * d * np.log(2.0 * np.pi)
    out = logsumexp(log_pdf, axis=1) - np.log(means.shape[0])
    return out if out.shape[0] > 1 else out[0]


def underflow_tied(log_scores: np.ndarray) -> np.ndarray:
    """Replicate the reference's linear-space underflow ties.

    The reference scores samples with the raw mixture pdf
    (``inference_PCAA.py:129-136``), whose ~1e-40-scale values underflow
    float64 to exact ``0.0`` for far-out latents; all such samples are TIED
    in ``sklearn.roc_curve`` and sit below any positive threshold. Pure
    log-space scoring would break those ties and could accept a sample the
    reference rejects. Mapping every log-score whose ``exp`` underflows to
    ``-inf`` makes the log-space score vector order-isomorphic to the
    reference's linear one *including ties*, so ROC thresholding and
    ``> threshold`` decisions match bit-for-bit (tested in
    ``tests/test_decision_parity.py`` on an underflow-heavy regime).
    """
    ls = np.asarray(log_scores, dtype=np.float64)
    with np.errstate(under="ignore"):
        return np.where(np.exp(ls) == 0.0, -np.inf, ls)


def roc_points(y_true: np.ndarray, scores: np.ndarray):
    """ROC curve points (fpr, tpr, thresholds), sklearn-compatible ordering.

    Thresholds are the distinct scores in decreasing order, led by sklearn's
    (fpr=0, tpr=0, threshold=+inf) point; a later point's tpr/fpr counts
    samples with ``score >= threshold`` as predicted-positive. Matches
    ``sklearn.metrics.roc_curve`` (used at ``inference_PCAA.py:225-231``) up
    to collinear-point pruning (``drop_intermediate``), which cannot move
    the Youden-J argmax: ties resolve to the lowest index = the start of a
    collinear run, and segment endpoints are exactly what sklearn keeps.
    The leading inf point CAN be the argmax — when no finite threshold
    achieves tpr > fpr (max J == 0), the reference's
    ``thresholds[argmax(tpr - fpr)]`` selects +inf and rejects everything;
    omitting it would instead pick the best finite score and silently
    accept samples the reference rejects.
    """
    y_true = np.asarray(y_true).astype(bool)
    scores = np.asarray(scores, dtype=np.float64)
    order = np.argsort(-scores, kind="mergesort")
    y_sorted = y_true[order]
    s_sorted = scores[order]
    # != (not np.diff) so ±inf ties are detected (diff(-inf, -inf) is NaN)
    distinct = np.where(s_sorted[1:] != s_sorted[:-1])[0]
    idx = np.r_[distinct, len(s_sorted) - 1]
    tps = np.cumsum(y_sorted)[idx]
    fps = (1 + idx) - tps
    tpr = tps / max(int(y_true.sum()), 1)
    fpr = fps / max(int((~y_true).sum()), 1)
    return (
        np.r_[0.0, fpr],
        np.r_[0.0, tpr],
        np.r_[np.inf, s_sorted[idx]],
    )


def best_youden_threshold(y_true: np.ndarray, scores: np.ndarray) -> float:
    """Threshold maximising Youden's J = tpr - fpr (ref ``inference_PCAA.py:230-231``).

    The reference uses ``roc_curve(...); thresholds[argmax(tpr - fpr)]``, with
    positives = seen-test samples scored by likelihood.
    """
    fpr, tpr, thresholds = roc_points(y_true, scores)
    return float(thresholds[int(np.argmax(tpr - fpr))])


def hyperrectangle_prob(
    mean: np.ndarray, cov_diag: np.ndarray, z: np.ndarray
) -> np.ndarray:
    """``mvn.cdf(b) − mvn.cdf(a)`` with ``a,b = mean ∓ |z − mean|``.

    Closed-form equivalent of reference ``compute_prob``
    (``inference_ORCED.py:18-45``) for X ~ N(mean, diag(cov_diag)). Despite
    its docstring, the reference computes a *difference of multivariate
    cdfs* — NOT the probability of the box (that would need
    inclusion–exclusion over 2^d corners). With a diagonal covariance each
    cdf factorizes over dimensions, and with the symmetric bounds
    ``h = |z − mean|`` the quantity collapses to

        prod_i Φ(h_i/σ_i)  −  prod_i (1 − Φ(h_i/σ_i)).

    We reproduce that quantity exactly (it's what the 0.95 rejection
    threshold was tuned against), in closed form instead of scipy's
    numerical integration.

    NOTE the reference call site passes ``cov=np.diag(stds)`` — per-dim
    *standard deviations* on the covariance diagonal, not variances
    (``inference_ORCED.py:107``). Callers wanting parity must do the same.

    :param mean: ``(d,)``; :param cov_diag: ``(d,)``; :param z: ``(n, d)``.
    :returns: ``(n,)`` cdf differences.
    """
    mean = np.asarray(mean, dtype=np.float64)
    cov_diag = np.asarray(cov_diag, dtype=np.float64)
    z = np.atleast_2d(np.asarray(z, dtype=np.float64))
    h = np.abs(z - mean[None, :]) / np.sqrt(cov_diag)[None, :]
    phi_upper = 0.5 * (1.0 + erf(h / np.sqrt(2.0)))  # Φ(h)
    cdf_b = np.prod(phi_upper, axis=1)
    cdf_a = np.prod(1.0 - phi_upper, axis=1)  # Φ(−h) per dim
    return cdf_b - cdf_a


def normal_pdf(x: np.ndarray, loc: float, scale: float) -> np.ndarray:
    """1-D normal pdf (reference uses ``scipy.stats.norm.pdf`` at
    ``inference_ORCED.py:109``)."""
    x = np.asarray(x, dtype=np.float64)
    return np.exp(-0.5 * ((x - loc) / scale) ** 2) / (scale * np.sqrt(2 * np.pi))
