"""Evaluation artifact writers: metrics JSON, preds/labels npy, confusion PNG.

Filename patterns follow the reference exactly (``inference_PCAA.py:319-347,
440-455``; ``inference_ORCED.py:446-454``) so downstream consumers of a run
folder see the same contract. Two deviations in the confusion-matrix plot:

- no LaTeX text rendering (``text.usetex``) — the reference requires a TeX
  install (``inference_PCAA.py:351-357``); same layout, colormap, clim and
  tick labels with stock matplotlib;
- ``labels=range(n_labels + 1)`` is passed to ``confusion_matrix`` (the
  reference omits it, ``:363``): the fixed T0..T{n-1}+U tick labels assume
  an (n+1)² matrix, and without ``labels=`` a class absent from a
  scenario-restricted eval set shrinks the matrix and misaligns the ticks
  (the reference crashes/mislabels in that case — no behavior to match).
  Absent classes produce a zero-sum row under ``normalize='true'``; those
  NaN rows render as 0 so the PNG stays readable.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def save_json(obj: Dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


def openset_metrics(final_labels: np.ndarray, final_preds: np.ndarray) -> Dict:
    """accuracy + micro/macro/weighted F1 (reference ``inference_PCAA.py:325-331``)."""
    from sklearn.metrics import f1_score

    final_labels = np.asarray(final_labels).astype(int)
    final_preds = np.asarray(final_preds).astype(int)
    return {
        "accuracy": float(np.equal(final_labels, final_preds).sum() / len(final_labels)),
        "f1_micro": float(f1_score(final_labels, final_preds, average="micro")),
        "f1_macro": float(f1_score(final_labels, final_preds, average="macro")),
        "f1_weighted": float(f1_score(final_labels, final_preds, average="weighted")),
    }


def plot_openset_confusion_matrix(
    final_labels: np.ndarray,
    final_preds: np.ndarray,
    n_labels: int,
    out_path: str,
) -> None:
    """Normalized confusion matrix with T0..T{n-1} + U ticks
    (reference ``plot_confusion_matrix_cgaae``, ``inference_PCAA.py:350-379``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import ConfusionMatrixDisplay, confusion_matrix

    import warnings

    with warnings.catch_warnings():
        # a class absent from the eval set gives a zero-sum row →
        # RuntimeWarning + NaN row; see module docstring
        warnings.simplefilter("ignore", RuntimeWarning)
        cm = confusion_matrix(
            np.asarray(final_labels).astype(int),
            np.asarray(final_preds).astype(int),
            normalize="true",
            labels=list(range(n_labels + 1)),
        )
    cm = np.nan_to_num(cm)
    disp = ConfusionMatrixDisplay(
        confusion_matrix=cm, display_labels=range(n_labels + 1)
    )
    disp.plot(cmap=plt.get_cmap("Blues"), values_format=".3f", ax=None)
    disp.ax_.get_images()[0].set_clim(0, 1)
    plt.xticks(
        range(n_labels + 1),
        [f"T{i}" for i in range(n_labels)] + ["U"],
        rotation=90,
    )
    plt.yticks(range(n_labels + 1), [f"T{i}" for i in range(n_labels)] + ["U"])
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    plt.savefig(out_path, dpi=300)
    plt.close("all")
