"""Run-folder contract: the on-disk interface between training and inference.

The reference's training/inference contract is a directory
``models/<MODEL_NAME>/`` holding a pickled config, per-module ``.pt`` weight
files and ``discriminator_means.pt`` (SURVEY.md §1;
``PCAA_ablation.py:1094-1119``, ``train_AAE.py:120-123``). This framework
keeps the same directory layout and file stems with safer formats:

====================  =============================
reference             this framework
====================  =============================
config.pkl            config.json
<NAME>_E.pt           <NAME>_E.msgpack   (encoder)
<NAME>_G.pt           <NAME>_G.msgpack   (decoder / "generator")
<NAME>_D.pt           <NAME>_D.msgpack   (discriminator)
<NAME>_ML.pt          <NAME>_ML.msgpack  (mean learner)
<NAME>_GPH.pt         <NAME>_GPH.msgpack (decoder projection head)
<NAME>_DPH.pt         <NAME>_DPH.msgpack (discriminator projection head)
discriminator_means.pt  discriminator_means.npy
====================  =============================

Weights are flax variable dicts (params + batch_stats) serialized with
``flax.serialization.msgpack`` — no pickle anywhere.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def save_params(variables: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    variables = jax.device_get(variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))


def load_params(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_array(arr, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.save(path, np.asarray(jax.device_get(arr)))


def load_array(path: str) -> np.ndarray:
    return np.load(path)


def module_path(run_dir: str, model_name: str, tag: str) -> str:
    """``models/<NAME>/<NAME>_<TAG>.msgpack`` (reference file-stem contract)."""
    return os.path.join(run_dir, f"{model_name}_{tag}.msgpack")


# --- full-state checkpoint/resume (beyond the reference, SURVEY.md §5) ------
#
# The reference saves best weights only and can never resume a run
# (``train_AAE.py:340-360``; optimizer state never persisted). The framework
# additionally checkpoints the COMPLETE training state — params, both Adam
# states, BatchNorm stats, PRNG key, epoch index, host shuffle-rng state —
# so an interrupted grid resumes mid-run with an identical trajectory.

import json


def save_train_state(
    state, epoch: int, host_rng_state: dict, path: str, extra: dict = None
) -> None:
    from flax import serialization as ser

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(ser.to_bytes(jax.device_get(state)))
    meta = {"epoch": epoch, "host_rng_state": host_rng_state}
    meta.update(extra or {})
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_train_state(template_state, path: str):
    """→ (state, next_epoch, meta dict) or None if no checkpoint."""
    from flax import serialization as ser

    if not (os.path.exists(path) and os.path.exists(path + ".meta.json")):
        return None
    with open(path, "rb") as f:
        state = ser.from_bytes(template_state, f.read())
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    return state, meta["epoch"] + 1, meta


def save_best_payload(payload, path: str) -> None:
    """Persist the best-by-validation weights next to the resume state.

    Without this, a resumed run whose restored ``best_valid_acc`` is never
    beaten would fall back to writing its FINAL weights as the module
    checkpoints — silently breaking the best-by-valid contract (the true
    best weights lived only on device when the run was interrupted)."""
    from flax import serialization as ser

    with open(path + ".best", "wb") as f:
        f.write(ser.to_bytes(jax.device_get(payload)))


def load_best_payload(template_payload, path: str):
    """→ the persisted best payload, or None if none was ever written."""
    from flax import serialization as ser

    if not os.path.exists(path + ".best"):
        return None
    with open(path + ".best", "rb") as f:
        return ser.from_bytes(template_payload, f.read())


def run_completed(run_dir: str) -> bool:
    """True if this run folder has its completion marker (grid resumability:
    the reference re-runs everything after a crash, SURVEY.md §5)."""
    return os.path.exists(os.path.join(run_dir, "run_complete.json"))


def mark_run_completed(run_dir: str, final_metrics: dict) -> None:
    with open(os.path.join(run_dir, "run_complete.json"), "w") as f:
        json.dump({k: float(v) for k, v in final_metrics.items()}, f)
