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
