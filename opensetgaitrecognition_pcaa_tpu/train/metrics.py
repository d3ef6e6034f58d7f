"""Pluggable experiment tracking: JSONL always, wandb when available.

Replaces the reference's hard wandb dependency (``train_AAE.py:98-106``,
8 scalars per epoch at ``train_AAE.py:326-337``) with a local-first writer:
every run gets ``metrics.jsonl`` in its run folder (one JSON object per
epoch, reference-identical metric key names), and wandb is used only if the
package is importable and ``mode != "disabled"`` — this image doesn't ship
it, and the framework must run offline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, run_dir: str, config: Optional[dict] = None, mode: str = "disabled"):
        os.makedirs(run_dir, exist_ok=True)
        self._path = os.path.join(run_dir, "metrics.jsonl")
        self._file = open(self._path, "a")
        self._t0 = time.time()
        self._wandb = None
        if mode != "disabled":
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project="PCAA",
                    config=config,
                    name=(config or {}).get("MODEL_NAME"),
                    notes=(config or {}).get("NOTES"),
                    reinit=True,
                    mode=mode,
                )
            except ImportError:
                self._wandb = None

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        rec = {"_step": step, "_wall": time.time() - self._t0}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
