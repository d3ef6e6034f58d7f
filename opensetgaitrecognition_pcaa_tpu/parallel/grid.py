"""Run-level ("grid") parallelism: train many independent runs at once.

The reference's experiment grids are sequential for-loops over 20–120 small
independent trainings (``PCAA_ablation.py:1128-1191``,
``train_pointsubsampling.py:22-23``). On TPU the idiomatic replacement is to
**vmap the whole train step over a run axis** and shard that axis across the
device mesh — R runs advance in lockstep, one jitted scan per epoch, perfect
scaling because runs never communicate (SURVEY.md §2.2).

Mechanics:
- every run must share static shapes (same n_classes / NMAX / batch size —
  true within one openness level of the grid);
- per-run datasets are padded to a common length; each run's epoch
  permutation indexes only its own real samples, and runs whose epoch is
  shorter (fewer batches) are masked out for the trailing steps, so each run
  sees *exactly* the reference's schedule: every sample once per epoch,
  drop_last, its own shuffle stream;
- the run axis is sharded over the mesh's ``data`` axis (``P('data')``), so
  R runs on D devices cost ~R/D the wall-clock of a sequential grid.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opensetgaitrecognition_pcaa_tpu.config import VARIATION, Config
from opensetgaitrecognition_pcaa_tpu.train.orced import (
    build_orced,
    make_orced_train_step,
)
from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
    VARIANTS,
    build_pcaa,
    make_train_step,
)


# Per-run fields the lockstep design legitimately varies: identity/seeding
# and filesystem paths. EVERYTHING else (LR, loss weights, supervision
# frequency, EPOCHS, dtype/optimizer flags, shapes) is baked into the ONE
# vmapped train step built from cfgs[0], so a grid that varies any of them
# would silently train runs 1..R-1 under run 0's hyperparameters.
_PER_RUN_FIELDS = frozenset({
    "MODEL_NAME",
    "NOTES",
    "SEED",
    "TRAIN_CLASSES",
    "DATA_PATH",
    "GEN_DATA_PATH",
    "MODELS_PATH",
    "FIGURES_PATH",
})


def _assert_lockstep_compatible(cfgs: Sequence[Config]) -> None:
    """Fail fast unless all step-relevant config fields agree across runs."""
    import dataclasses

    base = dataclasses.asdict(cfgs[0])
    for i, c in enumerate(cfgs[1:], start=1):
        d = dataclasses.asdict(c)
        for f, v in base.items():
            if f not in _PER_RUN_FIELDS and d[f] != v:
                raise AssertionError(
                    f"grid cfgs[{i}].{f}={d[f]!r} != cfgs[0].{f}={v!r}: the "
                    "lockstep trainer bakes one train step from cfgs[0], so "
                    "only per-run identity fields "
                    f"({', '.join(sorted(_PER_RUN_FIELDS))}) may differ"
                )


def mesh_chunks(todo, cap: int, n_dev: int):
    """Split a run list into lockstep chunks compatible with a 'data'-axis
    mesh of ``n_dev`` devices: sharding requires the run-axis length to be
    divisible by the axis size, so each cap-sized chunk yields a sharded
    multiple-of-``n_dev`` part plus (if ragged) UNSHARDED tail chunks.

    ``cap`` is the TOTAL run capacity of the whole mesh (callers pass
    ``runs_per_device * n_dev``), so an unsharded tail — which stacks all
    of its runs on ONE device — is further split into pieces of at most
    ``cap // n_dev`` runs; a single n_dev-1-run tail chunk would exceed
    per-device HBM by up to (n_dev-1)/runs_per_device ×.

    → list of ``(chunk, use_mesh)`` pairs. With ``n_dev <= 1`` everything
    is a single-device chunk (use_mesh False) and ``cap`` is already the
    per-device capacity.
    """
    out = []
    per_dev = max(1, cap // max(n_dev, 1))
    for c in range(0, len(todo), cap):
        chunk = list(todo[c : c + cap])
        if n_dev <= 1:
            out.append((chunk, False))
            continue
        m = (len(chunk) // n_dev) * n_dev
        if m:
            out.append((chunk[:m], True))
        tail = chunk[m:]
        for t in range(0, len(tail), per_dev):
            out.append((tail[t : t + per_dev], False))
    return out


def _stack_states(states):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def _unstack_state(states, r: int):
    return jax.tree_util.tree_map(lambda x: x[r], states)


def pad_datasets(
    datasets: Sequence[Tuple[np.ndarray, np.ndarray]],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad per-run (x, y) to a common length by repeating row 0.

    Padding rows are never selected by the per-run permutations, so they are
    inert. Returns ``(x (R, n_max, ...), y (R, n_max), n_real (R,))``.
    """
    n_max = max(x.shape[0] for x, _ in datasets)
    xs, ys, ns = [], [], []
    for x, y in datasets:
        pad = n_max - x.shape[0]
        xs.append(
            np.concatenate([x, np.repeat(x[:1], pad, axis=0)], axis=0)
            if pad
            else x
        )
        ys.append(
            np.concatenate([y, np.repeat(y[:1], pad, axis=0)], axis=0)
            if pad
            else y
        )
        ns.append(x.shape[0])
    return np.stack(xs), np.stack(ys), np.array(ns, dtype=np.int32)


class GridPCAATrainer:
    """Lockstep trainer for R same-shape PCAA runs.

    Usage::

        trainer = GridPCAATrainer(cfgs, VARIATION.V4, train_sets, valid_sets)
        for epoch in range(cfgs[0].EPOCHS):
            metrics = trainer.run_epoch(epoch)   # dict of (R,) arrays
        states = trainer.per_run_states()        # for checkpointing

    ``cfgs`` may differ only in per-run identity fields (TRAIN_CLASSES,
    SEED, MODEL_NAME, paths — see ``_PER_RUN_FIELDS``); every step-relevant
    field (shapes, LR, loss weights, flags) must agree (asserted).
    """

    def __init__(
        self,
        cfgs: Sequence[Config],
        variation: VARIATION,
        train_sets: Sequence[Tuple[np.ndarray, np.ndarray]],
        valid_sets: Optional[Sequence[Tuple[np.ndarray, np.ndarray]]] = None,
        mesh=None,
    ):
        assert len(cfgs) == len(train_sets) >= 1
        _assert_lockstep_compatible(cfgs)
        assert len({c.n_classes for c in cfgs}) == 1, "mismatched n_classes"
        assert not any(c.DEFERRED_DECODER_UPDATE for c in cfgs), (
            "DEFERRED_DECODER_UPDATE is a solo-trainer schedule: the grid "
            "trainer owns its own epoch scan and has no post-scan flush, so "
            "validation would see stale decoder params"
        )

        self.cfgs = list(cfgs)
        self.cfg = cfgs[0]
        self.R = len(cfgs)
        spec = VARIANTS[variation]

        states = []
        for c in cfgs:
            mods, st = build_pcaa(c, spec, jax.random.PRNGKey(c.SEED))
            states.append(st)
        self.mods = mods  # identical module defs across runs
        self.states = _stack_states(states)

        self.x, self.y, self.n_real = pad_datasets(train_sets)
        self.x = jnp.asarray(self.x)
        self.y = jnp.asarray(self.y)
        if valid_sets is not None:
            self.xv, self.yv, self.nv_real = pad_datasets(valid_sets)
            # a valid split smaller than one batch would give vsteps=0 →
            # NaN accuracy → best-payload silently frozen at init weights
            assert int(self.nv_real.min()) >= self.cfg.BATCH_SIZE, (
                f"valid split sizes {self.nv_real.tolist()} must be >= "
                f"BATCH_SIZE={self.cfg.BATCH_SIZE} (drop_last batching)"
            )
            self.xv = jnp.asarray(self.xv)
            self.yv = jnp.asarray(self.yv)
        else:
            self.xv = None

        self._host_rngs = [np.random.default_rng(c.SEED) for c in cfgs]
        self._steps_per_run = self.n_real // self.cfg.BATCH_SIZE
        self._max_steps = int(self._steps_per_run.max())

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = int(mesh.shape["data"])
            assert self.R % n_data == 0, (
                f"{self.R} lockstep runs cannot shard over a {n_data}-device "
                "'data' axis (run count must be divisible by the axis size) "
                "— chunk with parallel.grid.mesh_chunks, which routes ragged "
                "tails to an unsharded trainer"
            )
            run_sh = NamedSharding(mesh, P("data"))
            self.states = jax.tree_util.tree_map(
                lambda l: jax.device_put(l, run_sh), self.states
            )
            self.x = jax.device_put(self.x, run_sh)
            self.y = jax.device_put(self.y, run_sh)
            if self.xv is not None:
                self.xv = jax.device_put(self.xv, run_sh)
                self.yv = jax.device_put(self.yv, run_sh)

        train_step = make_train_step(self.mods, self.cfg)

        def epoch_fn(states, x, y, perms, steps_per_run):
            """perms: (R, max_steps, B); lockstep scan with per-run masking."""

            def body(states, step_and_idx):
                step_idx, idx = step_and_idx  # idx: (R, B)

                def one_run(state, x_r, y_r, idx_r, active):
                    pcs = jnp.take(x_r, idx_r, axis=0)
                    labels = jnp.take(y_r, idx_r, axis=0)
                    new_state, metrics = train_step(state, pcs, labels, step_idx)
                    # runs past their epoch end keep their state unchanged
                    new_state = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(active, new, old),
                        new_state,
                        state,
                    )
                    metrics = jax.tree_util.tree_map(
                        lambda m: jnp.where(active, m, jnp.nan), metrics
                    )
                    return new_state, metrics

                active = step_idx < steps_per_run  # (R,)
                new_states, metrics = jax.vmap(one_run)(
                    states, x, y, idx, active
                )
                return new_states, metrics

            steps = jnp.arange(perms.shape[1])
            perms_t = jnp.swapaxes(perms, 0, 1)  # (max_steps, R, B)
            return jax.lax.scan(body, states, (steps, perms_t))

        self._epoch_fn = jax.jit(epoch_fn, donate_argnums=(0,))

        def valid_fn(states, xv, yv, perms, vsteps_per_run):
            """Per-run drop_last valid loops in lockstep: runs with fewer
            valid batches are masked out for the trailing steps, so every
            run is scored on its OWN full valid split (same masking pattern
            as the train epoch; matches the solo trainer / reference)."""

            def body(carry, step_and_idx):  # idx: (R, B)
                step_idx, idx = step_and_idx

                def one_run(state, x_r, y_r, idx_r, active):
                    pcs = jnp.take(x_r, idx_r, axis=0)
                    labels = jnp.take(y_r, idx_r, axis=0)
                    variables = {
                        "params": state.params_g["encoder"],
                        "batch_stats": state.batch_stats["encoder"],
                    }
                    logits, fv = self.mods.encoder.apply(
                        variables, pcs, train=False
                    )
                    correct = jnp.sum(jnp.argmax(logits, axis=1) == labels)
                    return jnp.where(active, correct.astype(jnp.float32), 0.0)

                active = step_idx < vsteps_per_run  # (R,)
                return carry, jax.vmap(one_run)(states, xv, yv, idx, active)

            steps = jnp.arange(perms.shape[1])
            perms_t = jnp.swapaxes(perms, 0, 1)
            _, corrects = jax.lax.scan(body, None, (steps, perms_t))
            return corrects  # (max_steps, R)

        self._valid_fn = jax.jit(valid_fn)

    def run_epoch(self, epoch: int) -> Dict[str, np.ndarray]:
        """One lockstep epoch; returns per-run metric means (R,) arrays."""
        B = self.cfg.BATCH_SIZE
        perms = np.zeros((self.R, self._max_steps, B), dtype=np.int32)
        for r in range(self.R):
            order = self._host_rngs[r].permutation(int(self.n_real[r]))
            s = int(self._steps_per_run[r])
            perms[r, :s] = order[: s * B].reshape(s, B)
            # inactive trailing steps reuse index 0 (masked out anyway)
        self.states, metrics = self._epoch_fn(
            self.states,
            self.x,
            self.y,
            jnp.asarray(perms),
            jnp.asarray(self._steps_per_run),
        )
        metrics = jax.device_get(metrics)  # each (max_steps, R)
        out: Dict[str, np.ndarray] = {}
        # CE/total means run over SUPERVISED lockstep steps only, matching
        # the solo trainer and the reference's sup_losses/tot_sup_losses
        # lists (PCAA_ablation.py:1005-1013; same mask for every run —
        # SUPERVISION_FREQUENCY equality is asserted at construction).
        sup_every = self.cfg.SUPERVISION_FREQUENCY
        for k, v in metrics.items():
            if k == "n_correct":
                tot = np.nansum(v, axis=0)
                out["train_accuracy"] = tot / (self._steps_per_run * B)
            elif k in ("sup_loss", "tot_loss"):
                out[k] = np.nanmean(v[::sup_every], axis=0)
            else:
                out[k] = np.nanmean(v, axis=0)
        return out

    def valid_accuracy(self) -> np.ndarray:
        """Per-run validation accuracy (R,): each run scored on its own full
        valid split with drop_last batching (per-run step counts, masked)."""
        assert self.xv is not None
        B = self.cfg.BATCH_SIZE
        vsteps = self.nv_real // B  # (R,) per-run drop_last step counts
        max_steps = int(vsteps.max())
        perms = np.zeros((self.R, max_steps, B), dtype=np.int32)
        for r in range(self.R):
            s = int(vsteps[r])
            perms[r, :s] = np.arange(s * B, dtype=np.int32).reshape(s, B)
        corrects = jax.device_get(
            self._valid_fn(
                self.states,
                self.xv,
                self.yv,
                jnp.asarray(perms),
                jnp.asarray(vsteps),
            )
        )
        return corrects.sum(axis=0) / (vsteps * B)

    def per_run_states(self) -> List:
        """Unstack to per-run PCAAState pytrees (host) for checkpointing."""
        states = jax.device_get(self.states)
        return [_unstack_state(states, r) for r in range(self.R)]

    # --- per-run best-by-validation tracking (device-side) -----------------
    def _ckpt_payload_stacked(self):
        return {
            "params_g": self.states.params_g,
            "params_d": self.states.params_d,
            "ml_params": self.states.ml_params,
            "batch_stats": self.states.batch_stats,
        }

    def note_validation(self, valid_accs: np.ndarray) -> np.ndarray:
        """Track each run's best-by-validation checkpoint payload on device
        (mirrors the reference's best-accuracy checkpointing without any
        host fetch until :meth:`best_run_payloads`). Returns the improved
        mask."""
        if not hasattr(self, "_best_accs"):
            self._best_accs = np.full(self.R, -np.inf)
            self._best_payload = jax.tree_util.tree_map(
                jnp.copy, self._ckpt_payload_stacked()
            )
        improved = valid_accs > self._best_accs
        self._best_accs = np.maximum(self._best_accs, valid_accs)
        if improved.any():
            mask = jnp.asarray(improved)

            def pick(new, old):
                m = mask.reshape((self.R,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            self._best_payload = jax.tree_util.tree_map(
                pick, self._ckpt_payload_stacked(), self._best_payload
            )
        return improved

    def best_run_payloads(self) -> List[dict]:
        """→ per-run checkpoint payload dicts (single host fetch)."""
        payload = jax.device_get(
            getattr(self, "_best_payload", None) or self._ckpt_payload_stacked()
        )
        return [
            jax.tree_util.tree_map(lambda x: x[r], payload) for r in range(self.R)
        ]


class GridORCEDTrainer:
    """Lockstep trainer for R same-shape OR-CED runs (reference grid:
    ``train_ORCED.py:283-329``, sequential). Same machinery as
    :class:`GridPCAATrainer` — per-run schedules with masking, run axis
    shardable over the mesh — plus the per-epoch KL annealing scalar."""

    def __init__(
        self,
        cfgs: Sequence[Config],
        train_sets: Sequence[Tuple[np.ndarray, np.ndarray]],
        valid_sets: Optional[Sequence[Tuple[np.ndarray, np.ndarray]]] = None,
        mesh=None,
    ):
        assert len(cfgs) == len(train_sets) >= 1
        # Same construction-time contract as GridPCAATrainer: a mismatched
        # NMAX/BATCH_SIZE pair would otherwise fail deep inside the vmapped
        # step with an opaque broadcast error, and a mismatched
        # LR/EPOCHS/loss weight would silently train under cfgs[0]'s values.
        _assert_lockstep_compatible(cfgs)
        assert len({c.n_classes for c in cfgs}) == 1, "mismatched n_classes"
        self.cfgs = list(cfgs)
        self.cfg = cfgs[0]
        self.R = len(cfgs)

        states = []
        for c in cfgs:
            models, st = build_orced(c, jax.random.PRNGKey(c.SEED))
            states.append(st)
        self.models = models
        self.states = _stack_states(states)

        self.x, self.y, self.n_real = pad_datasets(train_sets)
        self.x = jnp.asarray(self.x)
        self.y = jnp.asarray(self.y)
        if valid_sets is not None:
            self.xv, self.yv, self.nv_real = pad_datasets(valid_sets)
            # a valid split smaller than one batch would give vsteps=0 →
            # NaN accuracy → best-payload silently frozen at init weights
            assert int(self.nv_real.min()) >= self.cfg.BATCH_SIZE, (
                f"valid split sizes {self.nv_real.tolist()} must be >= "
                f"BATCH_SIZE={self.cfg.BATCH_SIZE} (drop_last batching)"
            )
            self.xv = jnp.asarray(self.xv)
            self.yv = jnp.asarray(self.yv)
        else:
            self.xv = None
        self._host_rngs = [np.random.default_rng(c.SEED) for c in cfgs]
        self._steps_per_run = self.n_real // self.cfg.BATCH_SIZE
        self._max_steps = int(self._steps_per_run.max())

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = int(mesh.shape["data"])
            assert self.R % n_data == 0, (
                f"{self.R} lockstep runs cannot shard over a {n_data}-device "
                "'data' axis (run count must be divisible by the axis size) "
                "— chunk with parallel.grid.mesh_chunks, which routes ragged "
                "tails to an unsharded trainer"
            )
            run_sh = NamedSharding(mesh, P("data"))
            self.states = jax.tree_util.tree_map(
                lambda l: jax.device_put(l, run_sh), self.states
            )
            self.x = jax.device_put(self.x, run_sh)
            self.y = jax.device_put(self.y, run_sh)
            if self.xv is not None:
                self.xv = jax.device_put(self.xv, run_sh)
                self.yv = jax.device_put(self.yv, run_sh)

        train_step = make_orced_train_step(self.models, self.cfg)

        def epoch_fn(states, x, y, perms, steps_per_run, kl_mult):
            def body(states, step_and_idx):
                step_idx, idx = step_and_idx

                def one_run(state, x_r, y_r, idx_r, active):
                    pcs = jnp.take(x_r, idx_r, axis=0)
                    labels = jnp.take(y_r, idx_r, axis=0)
                    new_state, metrics = train_step(
                        state, pcs, labels, step_idx, kl_mult
                    )
                    new_state = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(active, new, old),
                        new_state,
                        state,
                    )
                    metrics = jax.tree_util.tree_map(
                        lambda m: jnp.where(active, m, jnp.nan), metrics
                    )
                    return new_state, metrics

                active = step_idx < steps_per_run
                return jax.vmap(one_run)(states, x, y, idx, active)

            steps = jnp.arange(perms.shape[1])
            perms_t = jnp.swapaxes(perms, 0, 1)
            return jax.lax.scan(body, states, (steps, perms_t))

        self._epoch_fn = jax.jit(epoch_fn, donate_argnums=(0,))

        encoder = self.models[0]

        def valid_fn(states, xv, yv, perms, vsteps_per_run, epoch_keys):
            """Per-run drop_last valid accuracy, lockstep + masking.

            ``epoch_keys``: (R, 2) uint32 — per-run ``fold_in(PRNGKey(SEED),
            epoch)`` keys, so the eval-mode reparam noise stream is
            bit-identical to the solo trainer's ``valid_epoch``."""

            def body(carry, step_and_idx):
                step_idx, idx = step_and_idx  # idx: (R, B)

                def one_run(state, x_r, y_r, idx_r, active, key_r):
                    pcs = jnp.take(x_r, idx_r, axis=0)
                    labels = jnp.take(y_r, idx_r, axis=0)
                    logits, z, mu, logvar = encoder.apply(
                        {
                            "params": state.params["encoder"],
                            "batch_stats": state.batch_stats["encoder"],
                        },
                        pcs,
                        train=False,
                        rngs={"reparam": jax.random.fold_in(key_r, step_idx)},
                    )
                    correct = jnp.sum(jnp.argmax(logits, axis=1) == labels)
                    return jnp.where(active, correct.astype(jnp.float32), 0.0)

                active = step_idx < vsteps_per_run
                return carry, jax.vmap(one_run)(
                    states, xv, yv, idx, active, epoch_keys
                )

            steps = jnp.arange(perms.shape[1])
            perms_t = jnp.swapaxes(perms, 0, 1)
            _, corrects = jax.lax.scan(body, None, (steps, perms_t))
            return corrects  # (max_steps, R)

        self._valid_fn = jax.jit(valid_fn)

    def valid_accuracy(self, epoch: int) -> np.ndarray:
        """Per-run valid accuracy (R,), each run on its own full valid split
        (drop_last), with the solo trainer's per-epoch reparam key stream."""
        assert self.xv is not None
        B = self.cfg.BATCH_SIZE
        vsteps = self.nv_real // B
        max_steps = int(vsteps.max())
        perms = np.zeros((self.R, max_steps, B), dtype=np.int32)
        for r in range(self.R):
            s = int(vsteps[r])
            perms[r, :s] = np.arange(s * B, dtype=np.int32).reshape(s, B)
        epoch_keys = jnp.stack(
            [
                jax.random.fold_in(jax.random.PRNGKey(c.SEED), epoch)
                for c in self.cfgs
            ]
        )
        corrects = jax.device_get(
            self._valid_fn(
                self.states,
                self.xv,
                self.yv,
                jnp.asarray(perms),
                jnp.asarray(vsteps),
                epoch_keys,
            )
        )
        return corrects.sum(axis=0) / (vsteps * B)

    # --- per-run best-by-validation tracking (same machinery as PCAA) ------
    def _ckpt_payload_stacked(self):
        return {
            "params": self.states.params,
            "batch_stats": self.states.batch_stats,
        }

    def note_validation(self, valid_accs: np.ndarray) -> np.ndarray:
        """Track each run's best-by-validation payload on device; returns
        the improved mask (reference ``train_ORCED.py:255-276``)."""
        if not hasattr(self, "_best_accs"):
            self._best_accs = np.full(self.R, -np.inf)
            self._best_payload = jax.tree_util.tree_map(
                jnp.copy, self._ckpt_payload_stacked()
            )
        improved = valid_accs > self._best_accs
        self._best_accs = np.maximum(self._best_accs, valid_accs)
        if improved.any():
            mask = jnp.asarray(improved)

            def pick(new, old):
                m = mask.reshape((self.R,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            self._best_payload = jax.tree_util.tree_map(
                pick, self._ckpt_payload_stacked(), self._best_payload
            )
        return improved

    def best_run_payloads(self) -> List[dict]:
        """→ per-run ``{"params", "batch_stats"}`` dicts (single host fetch)."""
        payload = jax.device_get(
            getattr(self, "_best_payload", None) or self._ckpt_payload_stacked()
        )
        return [
            jax.tree_util.tree_map(lambda x: x[r], payload) for r in range(self.R)
        ]

    def run_epoch(self, epoch: int) -> Dict[str, np.ndarray]:
        B = self.cfg.BATCH_SIZE
        perms = np.zeros((self.R, self._max_steps, B), dtype=np.int32)
        for r in range(self.R):
            order = self._host_rngs[r].permutation(int(self.n_real[r]))
            s = int(self._steps_per_run[r])
            perms[r, :s] = order[: s * B].reshape(s, B)
        kl_mult = jnp.float32(epoch / self.cfg.EPOCHS)  # train_ORCED.py:122
        self.states, metrics = self._epoch_fn(
            self.states,
            self.x,
            self.y,
            jnp.asarray(perms),
            jnp.asarray(self._steps_per_run),
            kl_mult,
        )
        metrics = jax.device_get(metrics)
        out: Dict[str, np.ndarray] = {}
        for k, v in metrics.items():
            if k == "n_correct":
                out["train_accuracy"] = np.nansum(v, axis=0) / (
                    self._steps_per_run * B
                )
            else:
                out[k] = np.nanmean(v, axis=0)
        return out

    def per_run_states(self) -> List:
        states = jax.device_get(self.states)
        return [_unstack_state(states, r) for r in range(self.R)]
