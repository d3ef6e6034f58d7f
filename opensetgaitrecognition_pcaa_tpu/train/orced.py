"""OR-CED baseline training (VAE + metric learning).

Behavioral oracle: reference ``train_ORCED`` (``train_ORCED.py:21-329``).
One Adam over encoder + decoder + mean learner; per-batch loss

    REC_W·Chamfer + CE_W·CE + TRIPLET_W·Triplet(MS-mined, L2-normalized z)
    + KL_W·CG-KL·(epoch/EPOCHS)

with the KL weight annealed linearly by epoch (``train_ORCED.py:122``).

Preserved quirk: the reference passes ``betas=(B1, B1)`` — i.e. Adam's
second moment decay is 0.9, not B2=0.99 (``train_ORCED.py:93-98``).

Same TPU structure as the PCAA trainer: whole-epoch jitted ``lax.scan``,
on-device dataset, one host sync per epoch.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from opensetgaitrecognition_pcaa_tpu.config import SPLIT, Config
from opensetgaitrecognition_pcaa_tpu.data.dataset import (
    RadarCropDataset,
    epoch_batch_indices,
)
from opensetgaitrecognition_pcaa_tpu.models import (
    GaussianMeanLearner,
    ORCEDDecoder,
    ORCEDEncoder,
)
from opensetgaitrecognition_pcaa_tpu.ops import (
    cg_kl_divergence,
    cross_entropy,
    seq_chamfer,
    triplet_loss_with_ms_miner,
)
from opensetgaitrecognition_pcaa_tpu.train.metrics import MetricLogger
from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
    load_best_payload,
    load_train_state,
    mark_run_completed,
    module_path,
    save_best_payload,
    save_params,
    save_train_state,
)


class ORCEDState(struct.PyTreeNode):
    params: Any  # {"encoder", "decoder", "mean_learner"}
    batch_stats: Any  # {"encoder", "mean_learner"}
    opt: Any
    key: jax.Array
    # bf16 copies of the decoder's 2-D kernels (Config.BF16_WEIGHT_CACHE):
    # same HBM-traffic optimization as the PCAA trainer — see
    # train/pcaa.py::_cache_tree. Empty dict when the flag is off.
    cast: Any = struct.field(default_factory=dict)


def build_orced(cfg: Config, key: jax.Array):
    n = cfg.n_classes
    dtype = jnp.bfloat16 if cfg.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    encoder = ORCEDEncoder(
        n_out_labels=n,
        sup_latent_dim=cfg.SUP_LATENT_DIM,
        pointnet_out_dim=cfg.POINTNET_OUT_DIM,
        dtc_filters=tuple(cfg.DTC_FILTERS),
        dtype=dtype,
    )
    decoder = ORCEDDecoder(
        nsteps=cfg.NSTEPS,
        nmax_points=cfg.NMAX,
        nfeatures=cfg.NFEATURES,
        dtype=dtype,
    )
    mean_learner = GaussianMeanLearner(cfg.SUP_LATENT_DIM)

    keys = jax.random.split(key, 4)
    x0 = jnp.zeros((2, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES), jnp.float32)
    oh0 = jnp.zeros((2, n), jnp.float32)
    enc_vars = encoder.init(
        {"params": keys[0], "reparam": keys[0]}, x0, train=False
    )
    dec_vars = decoder.init(
        keys[1], jnp.zeros((2, cfg.SUP_LATENT_DIM), jnp.float32)
    )
    ml_vars = mean_learner.init(keys[2], oh0, train=False)

    params = {
        "encoder": enc_vars["params"],
        "decoder": dec_vars["params"],
        "mean_learner": ml_vars["params"],
    }
    batch_stats = {
        "encoder": enc_vars["batch_stats"],
        "mean_learner": ml_vars["batch_stats"],
    }
    # Reference quirk: betas=(B1, B1) — see module docstring.
    # Optimizer fast paths mirror the PCAA trainer (decoder-dominated
    # optimizer traffic is the same bottleneck here). FUSED_ADAM is a
    # PCAA-only kernel (and measured slower there) — reject it loudly
    # instead of silently training with the plain optimizer.
    assert not cfg.FUSED_ADAM, (
        "Config.FUSED_ADAM is PCAA-only (ops/pallas/adam_kernel.py is wired "
        "into build_pcaa, and was measured slower even there); unset it for "
        "ORCED runs."
    )
    assert not cfg.DEFERRED_DECODER_UPDATE, (
        "Config.DEFERRED_DECODER_UPDATE is PCAA-only (the deferred Adam "
        "write lives in train/pcaa.py's scan body, and was measured slower "
        "even there); unset it for ORCED runs."
    )
    mu_dtype = jnp.bfloat16 if cfg.COMPUTE_DTYPE == "bfloat16" else None
    if cfg.FACTORED_ADAM_NU:
        from opensetgaitrecognition_pcaa_tpu.train.optim import adam_factored

        tx = adam_factored(cfg.LR, b1=cfg.B1, b2=cfg.B1, mu_dtype=mu_dtype)
    elif cfg.BF16_ADAM_NU:
        from opensetgaitrecognition_pcaa_tpu.train.optim import adam_lowmem

        tx = adam_lowmem(
            cfg.LR, b1=cfg.B1, b2=cfg.B1,
            mu_dtype=mu_dtype, nu_dtype=jnp.bfloat16,
        )
    else:
        # f32 moments under f32 compute (parity default). Under bf16
        # compute, first moments are stored bf16 like build_pcaa's
        # equivalent branch (the validated +8% path there; ORCED's own
        # 10-epoch 5-seed paired gate cleared the bf16 tiers: +0.4pp mean
        # valid acc; tools/gate_optimizer_quality.py --model orced): bf16
        # compute 780 w/s, + BF16_ADAM_NU 930 w/s vs 658 f32 — opt in.
        tx = optax.adam(cfg.LR, b1=cfg.B1, b2=cfg.B1, mu_dtype=mu_dtype)
    cast: Any = {}
    if cfg.BF16_WEIGHT_CACHE:
        from opensetgaitrecognition_pcaa_tpu.train.pcaa import _cache_tree

        assert cfg.COMPUTE_DTYPE == "bfloat16", (
            "BF16_WEIGHT_CACHE requires bf16 compute (see config.py)"
        )
        cast = {"decoder": _cache_tree(params["decoder"])}

    state = ORCEDState(
        params=params,
        batch_stats=batch_stats,
        opt=tx.init(params),
        key=keys[3],
        cast=cast,
    )
    return (encoder, decoder, mean_learner, tx), state


def make_orced_train_step(models, cfg: Config):
    """Single jittable ORCED train step (exposed for the grid trainer)."""
    encoder, decoder, mean_learner, tx = models
    n = cfg.n_classes

    def train_step(state: ORCEDState, pcs, labels, step_idx, kl_mult, eps=None):
        # Carried key advances each step → fresh VAE reparam noise every
        # batch of every epoch (the reference draws unseeded torch noise).
        # ``eps`` (trace-time optional, ``(B, latent)``) replays a recorded
        # draw instead — the CRN twin path (tools/parity_twin_orced.py).
        new_key, key = jax.random.split(state.key)
        oh = jax.nn.one_hot(labels, n, dtype=jnp.float32)

        loss_params = state.params
        if cfg.BF16_WEIGHT_CACHE:
            from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
                _merge_cached,
            )

            # Differentiate wrt the carried bf16 decoder kernels — values
            # and gradients are bit-identical to casting the f32 masters at
            # read (train/pcaa.py::_cache_tree), at half the decoder fwd+bwd
            # HBM bytes.
            loss_params = {
                **state.params,
                "decoder": _merge_cached(
                    state.params["decoder"], state.cast["decoder"]
                ),
            }

        def loss_fn(params):
            (logits, z, mu, logvar), enc_muts = encoder.apply(
                {
                    "params": params["encoder"],
                    "batch_stats": state.batch_stats["encoder"],
                },
                pcs,
                train=True,
                eps=eps,
                rngs={"reparam": key},
                mutable=["batch_stats"],
            )
            rec = decoder.apply({"params": params["decoder"]}, z)
            mu_gts, ml_muts = mean_learner.apply(
                {
                    "params": params["mean_learner"],
                    "batch_stats": state.batch_stats["mean_learner"],
                },
                oh,
                train=True,
                mutable=["batch_stats"],
            )

            rec_loss = cfg.REC_W * seq_chamfer(rec, pcs)
            sup_loss = cfg.CE_W * cross_entropy(logits, labels)
            z_norm = z / jnp.linalg.norm(z, axis=1, keepdims=True)
            trip_loss = cfg.TRIPLET_W * triplet_loss_with_ms_miner(
                z_norm, labels, margin=cfg.TRIPLET_MARGIN
            )
            kl_loss = cfg.KL_W * cg_kl_divergence(mu, logvar, mu_gts) * kl_mult
            tot = rec_loss + sup_loss + trip_loss + kl_loss
            aux = (
                rec_loss,
                sup_loss,
                trip_loss,
                kl_loss,
                logits,
                {
                    "encoder": enc_muts["batch_stats"],
                    "mean_learner": ml_muts["batch_stats"],
                },
            )
            return tot, aux

        (tot, (rec, sup, trip, kl, logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(loss_params)
        if cfg.BF16_WEIGHT_CACHE:
            grads = {
                **grads,
                "decoder": jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32)
                    if g.dtype == jnp.bfloat16
                    else g,
                    grads["decoder"],
                ),
            }
        updates, new_opt = tx.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, updates)
        preds = jnp.argmax(logits, axis=1)
        metrics = {
            "rec_loss": rec,
            "sup_loss": sup,
            "trip_loss": trip,
            "kl_loss": kl,
            "tot_loss": tot,
            "n_correct": jnp.sum(preds == labels).astype(jnp.float32),
        }
        if cfg.BF16_WEIGHT_CACHE:
            from opensetgaitrecognition_pcaa_tpu.train.pcaa import _cache_tree

            new_cast = {"decoder": _cache_tree(new_params["decoder"])}
        else:
            new_cast = state.cast
        return (
            state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt=new_opt,
                key=new_key,
                cast=new_cast,
            ),
            metrics,
        )

    return train_step


def make_orced_epoch_fns(models, cfg: Config, mesh=None):
    """→ (train_epoch, valid_epoch), both jitted whole-epoch scans.

    With ``mesh`` (a ``(data, model)`` ``jax.sharding.Mesh``), each gathered
    batch is sharding-constrained onto the ``data`` axis — GSPMD splits the
    forward/backward across chips and inserts the gradient ``psum`` over ICI
    (same data-parallel recipe as the PCAA trainer's ``make_epoch_fns``;
    the reference trainer ``train_ORCED.py:21-329`` is single-device)."""
    encoder, decoder, mean_learner, tx = models
    train_step = make_orced_train_step(models, cfg)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))

        def shard_batch(t):
            return jax.lax.with_sharding_constraint(t, batch_sh)
    else:

        def shard_batch(t):
            return t

    def train_epoch(state, x_all, y_all, perm, kl_mult, noise=None):
        """``noise`` (trace-time optional): ``(eps,)`` with ``eps`` of shape
        ``(steps, B, latent)`` — the recorded reference reparam draws for
        the CRN replay (mirrors ``train/pcaa.py``'s noise path)."""

        def body(state, xs):
            if noise is None:
                step_idx, idx = xs
                eps = None
            else:
                step_idx, idx, eps = xs
            return train_step(
                state,
                shard_batch(jnp.take(x_all, idx, axis=0)),
                shard_batch(jnp.take(y_all, idx, axis=0)),
                step_idx,
                kl_mult,
                eps=eps,
            )

        steps = jnp.arange(perm.shape[0])
        xs = (steps, perm) if noise is None else (steps, perm) + tuple(noise)
        return jax.lax.scan(body, state, xs)

    def valid_epoch(state, x_all, y_all, perm, key, noise=None):
        def body(carry, xs):
            if noise is None:
                step_idx, idx = xs
                eps = None
            else:
                step_idx, idx, eps = xs
            pcs = shard_batch(jnp.take(x_all, idx, axis=0))
            labels = shard_batch(jnp.take(y_all, idx, axis=0))
            # eval mode still samples the reparam noise (models/orced.py).
            logits, z, mu, logvar = encoder.apply(
                {
                    "params": state.params["encoder"],
                    "batch_stats": state.batch_stats["encoder"],
                },
                pcs,
                train=False,
                eps=eps,
                rngs={"reparam": jax.random.fold_in(key, step_idx)},
            )
            rec = decoder.apply({"params": state.params["decoder"]}, z)
            rec_loss = cfg.REC_W * seq_chamfer(rec, pcs)
            ce = cfg.CE_W * cross_entropy(logits, labels)
            correct = jnp.sum(jnp.argmax(logits, axis=1) == labels).astype(
                jnp.float32
            )
            return carry, {"rec_loss": rec_loss, "ce_loss": ce, "n_correct": correct}

        steps = jnp.arange(perm.shape[0])
        xs = (steps, perm) if noise is None else (steps, perm) + tuple(noise)
        _, metrics = jax.lax.scan(body, None, xs)
        return metrics

    return (
        jax.jit(train_epoch, donate_argnums=(0,)),
        jax.jit(valid_epoch),
    )


def write_orced_checkpoint(run_dir: str, name: str, payload) -> None:
    """Write the reference's E/G/ML module checkpoints
    (``train_ORCED.py:255-276`` semantics) from a
    ``{"params", "batch_stats"}`` payload."""
    save_params(
        {
            "params": payload["params"]["encoder"],
            "batch_stats": payload["batch_stats"]["encoder"],
        },
        module_path(run_dir, name, "E"),
    )
    save_params(
        {"params": payload["params"]["decoder"]}, module_path(run_dir, name, "G")
    )
    save_params(
        {
            "params": payload["params"]["mean_learner"],
            "batch_stats": payload["batch_stats"]["mean_learner"],
        },
        module_path(run_dir, name, "ML"),
    )


def train_orced(
    cfg: Config,
    *,
    wandb_mode: str = "disabled",
    datasets: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = None,
    verbose: bool = True,
    resume: bool = True,
) -> Dict[str, float]:
    """Train one OR-CED run; writes run folder (E/G/ML) and returns metrics.

    ``resume=True`` continues from a full-state ``train_state.msgpack`` if
    present (beyond-reference capability; SURVEY.md §5)."""
    run_dir = cfg.run_dir()
    os.makedirs(run_dir, exist_ok=True)
    cfg.save(os.path.join(run_dir, "config.json"))
    name = cfg.MODEL_NAME

    if datasets is None:
        ds_train = RadarCropDataset(
            SPLIT.TRAIN,
            cfg.GEN_DATA_PATH,
            scenarios=cfg.scenarios,
            subsample_factor=cfg.SUBSAMPLE_FACTOR,
        )
        ds_valid = RadarCropDataset(
            SPLIT.VALID,
            cfg.GEN_DATA_PATH,
            scenarios=cfg.scenarios,
            subsample_factor=cfg.SUBSAMPLE_FACTOR,
        )
        x_train, y_train = ds_train.load_all()
        x_valid, y_valid = ds_valid.load_all()
    else:
        x_train, y_train, x_valid, y_valid = datasets

    x_train, y_train = jnp.asarray(x_train), jnp.asarray(y_train)
    x_valid, y_valid = jnp.asarray(x_valid), jnp.asarray(y_valid)

    key = jax.random.PRNGKey(cfg.SEED)
    models, state = build_orced(cfg, key)

    mesh = None
    if cfg.DP_DEVICES * cfg.MP_DEVICES > 1:
        from opensetgaitrecognition_pcaa_tpu.parallel.mesh import create_mesh

        assert cfg.BATCH_SIZE % cfg.DP_DEVICES == 0, (
            cfg.BATCH_SIZE,
            cfg.DP_DEVICES,
        )
        mesh = create_mesh(
            cfg.DP_DEVICES * cfg.MP_DEVICES, model_parallel=cfg.MP_DEVICES
        )

    train_epoch, valid_epoch = make_orced_epoch_fns(models, cfg, mesh=mesh)
    logger = MetricLogger(run_dir, cfg.to_dict(), mode=wandb_mode)
    host_rng = np.random.default_rng(cfg.SEED)

    n_train = x_train.shape[0]
    steps = n_train // cfg.BATCH_SIZE
    valid_steps = x_valid.shape[0] // cfg.BATCH_SIZE
    valid_perm = jnp.asarray(
        epoch_batch_indices(
            x_valid.shape[0], cfg.BATCH_SIZE, shuffle=False
        ).astype(np.int32)
    )

    def snapshot():
        # device-side copy; single host fetch at run end (tunnel bandwidth)
        return jax.tree_util.tree_map(
            jnp.copy, {"params": state.params, "batch_stats": state.batch_stats}
        )

    def write_checkpoint(payload):
        write_orced_checkpoint(run_dir, name, payload)

    best_valid_acc = 0.0
    best_payload = None
    start_epoch = 0
    ckpt_path = os.path.join(run_dir, "train_state.msgpack")
    if resume:
        restored = load_train_state(state, ckpt_path)
        if restored is not None:
            state, start_epoch, meta = restored
            host_rng.bit_generator.state = meta["host_rng_state"]
            best_valid_acc = meta.get("best_valid_acc", 0.0)
            best_payload = load_best_payload(
                {"params": state.params, "batch_stats": state.batch_stats},
                ckpt_path,
            )
            if verbose:
                print(f"[{name}] resuming from epoch {start_epoch}")

    if mesh is not None and cfg.MP_DEVICES > 1:
        # Tensor parallelism: place params + Adam moments with the
        # output-axis rule (parallel/mesh.py), after any resume restore.
        from opensetgaitrecognition_pcaa_tpu.parallel.mesh import shard_state

        state = shard_state(state, mesh, min_dim=cfg.MP_MIN_DIM)

    t_start = time.time()
    total_windows = 0
    out: Dict[str, float] = {}

    for epoch in range(start_epoch, cfg.EPOCHS):
        kl_mult = jnp.float32(epoch / cfg.EPOCHS)  # train_ORCED.py:122
        perm = jnp.asarray(
            epoch_batch_indices(
                n_train, cfg.BATCH_SIZE, shuffle=True, rng=host_rng
            ).astype(np.int32)
        )
        state, m = train_epoch(state, x_train, y_train, perm, kl_mult)
        vm = valid_epoch(
            state, x_valid, y_valid, valid_perm, jax.random.fold_in(key, epoch)
        )
        m, vm = jax.device_get((m, vm))
        total_windows += steps * cfg.BATCH_SIZE

        train_acc = float(np.sum(m["n_correct"]) / (steps * cfg.BATCH_SIZE))
        valid_acc = float(np.sum(vm["n_correct"]) / (valid_steps * cfg.BATCH_SIZE))
        epoch_metrics = {
            "Reconstruction Loss Train": float(np.mean(m["rec_loss"])),
            "Reconstruction Loss Valid": float(np.mean(vm["rec_loss"])),
            "Cross Entropy Loss Train": float(np.mean(m["sup_loss"])),
            "Cross Entropy Loss Valid": float(np.mean(vm["ce_loss"])),
            "Triplet Loss": float(np.mean(m["trip_loss"])),
            "KL Loss": float(np.mean(m["kl_loss"])),
            "Total Loss Train": float(np.mean(m["tot_loss"])),
            "Train Accuracy": train_acc,
            "Valid Accuracy": valid_acc,
        }
        logger.log(epoch_metrics, step=epoch)
        if verbose:
            print(
                f"[{name}] epoch {epoch + 1}/{cfg.EPOCHS} "
                f"rec={epoch_metrics['Reconstruction Loss Train']:.4f} "
                f"kl={epoch_metrics['KL Loss']:.4f} "
                f"trip={epoch_metrics['Triplet Loss']:.4f} "
                f"acc={train_acc:.3f} vacc={valid_acc:.3f}"
            )

        if epoch % cfg.CHECKPOINT_FREQUENCY == 0:
            improved = valid_acc > best_valid_acc
            if improved:
                best_valid_acc = valid_acc
                best_payload = snapshot()
            if cfg.SAVE_RESUME_STATE:
                save_train_state(
                    state,
                    epoch,
                    host_rng.bit_generator.state,
                    ckpt_path,
                    extra={"best_valid_acc": best_valid_acc},
                )
                if improved:
                    save_best_payload(best_payload, ckpt_path)
        out = dict(epoch_metrics)

    elapsed = time.time() - t_start
    out["windows_per_sec"] = total_windows / max(elapsed, 1e-9)
    out["best_valid_accuracy"] = best_valid_acc
    logger.finish()
    write_checkpoint(
        best_payload
        if best_payload is not None
        else {"params": state.params, "batch_stats": state.batch_stats}
    )
    mark_run_completed(run_dir, out)
    return out
