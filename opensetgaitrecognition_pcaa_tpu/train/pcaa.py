"""PCAA adversarial training: one parameterized trainer for all 4 variants.

The reference implements four near-identical 350-line loops
(``train_AAE.py:25-364`` = variant 2/BASE, ``PCAA_ablation.py:28-378`` = V1,
``:392-743`` = V3, ``:746-1122`` = V4). Their differences are pure
configuration — projection heads on/off, decoder on/off, learned vs fixed
centroids — so here they collapse into one ``VariantSpec``-driven trainer
(SURVEY.md §7.1 step 5).

TPU design:
- the **entire epoch** is one jitted ``lax.scan`` over batches; the split
  lives on device for the whole run, batches are gathers by index. The
  reference syncs host↔device every batch for ``.item()`` logging
  (``PCAA_ablation.py:891-895,974``) — here the only per-epoch host sync is
  fetching the stacked epoch metrics;
- the WGAN-GP double-backward is ``jax.grad`` composed inside the outer
  discriminator-loss ``jax.grad`` (native in XLA; SURVEY.md §7.3);
- both Adam updates + BatchNorm running-stat updates happen inside the same
  jitted step; state is donated, so no reallocation churn.

Semantics parity notes (vs the reference training step, V4 path
``PCAA_ablation.py:867-1030``):
- the encoder forward runs once per batch; the D-step sees its latents
  detached (``stop_gradient``), the G-step differentiates through a
  recomputation with identical inputs/params/BN-batch statistics;
- the G-step's critic uses the *post-update* discriminator parameters
  (torch updates D in-place before computing ``synth_logits``);
- GP interpolation coefficients are per-sample uniforms broadcast across the
  latent dim (``PCAA_ablation.py:945-949``);
- V1's mean learner is **frozen at init** — ``Variable(z0 + mus)`` in the
  reference detaches it from every loss (verified against torch; see
  ``models/mean_learner.py``) — only its BatchNorm running stats update;
- the prior sample ``z = z0 + mu_class`` is fully detached (same reason);
- supervision (CE) joins the generator loss every
  ``SUPERVISION_FREQUENCY``-th batch (``PCAA_ablation.py:1005-1013``).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from opensetgaitrecognition_pcaa_tpu.config import SPLIT, VARIATION, Config
from opensetgaitrecognition_pcaa_tpu.data.dataset import (
    RadarCropDataset,
    epoch_batch_indices,
)
from opensetgaitrecognition_pcaa_tpu.models import (
    CGDecoder,
    CGDiscriminator,
    CGEncoder,
    GaussianMeanLearner,
    ProjectionHead,
)
from opensetgaitrecognition_pcaa_tpu.ops import (
    cross_entropy,
    gradient_penalty,
    sample_distant_points,
    seq_chamfer,
)
from opensetgaitrecognition_pcaa_tpu.train.metrics import MetricLogger
from opensetgaitrecognition_pcaa_tpu.train.run_folder import (
    load_best_payload,
    load_train_state,
    mark_run_completed,
    module_path,
    save_array,
    save_best_payload,
    save_params,
    save_train_state,
)


@dataclasses.dataclass(frozen=True)
class VariantSpec:
    """Which optional pieces a PCAA ablation variant uses."""

    name: str
    use_enc_head: bool
    use_decoder: bool
    use_dec_head: bool
    learned_centroids: bool
    use_disc_head: bool = False


VARIANTS: Dict[VARIATION, VariantSpec] = {
    VARIATION.V1: VariantSpec("V1", True, True, True, True),
    VARIATION.V2: VariantSpec("V2", False, True, False, False),
    VARIATION.BASE: VariantSpec("BASE", False, True, False, False),
    VARIATION.V3: VariantSpec("V3", False, False, False, False),
    VARIATION.V4: VariantSpec("V4", True, True, True, False),
}


class PCAAState(struct.PyTreeNode):
    params_g: Any
    params_d: Any
    ml_params: Any  # frozen mean-learner params (V1) or empty dict
    batch_stats: Any
    opt_g: Any
    opt_d: Any
    centroids: jnp.ndarray  # (n_classes, latent); fixed prior means
    key: jax.Array
    # bf16 copies of the decoder-side params_g entries (BF16_WEIGHT_CACHE):
    # refreshed inside each step's Adam write so the next G forward/backward
    # reads half the bytes. Empty dict when the flag is off.
    cast_g: Any = struct.field(default_factory=dict)


@dataclasses.dataclass
class PCAAModules:
    encoder: CGEncoder
    discriminator: CGDiscriminator
    decoder: Optional[CGDecoder]
    dec_head: Optional[ProjectionHead]
    disc_head: Optional[ProjectionHead]
    mean_learner: Optional[GaussianMeanLearner]
    spec: VariantSpec
    tx_g: Any = None
    tx_d: Any = None


def _cache_tree(params):
    """BF16_WEIGHT_CACHE: bf16 copies of the 2-D kernels (the compute reads
    them as bf16 anyway, so values are exact), with 0-size placeholders in
    the bias slots. Biases must NOT be cached: (a) TorchDense adds them to
    the f32 accumulator before the downcast, so a bf16 copy would change
    numerics, and (b) an aliased f32 reference would be the same buffer as
    the master inside the donated state → double-donation error."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if p.ndim >= 2
        else jnp.zeros((0,), p.dtype),
        params,
    )


def _merge_cached(master, cache):
    """Apply-ready tree: cached bf16 kernels + f32 master biases."""
    return jax.tree_util.tree_map(
        lambda m, c: c if m.ndim >= 2 else m, master, cache
    )


# optax.adam's default epsilon; build_pcaa never overrides it.
_ADAM_EPS = 1e-8


def _deferred_decoder_write(cfg: Config, opt_g, params_dec, scale):
    """Apply the pending decoder Adam parameter write from carried moments.

    ``Config.DEFERRED_DECODER_UPDATE``: the write ``p -= lr*m̂/(√v̂+eps)``
    is a pure function of the moments the previous step already stored, so
    it can run at the START of the next step's body — data-independent of
    the encoder forward, letting the scheduler overlap its HBM streaming
    with the MXU-bound matmuls (tools/probe_overlap.py). ``scale`` is 0.0
    on the first body of an epoch (nothing pending after the post-scan
    flush) and 1.0 otherwise; the formula is arranged so ``scale == 0``
    reproduces ``p`` bit-exactly.
    """
    adam_st = opt_g[0]
    cnt = adam_st.count.astype(jnp.float32)
    # Guard count == 0 (fresh state, scale == 0): 1 - B1**0 == 0 would put
    # a 0/0 NaN on the masked path, and NaN * 0 is still NaN. The guard
    # value must be O(1), not finfo.tiny: XLA's algebraic simplifier merges
    # the consecutive divides (m/c1)/denom into m/(c1*denom), and
    # tiny*denom underflows to 0 — reintroducing the 0/0 under jit even
    # though the unoptimized graph is NaN-free (observed on CPU XLA).
    fresh = cnt == 0.0
    c1 = jnp.where(fresh, 1.0, 1.0 - cfg.B1**cnt)
    c2 = jnp.where(fresh, 1.0, 1.0 - cfg.B2**cnt)

    def wr(p, m, v):
        m32 = m.astype(jnp.float32)
        v32 = v.astype(jnp.float32)
        upd = (m32 / c1) / (jnp.sqrt(v32 / c2) + _ADAM_EPS)
        return p - (scale * cfg.LR) * upd

    return jax.tree_util.tree_map(
        wr, params_dec, adam_st.mu["decoder"], adam_st.nu["decoder"]
    )


def build_pcaa(
    cfg: Config, spec: VariantSpec, key: jax.Array
) -> Tuple[PCAAModules, PCAAState]:
    n = cfg.n_classes
    latent = cfg.SUP_LATENT_DIM
    dtype = jnp.bfloat16 if cfg.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    mods = PCAAModules(
        encoder=CGEncoder(
            n_out_labels=n,
            sup_latent_dim=latent,
            pointnet_out_dim=cfg.POINTNET_OUT_DIM,
            dtc_filters=tuple(cfg.DTC_FILTERS),
            use_projection_head=spec.use_enc_head,
            dtype=dtype,
        ),
        discriminator=CGDiscriminator(),
        decoder=(
            CGDecoder(
                nsteps=cfg.NSTEPS,
                nmax_points=cfg.NMAX,
                nfeatures=cfg.NFEATURES,
                dtype=dtype,
            )
            if spec.use_decoder
            else None
        ),
        dec_head=ProjectionHead(latent * 2) if spec.use_dec_head else None,
        # Deliberate deviation: the reference declares its discriminator
        # projection head Linear(2*latent, latent) but feeds it the
        # latent-dim sup_fv (PCAA_ablation.py:783-786 vs :934-936) — the
        # proj_head_on_discriminator=True path cannot execute there without
        # a shape error. We build the head the call site implies
        # (latent -> latent) so the option actually works.
        disc_head=ProjectionHead(latent) if spec.use_disc_head else None,
        mean_learner=GaussianMeanLearner(latent) if spec.learned_centroids else None,
        spec=spec,
    )

    keys = jax.random.split(key, 8)
    x0 = jnp.zeros((2, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES), jnp.float32)
    z0 = jnp.zeros((2, latent), jnp.float32)
    oh0 = jnp.zeros((2, n), jnp.float32)

    enc_vars = mods.encoder.init(keys[0], x0, train=False)
    disc_vars = mods.discriminator.init(keys[1], z0, oh0)

    params_g = {"encoder": enc_vars["params"]}
    batch_stats = {"encoder": enc_vars["batch_stats"]}
    if mods.dec_head is not None:
        params_g["dec_head"] = mods.dec_head.init(keys[2], z0)["params"]
    if mods.decoder is not None:
        dec_in = latent * 2 if spec.use_dec_head else latent
        params_g["decoder"] = mods.decoder.init(
            keys[3], jnp.zeros((2, dec_in), jnp.float32)
        )["params"]

    params_d = {"discriminator": disc_vars["params"]}
    if mods.disc_head is not None:
        # latent-width input: the head is applied to sup_fv (see the
        # deviation note on the constructor above — the reference's
        # 2*latent declaration can never execute).
        params_d["disc_head"] = mods.disc_head.init(keys[4], z0)["params"]

    ml_params: Any = {}
    if mods.mean_learner is not None:
        ml_vars = mods.mean_learner.init(keys[5], oh0, train=False)
        ml_params = ml_vars["params"]
        batch_stats["mean_learner"] = ml_vars["batch_stats"]

    # Fixed prior centroids (reference utils.py:216-251, seed 42); V1 ignores
    # them in the step (it queries its frozen mean learner instead).
    centroids = jnp.asarray(
        sample_distant_points(latent, n, min_dist=10, sphere_radius=10, seed=42)
    )

    # In bf16 mode the Adam first moments are also bf16 — the 215M-param
    # decoder makes optimizer-state traffic a first-order step cost (m/v are
    # read+written every step). BF16_ADAM_NU additionally narrows the second
    # moment (arithmetic stays f32; train/optim.py).
    mu_dtype = dtype if cfg.COMPUTE_DTYPE == "bfloat16" else None
    if cfg.FACTORED_ADAM_NU:
        assert not cfg.FUSED_ADAM, "FACTORED_ADAM_NU and FUSED_ADAM are exclusive"
        from opensetgaitrecognition_pcaa_tpu.train.optim import adam_factored

        mods.tx_g = adam_factored(
            cfg.LR, b1=cfg.B1, b2=cfg.B2, mu_dtype=mu_dtype
        )
        # D params are far below the factoring threshold -> exact Adam
        mods.tx_d = adam_factored(
            cfg.LR, b1=cfg.B1, b2=cfg.B2, mu_dtype=mu_dtype
        )
    elif cfg.BF16_ADAM_NU or cfg.FUSED_ADAM:
        # FUSED_ADAM needs adam_lowmem's state layout even at f32 moments:
        # the G step bypasses tx_g.update and writes the (count, mu, nu)
        # fields directly through the fused kernel.
        from opensetgaitrecognition_pcaa_tpu.train.optim import adam_lowmem

        nu_dtype = jnp.bfloat16 if cfg.BF16_ADAM_NU else None
        mods.tx_g = adam_lowmem(
            cfg.LR, b1=cfg.B1, b2=cfg.B2,
            mu_dtype=mu_dtype, nu_dtype=nu_dtype,
        )
        mods.tx_d = adam_lowmem(
            cfg.LR, b1=cfg.B1, b2=cfg.B2,
            mu_dtype=mu_dtype, nu_dtype=nu_dtype,
        )
    else:
        mods.tx_g = optax.adam(cfg.LR, b1=cfg.B1, b2=cfg.B2, mu_dtype=mu_dtype)
        mods.tx_d = optax.adam(cfg.LR, b1=cfg.B1, b2=cfg.B2, mu_dtype=mu_dtype)

    if cfg.DEFERRED_DECODER_UPDATE:
        assert spec.use_decoder, "DEFERRED_DECODER_UPDATE targets the decoder"
        assert not cfg.FUSED_ADAM and not cfg.FACTORED_ADAM_NU, (
            "DEFERRED_DECODER_UPDATE recomputes the write from the stored "
            "(count, mu, nu) moments — the fused kernel writes params "
            "inside its own pass and the factored state has no per-element "
            "nu to recompute from"
        )

    cast_g: Any = {}
    if cfg.BF16_WEIGHT_CACHE:
        assert cfg.COMPUTE_DTYPE == "bfloat16", (
            "BF16_WEIGHT_CACHE is a bf16-compute traffic optimization; "
            "under f32 compute it would CHANGE numerics, not just traffic"
        )
        assert spec.use_decoder, "BF16_WEIGHT_CACHE targets the decoder"
        # Only the decoder (215.3M of 217.7M params) — the tiny dec_head
        # computes in f32 (ProjectionHead/TorchDense default), so bf16
        # params there would change numerics, and it carries no traffic.
        cast_g = {"decoder": _cache_tree(params_g["decoder"])}

    state = PCAAState(
        params_g=params_g,
        params_d=params_d,
        ml_params=ml_params,
        batch_stats=batch_stats,
        opt_g=mods.tx_g.init(params_g),
        opt_d=mods.tx_d.init(params_d),
        centroids=centroids,
        key=keys[6],
        cast_g=cast_g,
    )
    return mods, state


def _encoder_apply(mods, params, bstats, pcs, train):
    variables = {"params": params, "batch_stats": bstats}
    if train:
        (logits, fv), muts = mods.encoder.apply(
            variables, pcs, train=True, mutable=["batch_stats"]
        )
        return logits, fv, muts["batch_stats"]
    logits, fv = mods.encoder.apply(variables, pcs, train=False)
    return logits, fv, bstats


def make_train_step(mods: PCAAModules, cfg: Config):
    spec = mods.spec
    n = cfg.n_classes
    latent = cfg.SUP_LATENT_DIM

    def step(state: PCAAState, pcs, labels, step_idx, inject=None):
        # Fresh noise every batch, like the reference's unseeded torch RNG
        # (train_AAE.py:173-179): the carried key advances each step, so z0
        # and the GP alphas never repeat across epochs. ``inject`` (a
        # ``(z0, alphas)`` pair, trace-time optional) replays externally
        # recorded draws instead — the common-random-numbers twin harness
        # (tools/parity_twin.py) feeds the torch reference's actual noise
        # stream through here so both implementations train on identical
        # random realizations.
        new_key, k_z, k_alpha = jax.random.split(state.key, 3)
        oh = jax.nn.one_hot(labels, n, dtype=jnp.float32)

        # --- deferred decoder parameter write (cross-phase pipelining) ----
        # Bring the decoder up to date with the moments the PREVIOUS body
        # stored. No data dependence on the encoder forward below — the two
        # can execute concurrently (Config.DEFERRED_DECODER_UPDATE). Body 0
        # of each epoch has nothing pending (post-scan flush), so scale=0
        # reduces the write to an exact no-op.
        dec_params = None
        cast_dec = None
        if cfg.DEFERRED_DECODER_UPDATE:
            write_scale = (step_idx > 0).astype(jnp.float32)
            dec_params = _deferred_decoder_write(
                cfg, state.opt_g, state.params_g["decoder"], write_scale
            )
            if cfg.BF16_WEIGHT_CACHE:
                cast_dec = {"decoder": _cache_tree(dec_params)}

        # --- ONE encoder forward (train mode) for the whole step ----------
        # The reference reuses its single forward's graph for both the
        # D-step (detached) and the G-step backward. We do the same with
        # jax.vjp: one forward here, and its pullback supplies the encoder
        # gradients for the generator loss — no second forward.
        def enc_fwd(enc_params):
            if cfg.FUSED_POINTNET:
                from opensetgaitrecognition_pcaa_tpu.train.fused_encoder import (
                    fused_train_encoder_apply,
                )

                logits, fv, new_bs = fused_train_encoder_apply(
                    enc_params,
                    state.batch_stats["encoder"],
                    pcs,
                    use_projection_head=spec.use_enc_head,
                    store_dtype=(
                        jnp.bfloat16
                        if cfg.COMPUTE_DTYPE == "bfloat16"
                        else jnp.float32
                    ),
                )
                return (logits, fv), new_bs
            (logits, fv), muts = mods.encoder.apply(
                {
                    "params": enc_params,
                    "batch_stats": state.batch_stats["encoder"],
                },
                pcs,
                train=True,
                mutable=["batch_stats"],
            )
            return (logits, fv), muts["batch_stats"]

        (logits0, fv0), enc_vjp, new_enc_bs = jax.vjp(
            enc_fwd, state.params_g["encoder"], has_aux=True
        )
        fv_detached = jax.lax.stop_gradient(fv0)

        batch_stats = dict(state.batch_stats)
        batch_stats["encoder"] = new_enc_bs

        # --- class prior means ------------------------------------------
        if spec.learned_centroids:
            # Frozen-params mean learner, train-mode BN (stats update).
            mus, ml_muts = mods.mean_learner.apply(
                {
                    "params": state.ml_params,
                    "batch_stats": state.batch_stats["mean_learner"],
                },
                oh,
                train=True,
                mutable=["batch_stats"],
            )
            mus = jax.lax.stop_gradient(mus)
            batch_stats["mean_learner"] = ml_muts["batch_stats"]
        else:
            mus = oh @ state.centroids

        # Prior sample; fully detached (reference wraps in Variable()).
        if inject is None:
            z0 = jax.random.normal(k_z, (pcs.shape[0], latent))
            alphas = jax.random.uniform(k_alpha, (pcs.shape[0], 1))
        else:
            z0, alphas = inject
        z = jax.lax.stop_gradient(z0 + mus)

        # --- discriminator (critic) step ----------------------------------
        def d_loss_fn(params_d):
            def critic(x):
                return mods.discriminator.apply(
                    {"params": params_d["discriminator"]}, x, oh
                )[:, 0]

            if spec.use_disc_head:
                fake = jax.lax.stop_gradient(
                    mods.disc_head.apply(
                        {"params": params_d["disc_head"]}, fv_detached
                    )
                )
            else:
                fake = fv_detached
            real_logits = critic(z)
            fake_logits = critic(fake)
            gp = gradient_penalty(critic, z, fake, alphas)
            return (
                jnp.mean(fake_logits)
                - jnp.mean(real_logits)
                + cfg.GP_WEIGHT * gp
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.params_d)
        d_updates, new_opt_d = mods.tx_d.update(d_grads, state.opt_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, d_updates)

        # --- generator (encoder+decoder) step ------------------------------
        sup_on = (step_idx % cfg.SUPERVISION_FREQUENCY) == 0

        def downstream_loss(down_params, logits, fv):
            """G loss as a function of (decoder-side params, encoder outputs).

            The encoder gradients come from the pullback of the single
            forward above (``enc_vjp``) — same math as differentiating a
            recomputed forward, one full encoder pass cheaper.
            """
            if spec.use_decoder:
                h = (
                    mods.dec_head.apply({"params": down_params["dec_head"]}, fv)
                    if spec.use_dec_head
                    else fv
                )
                rec = mods.decoder.apply({"params": down_params["decoder"]}, h)
                rec_loss = seq_chamfer(rec, pcs)
            else:
                rec_loss = jnp.float32(0.0)

            # Critic with *updated* D params; grads flow into fv only.
            disc_in = (
                mods.disc_head.apply({"params": new_params_d["disc_head"]}, fv)
                if spec.use_disc_head
                else fv
            )
            synth_logits = mods.discriminator.apply(
                {"params": new_params_d["discriminator"]}, disc_in, oh
            )[:, 0]
            adv_loss = -jnp.mean(synth_logits) * cfg.ADV_WEIGHT

            sup_loss = cross_entropy(logits, labels)
            tot = rec_loss + adv_loss + jnp.where(sup_on, sup_loss, 0.0)
            return tot, (rec_loss, adv_loss, sup_loss)

        down_params = {
            k: v for k, v in state.params_g.items() if k != "encoder"
        }
        if cfg.DEFERRED_DECODER_UPDATE:
            # The decoder the loss sees is the freshly-written one (level
            # k-1, exactly what the undeferred schedule would use here) —
            # through its refreshed bf16 cache when that path is on.
            down_params = {
                **down_params,
                "decoder": (
                    _merge_cached(dec_params, cast_dec["decoder"])
                    if cfg.BF16_WEIGHT_CACHE
                    else dec_params
                ),
            }
        elif cfg.BF16_WEIGHT_CACHE:
            # Differentiate wrt the carried bf16 decoder copy instead of the
            # f32 master: the loss is f(cast(p)) either way, and d/dp of
            # that is exactly upcast(d/d cast(p)) — so upcasting these
            # grads reproduces the master-side gradients BIT-FOR-BIT while
            # the fwd+bwd read 215M params at half the bytes
            # (Config.BF16_WEIGHT_CACHE).
            down_params = {
                **down_params,
                "decoder": _merge_cached(
                    state.params_g["decoder"], state.cast_g["decoder"]
                ),
            }
        (tot_loss, (rec_loss, adv_loss, sup_loss)), down_grads = (
            jax.value_and_grad(downstream_loss, argnums=(0, 1, 2), has_aux=True)(
                down_params, logits0, fv0
            )
        )
        d_down, d_logits, d_fv = down_grads
        if cfg.BF16_WEIGHT_CACHE:
            d_down = {
                **d_down,
                "decoder": jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32)
                    if g.dtype == jnp.bfloat16
                    else g,
                    d_down["decoder"],
                ),
            }
        (enc_grads,) = enc_vjp((d_logits, d_fv))
        g_grads = {"encoder": enc_grads, **d_down}
        if cfg.FUSED_ADAM:
            # Single-pass Pallas update on the big decoder matrices: no
            # materialized `updates` tree (PERF_ROOFLINE.md: the optax path
            # runs the 217.7M-param update at ~1.5× minimum HBM traffic).
            from opensetgaitrecognition_pcaa_tpu.ops.pallas.adam_kernel import (
                fused_adam_tree_update,
            )
            from opensetgaitrecognition_pcaa_tpu.train.optim import (
                ScaleByAdamLowmemState,
            )

            adam_st = state.opt_g[0]
            new_params_g, cnt2, mu2, nu2 = fused_adam_tree_update(
                g_grads,
                adam_st.count,
                adam_st.mu,
                adam_st.nu,
                state.params_g,
                lr=cfg.LR,
                b1=cfg.B1,
                b2=cfg.B2,
            )
            new_opt_g = (ScaleByAdamLowmemState(cnt2, mu2, nu2),) + tuple(
                state.opt_g[1:]
            )
        elif cfg.DEFERRED_DECODER_UPDATE:
            # Moments update as usual (the EMA writes stay fused with
            # gradient production), but the decoder's parameter delta is
            # NOT applied here — its update leaves are dead and DCE'd; the
            # write happens from the stored moments at the top of the next
            # body (or the post-scan flush). The carried decoder params
            # stay at level k-1 = `dec_params`.
            g_updates, new_opt_g = mods.tx_g.update(
                g_grads, state.opt_g, state.params_g
            )
            upd_nodec = {k: v for k, v in g_updates.items() if k != "decoder"}
            par_nodec = {
                k: v for k, v in state.params_g.items() if k != "decoder"
            }
            new_params_g = {
                **optax.apply_updates(par_nodec, upd_nodec),
                "decoder": dec_params,
            }
        else:
            g_updates, new_opt_g = mods.tx_g.update(
                g_grads, state.opt_g, state.params_g
            )
            new_params_g = optax.apply_updates(state.params_g, g_updates)

        preds = jnp.argmax(logits0, axis=1)
        metrics = {
            "rec_loss": rec_loss,
            "d_loss": d_loss,
            "sup_loss": sup_loss,
            "tot_loss": tot_loss,
            "n_correct": jnp.sum(preds == labels).astype(jnp.float32),
        }
        if cfg.BF16_WEIGHT_CACHE:
            if cfg.DEFERRED_DECODER_UPDATE:
                # Cast refreshed at the deferred write above — it already
                # matches the carried master (both at level k-1).
                new_cast = cast_dec
            else:
                # Refresh the bf16 copy from the just-updated master; XLA
                # fuses the cast into the Adam write pipeline (the new
                # params are still in registers), so this costs one bf16
                # write, not an extra f32 read.
                new_cast = {"decoder": _cache_tree(new_params_g["decoder"])}
        else:
            new_cast = state.cast_g
        new_state = state.replace(
            params_g=new_params_g,
            params_d=new_params_d,
            cast_g=new_cast,
            batch_stats=batch_stats,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
            key=new_key,
        )
        return new_state, metrics

    return step


def make_epoch_fns(mods: PCAAModules, cfg: Config, mesh=None):
    """→ (train_epoch, valid_epoch), both jitted whole-epoch scans.

    With ``mesh`` (a ``(data, model)`` ``jax.sharding.Mesh``), each gathered
    batch is sharding-constrained onto the ``data`` axis — GSPMD then splits
    the forward/backward across chips and inserts the gradient ``psum`` over
    ICI (data parallelism; params stay replicated unless the caller placed
    them with the tensor-parallel rule of ``parallel/mesh.py``).
    """
    spec = mods.spec
    train_step = make_train_step(mods, cfg)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))

        def shard_batch(t):
            return jax.lax.with_sharding_constraint(t, batch_sh)
    else:

        def shard_batch(t):
            return t

    def train_epoch(state: PCAAState, x_all, y_all, perm, noise=None):
        """perm: (steps, B) int32 gather indices for this epoch's batches.

        ``noise`` (trace-time optional): ``(z0 (steps, B, latent),
        alphas (steps, B, 1))`` replay arrays for the CRN twin harness."""

        def body(state, xs):
            if noise is None:
                step_idx, idx = xs
                inject = None
            else:
                step_idx, idx, z0_s, al_s = xs
                inject = (z0_s, al_s)
            pcs = shard_batch(jnp.take(x_all, idx, axis=0))
            labels = shard_batch(jnp.take(y_all, idx, axis=0))
            return train_step(state, pcs, labels, step_idx, inject)

        steps = jnp.arange(perm.shape[0])
        xs = (steps, perm) if noise is None else (steps, perm) + tuple(noise)
        state, metrics = jax.lax.scan(body, state, xs)
        if cfg.DEFERRED_DECODER_UPDATE:
            # Flush the last body's pending decoder write so the state
            # handed to validation / checkpointing / the next epoch is
            # IDENTICAL to the undeferred schedule's.
            dec_final = _deferred_decoder_write(
                cfg, state.opt_g, state.params_g["decoder"], jnp.float32(1.0)
            )
            new_cast = (
                {"decoder": _cache_tree(dec_final)}
                if cfg.BF16_WEIGHT_CACHE
                else state.cast_g
            )
            state = state.replace(
                params_g={**state.params_g, "decoder": dec_final},
                cast_g=new_cast,
            )
        return state, metrics

    def valid_epoch(state: PCAAState, x_all, y_all, perm):
        def body(carry, idx):
            pcs = jnp.take(x_all, idx, axis=0)
            labels = jnp.take(y_all, idx, axis=0)
            logits, fv, _ = _encoder_apply(
                mods,
                state.params_g["encoder"],
                state.batch_stats["encoder"],
                pcs,
                False,
            )
            if spec.use_decoder:
                h = (
                    mods.dec_head.apply({"params": state.params_g["dec_head"]}, fv)
                    if spec.use_dec_head
                    else fv
                )
                rec = mods.decoder.apply({"params": state.params_g["decoder"]}, h)
                rec_loss = seq_chamfer(rec, pcs)
            else:
                rec_loss = jnp.float32(0.0)
            ce = cross_entropy(logits, labels)
            correct = jnp.sum(jnp.argmax(logits, axis=1) == labels).astype(
                jnp.float32
            )
            return carry, {"rec_loss": rec_loss, "ce_loss": ce, "n_correct": correct}

        _, metrics = jax.lax.scan(body, None, perm)
        return metrics

    return (
        jax.jit(train_epoch, donate_argnums=(0,)),
        jax.jit(valid_epoch),
    )


def _ckpt_payload(state: PCAAState) -> Dict[str, Any]:
    """The state pieces the on-disk checkpoint needs (no optimizer moments)."""
    return {
        "params_g": state.params_g,
        "params_d": state.params_d,
        "ml_params": state.ml_params,
        "batch_stats": state.batch_stats,
    }


def _snapshot(payload: Dict[str, Any]) -> Dict[str, Any]:
    """Device-side copy — safe to hold across donated train steps; the
    host fetch happens once at run end (the axon tunnel moves ~MB/s, so
    fetching the 860 MB decoder at every improving checkpoint epoch like
    the reference writes its .pt files would dominate the run)."""
    return jax.tree_util.tree_map(jnp.copy, payload)


def _checkpoint(run_dir: str, name: str, mods: PCAAModules, payload, cfg: Config):
    """Write the reference's per-module checkpoint files (SURVEY.md §1)."""

    class _P:  # attribute view over the payload dict
        params_g = payload["params_g"]
        params_d = payload["params_d"]
        ml_params = payload["ml_params"]
        batch_stats = payload["batch_stats"]

    state = _P
    enc_vars = {
        "params": state.params_g["encoder"],
        "batch_stats": state.batch_stats["encoder"],
    }
    save_params(enc_vars, module_path(run_dir, name, "E"))
    save_params(
        {"params": state.params_d["discriminator"]}, module_path(run_dir, name, "D")
    )
    if mods.decoder is not None:
        save_params(
            {"params": state.params_g["decoder"]}, module_path(run_dir, name, "G")
        )
    if mods.dec_head is not None:
        save_params(
            {"params": state.params_g["dec_head"]}, module_path(run_dir, name, "GPH")
        )
    if mods.disc_head is not None:
        save_params(
            {"params": state.params_d["disc_head"]}, module_path(run_dir, name, "DPH")
        )
    if mods.mean_learner is not None:
        save_params(
            {
                "params": state.ml_params,
                "batch_stats": state.batch_stats["mean_learner"],
            },
            module_path(run_dir, name, "ML"),
        )
        # "Learned" centroids: train-mode BN on the identity one-hot batch
        # under no-grad (reference PCAA_ablation.py:369-376).
        oh = jnp.eye(cfg.n_classes, dtype=jnp.float32)
        means, _ = mods.mean_learner.apply(
            {
                "params": state.ml_params,
                "batch_stats": state.batch_stats["mean_learner"],
            },
            oh,
            train=True,
            mutable=["batch_stats"],
        )
        save_array(means, os.path.join(run_dir, "discriminator_means.npy"))


def train_pcaa(
    cfg: Config,
    variation: VARIATION = VARIATION.V4,
    *,
    proj_head_on_discriminator: bool = False,
    wandb_mode: str = "disabled",
    datasets: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = None,
    verbose: bool = True,
    resume: bool = True,
) -> Dict[str, float]:
    """Train one PCAA run end-to-end; writes the run folder and returns
    final metrics (incl. throughput).

    :param datasets: optional pre-loaded ``(x_train, y_train, x_valid,
        y_valid)`` override (used by tests / the grid runner); otherwise
        loaded from ``cfg.GEN_DATA_PATH``.
    :param resume: continue from ``train_state.msgpack`` if the run folder
        has one (full state: params, Adam moments, BN stats, PRNG, shuffle
        stream) — the reference can only restart from scratch (SURVEY §5).
    """
    spec = VARIANTS[variation]
    if variation == VARIATION.V4 and proj_head_on_discriminator:
        spec = dataclasses.replace(spec, use_disc_head=True)

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

    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train)
    x_valid = jnp.asarray(x_valid)
    y_valid = jnp.asarray(y_valid)

    key = jax.random.PRNGKey(cfg.SEED)
    mods, state = build_pcaa(cfg, spec, key)

    if not spec.learned_centroids:
        save_array(
            state.centroids, os.path.join(run_dir, "discriminator_means.npy")
        )

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

    train_epoch, valid_epoch = make_epoch_fns(mods, cfg, mesh=mesh)
    logger = MetricLogger(run_dir, cfg.to_dict(), mode=wandb_mode)
    host_rng = np.random.default_rng(cfg.SEED)

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
            # restore the best-so-far weights too, so the run-end write
            # never regresses to the final state when the restored best
            # accuracy is never beaten post-resume.
            best_payload = load_best_payload(_ckpt_payload(state), ckpt_path)
            if verbose:
                print(f"[{name}] resuming from epoch {start_epoch}")

    if mesh is not None and cfg.MP_DEVICES > 1:
        # Tensor parallelism: place params + Adam moments with the
        # output-axis rule (parallel/mesh.py). Done AFTER the resume restore
        # so a restored (host-side) state gets the same placement; GSPMD
        # then propagates the layout through the donated epoch scans.
        from opensetgaitrecognition_pcaa_tpu.parallel.mesh import shard_state

        state = shard_state(state, mesh, min_dim=cfg.MP_MIN_DIM)

    n_train = x_train.shape[0]
    n_windows_epoch = (n_train // cfg.BATCH_SIZE) * cfg.BATCH_SIZE
    t_start = time.time()
    total_windows = 0
    out: Dict[str, float] = {}

    valid_steps = x_valid.shape[0] // cfg.BATCH_SIZE
    valid_perm = jnp.asarray(
        epoch_batch_indices(x_valid.shape[0], cfg.BATCH_SIZE, shuffle=False)
    )

    steps = n_train // cfg.BATCH_SIZE
    for epoch in range(start_epoch, cfg.EPOCHS):
        perm = jnp.asarray(
            epoch_batch_indices(
                n_train, cfg.BATCH_SIZE, shuffle=True, rng=host_rng
            ).astype(np.int32)
        )
        state, m = train_epoch(state, x_train, y_train, perm)
        vm = valid_epoch(state, x_valid, y_valid, valid_perm)
        m = jax.device_get(m)
        vm = jax.device_get(vm)
        total_windows += n_windows_epoch

        train_acc = float(np.sum(m["n_correct"]) / (steps * cfg.BATCH_SIZE))
        valid_acc = float(
            np.sum(vm["n_correct"]) / (valid_steps * cfg.BATCH_SIZE)
        )
        # CE/total means run over SUPERVISED batches only — the reference
        # appends sup_loss/tot_sup_losses solely when
        # i % SUPERVISION_FREQUENCY == 0 (PCAA_ablation.py:1005-1013) and
        # wandb-logs np.mean of those lists (:1077,1080). All batches are
        # supervised at the default frequency 1.
        sup_mask = (
            np.arange(len(m["sup_loss"])) % cfg.SUPERVISION_FREQUENCY
        ) == 0
        epoch_metrics = {
            # reference wandb keys (train_AAE.py:326-337)
            "Reconstruction Loss Train": float(np.mean(m["rec_loss"])),
            "Reconstruction Loss Valid": float(np.mean(vm["rec_loss"])),
            "Cross Entropy Loss Train": float(np.mean(m["sup_loss"][sup_mask])),
            "Cross Entropy Loss Valid": float(np.mean(vm["ce_loss"])),
            "Discriminator Loss": float(np.mean(m["d_loss"])),
            "Total Loss Train": float(np.mean(m["tot_loss"][sup_mask])),
            "Train Accuracy": train_acc,
            "Valid Accuracy": valid_acc,
        }
        logger.log(epoch_metrics, step=epoch)
        if verbose:
            print(
                f"[{name}] epoch {epoch + 1}/{cfg.EPOCHS} "
                f"rec={epoch_metrics['Reconstruction Loss Train']:.4f} "
                f"d={epoch_metrics['Discriminator Loss']:.4f} "
                f"ce={epoch_metrics['Cross Entropy Loss Train']:.4f} "
                f"acc={train_acc:.3f} vacc={valid_acc:.3f}"
            )

        # best-by-valid-accuracy checkpoint every CHECKPOINT_FREQUENCY epochs
        # (reference PCAA_ablation.py:1087-1119, epoch 0 included).
        if epoch % cfg.CHECKPOINT_FREQUENCY == 0:
            improved = valid_acc > best_valid_acc
            if improved:
                best_valid_acc = valid_acc
                # device-side snapshot now, single host fetch at run end
                best_payload = _snapshot(_ckpt_payload(state))
            if cfg.SAVE_RESUME_STATE:
                # full-state resume checkpoint (beyond-reference capability)
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

    # Single host fetch + write of the best checkpoint; fall back to the
    # final state if no epoch improved validation accuracy at a boundary.
    _checkpoint(
        run_dir,
        name,
        mods,
        best_payload if best_payload is not None else _ckpt_payload(state),
        cfg,
    )
    mark_run_completed(run_dir, out)
    return out
