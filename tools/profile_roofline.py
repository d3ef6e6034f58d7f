#!/usr/bin/env python
"""Roofline breakdown of the PCAA V4 bf16 training step (judge item 5).

Times the full jitted train step and its four dominant components on the
real chip, compares each against an analytic MINIMUM HBM traffic estimate
(weights/moments/activations each touched once per logical pass) and the
v5e's ~819 GB/s HBM roofline. Writes PERF_ROOFLINE.md at the repo root.

Timing methodology (important on this machine): the axon tunnel adds
~30 ms of host dispatch latency per call — single-call timing reads 32 ms
for a 1.9 ms component. Every measurement here therefore wraps the
component in a length-K ``lax.scan`` (ONE dispatch, K device executions)
and divides wall time by K. Each scan body carries an explicit data
dependence on the previous iteration (a carried scalar folded into a
loop-variant input, or the real carried optimizer state) so XLA cannot
hoist the body as loop-invariant. Completion is forced with a scalar
``jax.device_get`` (block_until_ready lies on the tunnel; CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_HBM_GBS = 819.0  # v5e HBM bandwidth roofline
V5E_BF16_TFLOPS = 394.0  # v5e MXU peak (bf16)

K = 64  # scan length per component measurement
N_REPS = 3  # timed dispatches per component (median)


def time_scanned(run_jit, args, k, n=N_REPS):
    """Median seconds per scan iteration of an already-jitted ``run_jit``
    whose return value is a scalar depending on every iteration."""
    import jax

    jax.device_get(run_jit(*args))  # compile + warmup
    jax.device_get(run_jit(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(run_jit(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / k


def _tree_sum(tree):
    import jax
    import jax.numpy as jnp

    return sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(tree)
    )


def param_count(tree):
    import jax

    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trace", action="store_true", help="also write a profiler trace")
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
    from opensetgaitrecognition_pcaa_tpu.ops import (
        cross_entropy,
        gradient_penalty,
        seq_chamfer,
    )
    from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
        VARIANTS,
        build_pcaa,
        make_epoch_fns,
        make_train_step,
    )

    platform = jax.devices()[0].platform
    cfg = Config(
        TRAIN_CLASSES=tuple(range(8)),
        MODEL_NAME="roofline",
        BATCH_SIZE=args.batch,
        COMPUTE_DTYPE="bfloat16",
    )
    B, T, N, C = cfg.BATCH_SIZE, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES
    latent, D = cfg.SUP_LATENT_DIM, cfg.POINTNET_OUT_DIM

    mods, state = build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, N, C)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 8, B, dtype=np.int32))

    # ---------------- full step: whole-epoch scan (bench.py's shape) ------
    n_samples = B * 32
    xs = jnp.asarray(rng.normal(size=(n_samples, T, N, C)).astype(np.float32))
    ys = jnp.asarray(rng.integers(0, 8, n_samples, dtype=np.int32))
    perm = jnp.asarray(
        rng.permutation(n_samples).reshape(32, B).astype(np.int32)
    )
    train_epoch, _ = make_epoch_fns(mods, cfg)

    st, m = train_epoch(state, xs, ys, perm)  # compile + warmup
    float(jax.device_get(m["tot_loss"])[-1])
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        st, m = train_epoch(st, xs, ys, perm)
    float(jax.device_get(m["tot_loss"])[-1])
    t_full = (time.perf_counter() - t0) / (reps * 32)
    # train_epoch donates its input state — the original ``state`` buffers
    # are gone; every component below reads from the live returned state
    state = st

    enc = mods.encoder

    # ---------------- encoder fwd+bwd --------------------------------------
    # carry c folded into x (loop-variant input → every grad depends on it;
    # +2 × 14 MB traffic per iter, ~2% of the component's 1.3 GB minimum)
    @jax.jit
    def run_enc(params, bstats, x, y):
        def loss(p, xc):
            (logits, fv), _ = enc.apply(
                {"params": p, "batch_stats": bstats},
                xc,
                train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy(logits, y) + jnp.sum(fv * fv) * 0.0

        def body(c, _):
            g = jax.grad(loss)(params, x + c * 0)
            # full-tree sum: every grad element feeds the carry, so XLA
            # cannot DCE any part of the backward (a single-element output
            # lets it skip the weight-gradient outer products entirely)
            return _tree_sum(g) * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    # ---------------- decoder + chamfer fwd+bwd ----------------------------
    # carry folded into fv (tiny); all decoder/head grads flow from fv's
    # activations, so nothing in the body is loop-invariant
    @jax.jit
    def run_dec(dec_params, head_params, fv, x):
        def loss(dp, hp, fvc):
            h = mods.dec_head.apply({"params": hp}, fvc)
            rec = mods.decoder.apply({"params": dp}, h)
            return seq_chamfer(rec, x)

        def body(c, _):
            gd, gh = jax.grad(loss, argnums=(0, 1))(dec_params, head_params, fv + c * 0)
            return (_tree_sum(gd) + _tree_sum(gh)) * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    # ---------------- discriminator WGAN-GP step ----------------------------
    @jax.jit
    def run_dstep(params_d, z, fake, oh, alphas):
        def d_loss(pd, zc, fc):
            def critic(v):
                return mods.discriminator.apply(
                    {"params": pd["discriminator"]}, v, oh
                )[:, 0]

            gp = gradient_penalty(critic, zc, fc, alphas)
            return jnp.mean(critic(fc)) - jnp.mean(critic(zc)) + cfg.GP_WEIGHT * gp

        def body(c, _):
            g = jax.grad(d_loss)(params_d, z + c * 0, fake + c * 0)
            return _tree_sum(g) * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    # ---------------- Adam update (G) ---------------------------------------
    # carries the REAL (params, opt) state → true repeated-update traffic,
    # fully serialized by construction, zero artificial overhead
    @jax.jit
    def run_adam(params, opt, grads):
        def body(carry, _):
            p, o = carry
            updates, o2 = mods.tx_g.update(grads, o, p)
            return (optax.apply_updates(p, updates), o2), None

        (p, _), _ = jax.lax.scan(body, (params, opt), None, length=K)
        # sum over the whole final tree: Adam is elementwise, so a
        # single-element output would let XLA update only one element/leaf
        return _tree_sum(p)

    # inputs for components
    oh = jax.nn.one_hot(y, 8)
    z = jnp.asarray(rng.normal(size=(B, latent)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(B, latent)).astype(np.float32))
    alphas = jnp.asarray(rng.uniform(size=(B, 1)).astype(np.float32))
    fv = jnp.asarray(rng.normal(size=(B, latent)).astype(np.float32))
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params_g)

    # ---------------- measurements ----------------------------------------
    print(f"platform={platform}; full step (epoch scan) = {t_full * 1e3:.2f} ms")
    t_enc = time_scanned(
        run_enc,
        (state.params_g["encoder"], state.batch_stats["encoder"], x, y),
        K,
    )
    t_dec = time_scanned(
        run_dec, (state.params_g["decoder"], state.params_g["dec_head"], fv, x), K
    )
    t_dstep = time_scanned(run_dstep, (state.params_d, z, fake, oh, alphas), K)
    t_adam = time_scanned(run_adam, (state.params_g, state.opt_g, zero_grads), K)

    # ---------------- analytic traffic minimums ---------------------------
    n_dec = param_count(state.params_g["decoder"])
    n_enc = param_count(state.params_g["encoder"])
    n_g = param_count(state.params_g)

    # Adam (G): read w(4) + grad(4) + m(2,bf16) + v(4), write w(4)+m(2)+v(4)
    adam_bytes = n_g * (4 + 4 + 2 + 4 + 4 + 2 + 4)
    # decoder fwd+bwd: weights read twice (fwd + bwd transpose) in bf16,
    # grads written f32; activations are B×(1125+2250+4500+9000+18000)×2
    act_dec = B * 34875 * 2 * 3  # fwd write + bwd read + grad-of-act
    dec_bytes = n_dec * (2 + 2 + 4) + act_dec
    # encoder fwd+bwd: pointnet activations dominate: B·T·N ×(512+512+1024+1024)
    act_enc = B * T * N * (512 + 512 + 1024 + 1024) * 2
    enc_bytes = act_enc * 3 + n_enc * (2 + 2 + 4)  # fwd + bwd reread + dgrad

    rows = [
        ("full train step", t_full, None),
        ("encoder fwd+bwd", t_enc, enc_bytes),
        ("decoder+chamfer fwd+bwd", t_dec, dec_bytes),
        ("discriminator WGAN-GP step", t_dstep, None),
        ("Adam update (G params+moments)", t_adam, adam_bytes),
    ]

    lines = [
        "# PERF_ROOFLINE — PCAA V4 bf16 training step, one v5e chip\n",
        f"Measured on platform `{platform}`, B={B}, reference dims "
        f"(T={T}, N={N}, D={D}), `COMPUTE_DTYPE=bfloat16`, bf16 Adam first "
        f"moments. Each component is timed as a length-{K} `lax.scan` "
        "(single dispatch; the axon tunnel's ~30 ms/dispatch host latency "
        "is amortized to <0.5 ms/iter) with carried data dependences so "
        "XLA cannot hoist loop-invariant work; completion forced via "
        "scalar `device_get` (`tools/profile_roofline.py`).\n",
        "| component | median time (ms) | min HBM traffic (MB) | implied GB/s | % of 819 GB/s roofline |",
        "|---|---|---|---|---|",
    ]
    results = {}
    for name, t, byts in rows:
        ms = t * 1e3
        if byts is not None:
            gbs = byts / t / 1e9
            pct = 100.0 * gbs / V5E_HBM_GBS
            lines.append(
                f"| {name} | {ms:.2f} | {byts / 1e6:.0f} | {gbs:.0f} | {pct:.0f}% |"
            )
        else:
            lines.append(f"| {name} | {ms:.2f} | — | — | — |")
        results[name] = {"ms": ms, "bytes": byts}
        print(f"{name}: {ms:.2f} ms" + (f" ({byts / 1e6:.0f} MB min)" if byts else ""))

    comp_sum = (t_enc + t_dec + t_dstep + t_adam) * 1e3
    overlap = comp_sum - t_full * 1e3
    win_ps = B / t_full
    lines += [
        "",
        f"Components sum to {comp_sum:.2f} ms vs {t_full * 1e3:.2f} ms for the "
        f"fused full step → XLA overlaps/fuses {max(overlap, 0):.2f} ms of the "
        "component work inside the single jitted step (e.g. the G Adam "
        "update consumes gradients as they are produced instead of "
        "re-reading a materialized gradient tree).",
        f"Throughput at this step time: **{win_ps:.0f} windows/s/chip**.",
        "",
        "Traffic estimates are MINIMUMS (weights/moments each touched once "
        "per pass, activations written once + read once in the backward); "
        "an implied-GB/s near the roofline means the component cannot go "
        "faster without reducing bytes, not that the code is slow.",
        "",
        f"Param counts: decoder {n_dec / 1e6:.1f}M of {n_g / 1e6:.1f}M total "
        "generator params — the decoder dominates optimizer traffic "
        "(CLAUDE.md perf notes).",
    ]

    out_md = os.path.join(REPO, "PERF_ROOFLINE.md")
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(REPO, "PERF_ROOFLINE.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_md}")

    if args.trace:
        from opensetgaitrecognition_pcaa_tpu.utils.profiling import trace

        train_step = jax.jit(make_train_step(mods, cfg))
        trace_dir = os.path.join(REPO, "traces", "v4_step")
        with trace(trace_dir):
            out = train_step(state, x, y, jnp.int32(0))
            jax.device_get(out[1]["tot_loss"])
        print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
