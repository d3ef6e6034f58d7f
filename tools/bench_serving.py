#!/usr/bin/env python
"""Serving-artifact latency/throughput on the real TPU at reference dims.

Measures the deployed decision path (``infer/serving.py``): a PCAA k-window
decision artifact — encoder forward + f64 mixture scoring + threshold
rejection + majority vote, AOT-exported StableHLO — called end-to-end
(host numpy in → decisions out, ``jax.device_get``-forced completion, the
axon-tunnel timing rule from ``utils/profiling.py``).

Weights are random-init at exactly the reference dims (the graph, and so
the latency, is weight-independent); the threshold is arbitrary. Batch
sweep shows the dispatch-latency floor (≈0.5 s/call over the tunnel)
amortizing away: serving batches should be as large as latency budgets
allow.

Usage: python tools/bench_serving.py [--batches 1 8 32] [--k 6]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32])
    p.add_argument("--n-labels", type=int, default=8)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import export as jax_export

    from opensetgaitrecognition_pcaa_tpu.infer.serving import (
        _export_multi_platform,
        make_pcaa_decision_fn,
    )
    from opensetgaitrecognition_pcaa_tpu.models import CGEncoder

    # exact reference dims (config.py defaults mirror constants.py)
    T, N, C, LAT = 30, 150, 4, 32
    enc = CGEncoder(
        n_out_labels=args.n_labels,
        sup_latent_dim=LAT,
        pointnet_out_dim=1024,
        dtc_filters=(16, 32, 64, 128, 256, 512),
        use_projection_head=True,
    )
    ev = enc.init(
        jax.random.PRNGKey(0), jnp.zeros((2, T, N, C), jnp.float32),
        train=False,
    )
    means = np.random.default_rng(0).normal(size=(args.n_labels, LAT))
    decide = make_pcaa_decision_fn(enc, args.n_labels, args.k)
    ev_host = jax.device_get(ev)

    def baked(w):
        return decide(ev_host, means, np.float64(-100.0), w)

    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, args.k, T, N, C), jnp.float32)
    t0 = time.perf_counter()
    exported = _export_multi_platform(baked, [spec])
    print(f"# export trace: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev}", file=sys.stderr)

    # on-device per-decision time, dispatch-amortized: exported artifacts
    # are traceable inside jit, so reps run in ONE dispatch via lax.scan
    # with a carried data dependency + output reduction (the DCE-proof
    # timing rule from tools/profile_roofline.py — the tunnel costs
    # ~0.5 s/dispatch, and XLA DCEs anything not feeding the output).
    R = args.reps

    @jax.jit
    def scanned(w):
        def body(carry, _):
            d, na = exported.call(carry)
            carry = carry + na.astype(jnp.float32).sum() * 1e-20
            return carry, d.sum()
        c, outs = jax.lax.scan(body, w, None, length=R)
        return outs.sum() + c.sum()

    rng = np.random.default_rng(1)
    for B in args.batches:
        w = rng.normal(size=(B, args.k, T, N, C)).astype(np.float32)
        t0 = time.perf_counter()
        d, _ = exported.call(w)
        np.asarray(jax.device_get(d))
        compile_s = time.perf_counter() - t0

        # end-to-end (host → decision → host), tunnel dispatch included
        t0 = time.perf_counter()
        for _ in range(3):
            d, _ = exported.call(w)
            np.asarray(jax.device_get(d))
        e2e = (time.perf_counter() - t0) / 3

        # scan-amortized on-device time
        wd = jax.device_put(jnp.asarray(w))
        np.asarray(jax.device_get(scanned(wd)))  # compile + warmup
        t0 = time.perf_counter()
        np.asarray(jax.device_get(scanned(wd)))
        dt = (time.perf_counter() - t0) / R

        print(json.dumps({
            "metric": "pcaa_serving_decision_latency",
            "batch": B,
            "k": args.k,
            "device_latency_ms": round(dt * 1e3, 2),
            "decisions_per_s": round(B / dt, 1),
            "crop_windows_per_s": round(B * args.k / dt, 1),
            "e2e_tunnel_latency_ms": round(e2e * 1e3, 1),
            "first_call_s": round(compile_s, 1),
        }))


if __name__ == "__main__":
    main()
