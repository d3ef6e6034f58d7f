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

``--model orced`` benches the OR-CED artifact instead: encoder reparam
forward + decoder reconstruction + Chamfer on device
(``infer/serving.py::make_orced_forward_fn``), then the f64
hyperrectangle latent criterion + OR-ensemble rejection as a host
epilogue (``orced_decide_host``), per-crop rather than per-k-window.

Usage: python tools/bench_serving.py [--model pcaa orced] [--batches 1 8 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _export_pcaa(args, jax, jnp, jax_export):
    """→ (exported, make_inputs, windows_per_decision) at reference dims."""
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
    exported = _export_multi_platform(baked, [spec])

    rng = np.random.default_rng(1)

    def make_inputs(B):
        return (rng.normal(size=(B, args.k, T, N, C)).astype(np.float32),)

    return exported, make_inputs, args.k, None


def _export_orced(args, jax, jnp, jax_export):
    """OR-CED decision artifact at reference dims (random init/stats —
    the graph, hence the latency, is weight-independent).

    Unlike ``_export_pcaa`` (and the production ``export_orced_decision``,
    which bakes weights into a self-contained artifact for deployment
    sites where compilation is LOCAL), the bench export takes the encoder
    AND the 215M-parameter decoder variables as call ARGUMENTS: baked as
    module constants they make a ~860 MB StableHLO that the axon tunnel's
    remote compile chokes on (observed: broken pipe, then a 40-minute
    hang — the big-closure anti-pattern from ``infer/common.py``). The
    measured on-device decision path is identical — weights are resident
    in HBM either way.

    The graph is the device forward (``make_orced_forward_fn``); the f64
    OR-ensemble criterion runs as a host epilogue (4th return value), as
    in the production artifact — its per-batch numpy cost is measured and
    folded into the reported per-decision time."""
    from opensetgaitrecognition_pcaa_tpu.infer.serving import (
        _export_multi_platform,
        make_orced_forward_fn,
        orced_decide_host,
    )
    from opensetgaitrecognition_pcaa_tpu.models import (
        ORCEDDecoder,
        ORCEDEncoder,
    )

    T, N, C, LAT = 30, 150, 4, 32
    enc = ORCEDEncoder(
        n_out_labels=args.n_labels,
        sup_latent_dim=LAT,
        pointnet_out_dim=1024,
        dtc_filters=(16, 32, 64, 128, 256, 512),
    )
    dec = ORCEDDecoder(nsteps=T, nmax_points=N, nfeatures=C)
    x0 = jnp.zeros((2, T, N, C), jnp.float32)
    ev = enc.init(
        jax.random.PRNGKey(0), x0, train=False,
        eps=jnp.zeros((2, LAT), jnp.float32),
    )
    dv = dec.init(jax.random.PRNGKey(1), jnp.zeros((2, LAT), jnp.float32))
    srng = np.random.default_rng(0)
    means_z = srng.normal(size=(args.n_labels, LAT))
    stds_z = np.abs(srng.normal(size=(args.n_labels, LAT))) + 0.5
    thr_re = np.full((args.n_labels,), 1e9)
    forward = make_orced_forward_fn(enc, dec)
    ev_host, dv_host = jax.device_get((ev, dv))

    def with_args(x, eps, e_vars, d_vars):
        return forward(e_vars, d_vars, x, eps)

    def host_epilogue(preds, z, re):
        return orced_decide_host(
            preds, z, re, means_z, stds_z, thr_re, args.n_labels
        )

    spec_of = lambda a: jax.ShapeDtypeStruct(  # noqa: E731
        np.shape(a), jnp.asarray(a).dtype
    )
    (b,) = jax_export.symbolic_shape("b")
    specs = [
        jax.ShapeDtypeStruct((b, T, N, C), jnp.float32),
        jax.ShapeDtypeStruct((b, LAT), jnp.float32),
        jax.tree_util.tree_map(spec_of, ev_host),
        jax.tree_util.tree_map(spec_of, dv_host),
    ]
    exported = _export_multi_platform(with_args, specs)

    rng = np.random.default_rng(1)

    def make_inputs(B):
        return (
            rng.normal(size=(B, T, N, C)).astype(np.float32),
            rng.normal(size=(B, LAT)).astype(np.float32),
            ev_host,
            dv_host,
        )

    return exported, make_inputs, 1, host_epilogue


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=6)
    p.add_argument(
        "--model", nargs="+", choices=("pcaa", "orced"), default=["pcaa"]
    )
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

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev}", file=sys.stderr)

    for model in args.model:
        build = _export_pcaa if model == "pcaa" else _export_orced
        t0 = time.perf_counter()
        exported, make_inputs, wpd, epi = build(args, jax, jnp, jax_export)
        print(
            f"# {model} export trace: {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        run_bench(args, model, exported, make_inputs, wpd, jax, jnp, epi)


def run_bench(args, model, exported, make_inputs, windows_per_decision,
              jax, jnp, host_epilogue=None):
    # on-device per-decision time, dispatch-amortized: exported artifacts
    # are traceable inside jit, so reps run in ONE dispatch via lax.scan
    # with a carried data dependency + output reduction (the DCE-proof
    # timing rule from tools/profile_roofline.py — the tunnel costs
    # ~0.5 s/dispatch, and XLA DCEs anything not feeding the output).
    R = args.reps

    @jax.jit
    def scanned(*inputs):
        def body(carry, _):
            outs = exported.call(*carry)
            d, aux = outs[0], outs[1]
            first = carry[0] + aux.astype(jnp.float32).sum() * 1e-20
            return (first,) + tuple(carry[1:]), d.sum()
        c, outs = jax.lax.scan(body, tuple(inputs), None, length=R)
        return outs.sum() + c[0].sum()

    for B in args.batches:
        inputs = make_inputs(B)
        # weight pytrees (ORCED) go to the device ONCE — the e2e metric
        # times crop upload + decision + download, not an 860 MB weight
        # re-upload per call
        inputs = tuple(
            jax.device_put(a) if isinstance(a, dict) else a for a in inputs
        )
        t0 = time.perf_counter()
        d = exported.call(*inputs)[0]
        np.asarray(jax.device_get(d))
        compile_s = time.perf_counter() - t0

        # end-to-end (host → decision → host), tunnel dispatch + the host
        # f64 epilogue (ORCED) included
        t0 = time.perf_counter()
        for _ in range(3):
            outs = exported.call(*inputs)
            if host_epilogue is not None:
                host_epilogue(*jax.device_get(outs))
            else:
                np.asarray(jax.device_get(outs[0]))
        e2e = (time.perf_counter() - t0) / 3

        # host-epilogue cost alone (per batch), for the breakdown
        epi_ms = None
        if host_epilogue is not None:
            h_outs = jax.device_get(exported.call(*inputs))
            t0 = time.perf_counter()
            for _ in range(10):
                host_epilogue(*h_outs)
            epi_ms = (time.perf_counter() - t0) / 10 * 1e3

        # scan-amortized on-device time (tree_map: ORCED inputs carry the
        # weight pytrees as call arguments, see _export_orced)
        dev_inputs = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, tuple(inputs))
        )
        np.asarray(jax.device_get(scanned(*dev_inputs)))  # compile + warmup
        t0 = time.perf_counter()
        np.asarray(jax.device_get(scanned(*dev_inputs)))
        dt = (time.perf_counter() - t0) / R

        # per-decision time = scan-amortized device time + host epilogue
        total = dt + (0.0 if epi_ms is None else epi_ms / 1e3)
        print(json.dumps({
            "metric": f"{model}_serving_decision_latency",
            "batch": B,
            "k": args.k if model == "pcaa" else None,
            "device_latency_ms": round(dt * 1e3, 2),
            "host_epilogue_ms": (
                None if epi_ms is None else round(epi_ms, 3)
            ),
            "decisions_per_s": round(B / total, 1),
            "crop_windows_per_s": round(
                B * windows_per_decision / total, 1
            ),
            "e2e_tunnel_latency_ms": round(e2e * 1e3, 1),
            "first_call_s": round(compile_s, 1),
        }))


if __name__ == "__main__":
    main()
