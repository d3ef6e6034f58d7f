#!/usr/bin/env python
"""Probe: does XLA:TPU overlap an HBM-bound fusion with an independent
MXU-bound fusion inside one jitted program?

PERF_ROOFLINE.md's ceiling analysis leaves exactly one lever standing:
cross-phase software pipelining — e.g. deferring the decoder's Adam
update (6.4 ms of pure HBM streaming over 215M params + moments) so it
runs data-independent of the next step's encoder forward (~3 ms of
MXU-bound matmuls) and hoping the scheduler executes them concurrently.
That hope rests on an architectural question this tool answers with a
measurement:

- task A: scan of KxK bf16 matmuls (compute-bound, negligible traffic);
- task B: scan of elementwise EMA updates over a large f32 buffer
  (HBM-bound, negligible FLOPs);
- combined: ONE jitted scan whose body contains both with independent
  carries and no data dependence between them.

If t_combined ~= max(t_A, t_B), the core overlaps DMA streams with MXU
compute across fusions and the pipelined-Adam restructure is worth
building. If t_combined ~= t_A + t_B, HLO fusions execute serially on
the core and the lever is dead — record the measured-negative and close
the ceiling analysis.

Timing per CLAUDE.md rules: length-K_SCAN lax.scan with carried data
deps AND full-tree-sum outputs; completion forced via device_get.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

K_SCAN = 32
MM = 4096          # matmul side: 2*MM^3 = 137 GFLOP/iter -> ~0.7 ms at peak
NBUF = 192 * 2**20  # f32 elements: 768 MB buffer, 1.5 GB rw/iter -> ~1.9 ms


def timeit(run, args, n=5):
    jax.device_get(run(*args))
    jax.device_get(run(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K_SCAN * 1e3


def mm_body(a, w):
    return jnp.tanh(a @ w)


def hbm_body(y):
    return y * jnp.float32(0.9990001) + jnp.float32(1e-7)


def make(mode):
    @jax.jit
    def run(a, w, y):
        def body(carry, _):
            ac, yc = carry
            if mode in ("mm", "both"):
                ac = mm_body(ac, w)
            if mode in ("hbm", "both"):
                yc = hbm_body(yc)
            return (ac, yc), None

        (ac, yc), _ = jax.lax.scan(body, (a, y), None, length=K_SCAN)
        return jnp.sum(ac.astype(jnp.float32)) + jnp.sum(yc)

    return run


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    # Materialize inputs ON DEVICE — a host upload of the HBM buffer over
    # the axon tunnel takes minutes and is not part of the measurement.
    mk = jax.jit(
        lambda: (
            jax.random.normal(jax.random.PRNGKey(0), (MM, MM), jnp.bfloat16)
            * 0.01,
            jax.random.normal(jax.random.PRNGKey(1), (MM, MM), jnp.bfloat16)
            * 0.01,
            jax.random.normal(jax.random.PRNGKey(2), (NBUF,), jnp.float32),
        )
    )
    a, w, y = jax.block_until_ready(mk())

    t_mm = timeit(make("mm"), (a, w, y))
    t_hbm = timeit(make("hbm"), (a, w, y))
    t_both = timeit(make("both"), (a, w, y))

    print(f"matmul-only      {t_mm:6.2f} ms/iter "
          f"({2 * MM**3 / (t_mm * 1e-3) / 1e12:.0f} TFLOPS)", flush=True)
    print(f"hbm-only         {t_hbm:6.2f} ms/iter "
          f"({8 * NBUF / (t_hbm * 1e-3) / 1e9:.0f} GB/s)", flush=True)
    print(f"combined         {t_both:6.2f} ms/iter "
          f"(serial sum {t_mm + t_hbm:.2f}, "
          f"perfect overlap {max(t_mm, t_hbm):.2f})", flush=True)
    frac = (t_mm + t_hbm - t_both) / min(t_mm, t_hbm)
    print(f"overlap achieved: {100 * frac:.0f}% of the smaller task hidden",
          flush=True)


if __name__ == "__main__":
    main()
