#!/usr/bin/env python
"""Encoder sub-component timing on the real TPU (scan-amortized, same
methodology as tools/profile_roofline.py). Findings (v5e, B=16, bf16,
2026-08-16):

    pointnet fwd:                   3.05 ms
    pointnet fwd+bwd:               8.68 ms   <- 93% of the encoder
    pointnet fwd+bwd under remat:   8.93 ms   (rematerialization: no win)
    dense+elu chain (no BN) f+b:    5.51 ms   (~36% MXU efficiency)
    tcn fwd+bwd:                    0.49 ms
    full encoder fwd+bwd:           9.28 ms

i.e. the per-point MLP dominates; BatchNorm adds ~3.2 ms (extra stat
reductions + normalize passes over the 442 MB activation set), and even
the BN-free matmul chain runs well below MXU peak at these shapes
(72k rows x K<=1024 with a K=4 first layer). The fused train-mode Pallas
pipeline already measured slower (CLAUDE.md), and remat is measured
neutral here - the remaining angle is a hand-fused fwd+bwd kernel, which
the fused-Adam experiment suggests would fight XLA's existing fusion.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from opensetgaitrecognition_pcaa_tpu.models.layers import PointNetBlock, TemporalConvBlock
from opensetgaitrecognition_pcaa_tpu.models.pcaa import CGEncoder
from opensetgaitrecognition_pcaa_tpu.ops import cross_entropy

K = 64
def tree_sum(t):
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(t))

def timeit(run, args, k=K, n=3):
    jax.device_get(run(*args)); jax.device_get(run(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); jax.device_get(run(*args)); ts.append(time.perf_counter()-t0)
    return float(np.median(ts))/k*1e3

B,T,N,C,D = 16,30,150,4,1024
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B,T,N,C)).astype(np.float32))
y = jnp.asarray(rng.integers(0,8,B,dtype=np.int32))
dt = jnp.bfloat16

pn = PointNetBlock(D, dtype=dt)
pv = pn.init(jax.random.PRNGKey(0), x, True)

def scan_time(body):
    @jax.jit
    def run(*args):
        c,_ = jax.lax.scan(lambda c,_: (body(c,*args),None), jnp.float32(0.), None, length=K)
        return c
    return run

# 1. pointnet fwd only (train mode, mutable BN)
def pn_fwd(c, params, bs, x):
    out, nbs = pn.apply({"params":params,"batch_stats":bs}, x + c*0, True, mutable=["batch_stats"])
    return (tree_sum(out)+tree_sum(nbs))*1e-12
t_pn_fwd = timeit(scan_time(pn_fwd), (pv["params"], pv["batch_stats"], x))

# 2. pointnet fwd+bwd
def pn_fb(c, params, bs, x):
    def loss(p, xc):
        out,_ = pn.apply({"params":p,"batch_stats":bs}, xc, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32)*1e-6)
    g = jax.grad(loss)(params, x + c*0)
    return tree_sum(g)*1e-12
t_pn_fb = timeit(scan_time(pn_fb), (pv["params"], pv["batch_stats"], x))

# 3. pointnet fwd+bwd WITH REMAT
def pn_fb_remat(c, params, bs, x):
    @functools.partial(jax.checkpoint)
    def fwd(p, xc):
        out,_ = pn.apply({"params":p,"batch_stats":bs}, xc, True, mutable=["batch_stats"])
        return out
    def loss(p, xc):
        return jnp.sum(fwd(p, xc).astype(jnp.float32)*1e-6)
    g = jax.grad(loss)(params, x + c*0)
    return tree_sum(g)*1e-12
t_pn_remat = timeit(scan_time(pn_fb_remat), (pv["params"], pv["batch_stats"], x))

# 4. pure dense+elu chain (no BN) fwd+bwd
wdims = [(C,D//2),(D//2,D//2),(D//2,D),(D,D)]
Ws = [jnp.asarray(rng.normal(size=s).astype(np.float32)*0.02) for s in wdims]
def chain_fb(c, Ws, x):
    def loss(ws, xc):
        h = xc.astype(dt)
        for w in ws:
            h = jax.nn.elu(jnp.einsum("btnc,cd->btnd", h, w.astype(dt)))
        return jnp.sum(h.astype(jnp.float32)*1e-6)
    g = jax.grad(loss)(Ws, x + c*0)
    return tree_sum(g)*1e-12
t_chain_fb = timeit(scan_time(chain_fb), (Ws, x))

# 5. TCN fwd+bwd alone
tc = TemporalConvBlock(dtype=dt)
xt = jnp.asarray(rng.normal(size=(B,T,D)).astype(np.float32))
tv = tc.init(jax.random.PRNGKey(1), xt, True)
def tc_fb(c, params, bs, xt):
    def loss(p, xc):
        out,_ = tc.apply({"params":p,"batch_stats":bs}, xc, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32)*1e-6)
    g = jax.grad(loss)(params, xt + c*0)
    return tree_sum(g)*1e-12
t_tc_fb = timeit(scan_time(tc_fb), (tv["params"], tv["batch_stats"], xt))

# 6. full encoder fwd+bwd with remat on the pointnet? -> full encoder CE loss grad
enc = CGEncoder(n_out_labels=8, use_projection_head=True, dtype=dt)
ev = enc.init(jax.random.PRNGKey(2), x, True)
def enc_fb(c, params, bs, x, y):
    def loss(p, xc):
        (logits, fv), _ = enc.apply({"params":p,"batch_stats":bs}, xc, True, mutable=["batch_stats"])
        return cross_entropy(logits, y) + jnp.sum(fv*fv)*0.0
    g = jax.grad(loss)(params, x + c*0)
    return tree_sum(g)*1e-12
t_enc_fb = timeit(scan_time(enc_fb), (ev["params"], ev["batch_stats"], x, y))

for k,v in [("pointnet fwd",t_pn_fwd),("pointnet fwd+bwd",t_pn_fb),
            ("pointnet fwd+bwd remat",t_pn_remat),
            ("dense+elu chain (noBN) fwd+bwd",t_chain_fb),
            ("tcn fwd+bwd",t_tc_fb),("full encoder fwd+bwd",t_enc_fb)]:
    print(f"{k}: {v:.2f} ms", flush=True)
