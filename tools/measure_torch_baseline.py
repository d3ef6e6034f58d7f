#!/usr/bin/env python
"""Measure the reference-equivalent CPU PyTorch training throughput.

BASELINE.md's reproducible target is "≥20× full-split PCAA training speedup
vs CPU PyTorch on a single v5e chip, measured in point-cloud windows/sec" —
this script produces the denominator. It builds a PCAA-V4-equivalent torch
stack *procedurally* (same layer shapes/semantics as reference
``models.py``/``PCAA_ablation.py:746-1030``; no reference code) and times
full train steps (encoder fwd, WGAN-GP D-step with double backward, G-step
with Chamfer + adversarial + CE) at reference dims on CPU.

Writes BASELINE_MEASURED.json at the repo root; ``bench.py`` reads it.
"""

import json
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

B, T, N, C = 16, 30, 150, 4
LATENT, NCLS = 32, 8
DEC_SIZE = T * N * C


def make_encoder():
    pn_dims = [C, 512, 512, 1024, 1024]
    pn = []
    for i, o in zip(pn_dims[:-1], pn_dims[1:]):
        pn += [nn.Conv2d(i, o, 1), nn.BatchNorm2d(o), nn.ELU()]
    tcn_specs = [(1024, 16, 1), (16, 32, 2), (32, 64, 4), (64, 128, 1), (128, 256, 2), (256, 512, 4)]

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.pn = nn.Sequential(*pn)
            self.tcn = nn.ModuleList()
            self.tcn_bn = nn.ModuleList()
            self.pads = []
            for i, o, d in tcn_specs:
                self.tcn.append(nn.Conv1d(i, o, 3, dilation=d, padding=2 * d))
                self.tcn_bn.append(nn.BatchNorm1d(o))
                self.pads.append(2 * d)
            self.sup1 = nn.Linear(512, LATENT)
            self.head = nn.Linear(LATENT, LATENT // 2)
            self.sup2 = nn.Linear(LATENT // 2, NCLS)

        def forward(self, x):  # x: (B, C, T, N)
            h = self.pn(x).mean(dim=3)  # (B, 1024, T)
            for conv, bn, p in zip(self.tcn, self.tcn_bn, self.pads):
                h = F.elu(bn(conv(h)[:, :, :-p]))
            h = h.mean(dim=2)
            fv = F.elu(self.sup1(h))
            logits = F.elu(self.sup2(F.elu(self.head(fv))))
            return logits, fv

    return Enc()


def make_decoder():
    sizes = [LATENT * 2, DEC_SIZE // 16, DEC_SIZE // 8, DEC_SIZE // 4, DEC_SIZE // 2, DEC_SIZE]
    layers = []
    for i, o in zip(sizes[:-1], sizes[1:-1]):
        layers += [nn.Linear(i, o), nn.ELU()]
    layers.append(nn.Linear(sizes[-2], sizes[-1]))
    return nn.Sequential(*layers)


def chamfer(preds, gts):
    # (B, C, T, N) -> (B, T, N, C)
    x = gts.permute(0, 2, 3, 1)
    y = preds.permute(0, 2, 3, 1)
    xx = (x * x).sum(-1)
    yy = (y * y).sum(-1)
    xy = torch.matmul(x, y.transpose(2, 3))
    P = xx[..., :, None] + yy[..., None, :] - 2 * xy
    return (P.min(2).values.sum(2) + P.min(3).values.sum(2)).mean()


def main(n_steps=3):
    torch.manual_seed(0)
    enc = make_encoder()
    dec = make_decoder()
    dec_head = nn.Sequential(nn.Linear(LATENT, LATENT * 2), nn.ELU())
    disc = nn.Sequential(
        nn.Linear(LATENT + NCLS, 64), nn.ELU(), nn.Linear(64, 32), nn.ELU(), nn.Linear(32, 1)
    )
    opt_g = torch.optim.Adam(
        list(enc.parameters()) + list(dec.parameters()) + list(dec_head.parameters()),
        lr=1e-4, betas=(0.9, 0.99),
    )
    opt_d = torch.optim.Adam(disc.parameters(), lr=1e-4, betas=(0.9, 0.99))
    ce = nn.CrossEntropyLoss()
    means = torch.randn(NCLS, LATENT) * 10

    x = torch.randn(B, C, T, N)
    labels = torch.randint(0, NCLS, (B,))

    def step():
        logits, fv = enc(x)
        oh = F.one_hot(labels, NCLS).float()
        # D step with gradient penalty (double backward)
        opt_d.zero_grad()
        z = (torch.randn(B, LATENT) + oh @ means).detach().requires_grad_(True)
        fake = fv.detach()
        real_l = disc(torch.cat([z, oh], 1))
        fake_l = disc(torch.cat([fake, oh], 1))
        alphas = torch.rand(B, 1).repeat(1, LATENT)
        inter = z + alphas * (fake - z)
        d_inter = disc(torch.cat([inter, oh], 1))
        grads = torch.autograd.grad(d_inter, inter, torch.ones_like(d_inter), create_graph=True)[0]
        gp = ((grads.norm(2, dim=1) - 1) ** 2).mean()
        d_loss = fake_l.mean() - real_l.mean() + 15 * gp
        d_loss.backward()
        opt_d.step()
        # G step
        opt_g.zero_grad()
        rec = dec(dec_head(fv)).view(B, C, T, N)
        loss = chamfer(rec, x) - disc(torch.cat([fv, oh], 1)).mean() + ce(logits, labels)
        loss.backward()
        opt_g.step()

    step()  # warmup
    t0 = time.time()
    for _ in range(n_steps):
        step()
    dt = (time.time() - t0) / n_steps
    wps = B / dt
    out = {
        "torch_cpu_step_seconds": dt,
        "torch_cpu_windows_per_sec": wps,
        "batch_size": B,
        "shape": [B, C, T, N],
        "threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
