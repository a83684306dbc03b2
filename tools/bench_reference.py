#!/usr/bin/env python
"""Measure the PyTorch reference's training throughput under the same step
definitions as bench.py (fwd+bwd+AdamW on 256px bitemporal s1s2 pairs):

  supervised      Siamese U-Net [64,128,256,512]   (reference networks.py:93)
  dualtask        DualTaskSiameseUNet (3 decoder passes, networks.py:157-197)
  semisupervised  WhateverNet (2 per-modality Siamese streams + fusion,
                  networks.py:200-263), sup + consistency loss composition
                  of train_semisupervised.py:85-113 (alpha=0.1, PowerJaccard)

The reference repo's author hardware is unspecified CUDA (BASELINE.md);
this environment has CPU-only torch, so the measured number is a
host-CPU reference point, recorded with that caveat in BASELINE.md.

The models here are independent torch implementations of the same
architecture specs written for this benchmark — they reproduce the compute
shape, not the reference's code.
"""

import argparse
import json
import sys
import time

import numpy as np
import torch
import torch.nn as nn


def double_conv(cin, cout):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(True),
        nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(True),
    )


def encoder_widths(topo):
    return [topo[i + 1] if i + 1 < len(topo) else topo[i]
            for i in range(len(topo))]


class BenchEncoder(nn.Module):
    """inc + down ladder; returns features deepest-first."""

    def __init__(self, in_ch, topo):
        super().__init__()
        self.inc = double_conv(in_ch, topo[0])
        self.downs = nn.ModuleList()
        prev = topo[0]
        for w in encoder_widths(topo):
            self.downs.append(double_conv(prev, w))
            prev = w
        self.pool = nn.MaxPool2d(2)

    def forward(self, x):
        feats = [self.inc(x)]
        for down in self.downs:
            feats.append(down(self.pool(feats[-1])))
        return feats[::-1]


class BenchDecoder(nn.Module):
    """up ladder consuming a deepest-first feature list."""

    def __init__(self, topo):
        super().__init__()
        up_topo = [topo[0]] + encoder_widths(topo)
        self.ups = nn.ModuleList()
        self.up_convs = nn.ModuleList()
        for idx in reversed(range(len(topo))):
            x2_idx = idx - 1 if idx != 0 else idx
            in_dim = up_topo[idx] * 2
            self.up_convs.append(
                nn.ConvTranspose2d(in_dim // 2, in_dim // 2, 2, stride=2))
            self.ups.append(double_conv(in_dim, up_topo[x2_idx]))

    def forward(self, feats):
        x = feats[0]
        for up_conv, up, skip in zip(self.up_convs, self.ups, feats[1:]):
            x = up_conv(x)
            x = torch.cat([skip, x], dim=1)
            x = up(x)
        return x


class TorchSiameseUNetBench(nn.Module):
    """Compute-equivalent Siamese U-Net for throughput measurement."""

    def __init__(self, in_ch=6, topo=(64, 128, 256, 512)):
        super().__init__()
        self.encoder = BenchEncoder(in_ch, topo)
        self.decoder = BenchDecoder(topo)
        self.outc = nn.Conv2d(topo[0], 1, 1)

    def forward(self, x1, x2):
        f1 = self.encoder(x1)
        f2 = self.encoder(x2)
        diffs = [b - a for a, b in zip(f1, f2)]
        return self.outc(self.decoder(diffs))


class TorchDualTaskBench(nn.Module):
    """Compute-equivalent DualTaskSiameseUNet (reference networks.py:157-197):
    shared Siamese encoder, change decoder over per-level diffs, one shared
    semantic decoder applied to each timestamp's features (3 decoder passes
    total)."""

    def __init__(self, in_ch=6, topo=(64, 128, 256, 512)):
        super().__init__()
        self.encoder = BenchEncoder(in_ch, topo)
        self.decoder_change = BenchDecoder(topo)
        self.decoder_sem = BenchDecoder(topo)
        self.outc_change = nn.Conv2d(topo[0], 1, 1)
        self.outc_sem = nn.Conv2d(topo[0], 1, 1)

    def forward(self, x1, x2):
        f1 = self.encoder(x1)
        f2 = self.encoder(x2)
        diffs = [b - a for a, b in zip(f1, f2)]
        out_change = self.outc_change(self.decoder_change(diffs))
        out_sem_t1 = self.outc_sem(self.decoder_sem(f1))
        out_sem_t2 = self.outc_sem(self.decoder_sem(f2))
        return out_change, out_sem_t1, out_sem_t2


class TorchWhateverNetBench(nn.Module):
    """Compute-equivalent WhateverNet (reference networks.py:200-263): two
    per-modality Siamese streams (S1 2-band, S2 4-band), per-stream heads,
    fusion head over concatenated pre-head decoder features."""

    def __init__(self, n_s1=2, n_s2=4, topo=(64, 128, 256, 512)):
        super().__init__()
        self.n_s1 = n_s1
        for name, cin in (("s1", n_s1), ("s2", n_s2)):
            setattr(self, f"encoder_{name}", BenchEncoder(cin, topo))
            setattr(self, f"decoder_{name}", BenchDecoder(topo))
            setattr(self, f"outc_{name}", nn.Conv2d(topo[0], 1, 1))
        self.outc_fusion = nn.Conv2d(2 * topo[0], 1, 1)

    def forward(self, x1, x2):
        k = self.n_s1

        def stream(name, a, b):
            enc = getattr(self, f"encoder_{name}")
            fa, fb = enc(a), enc(b)
            d = getattr(self, f"decoder_{name}")(
                [y - x for x, y in zip(fa, fb)])
            return d, getattr(self, f"outc_{name}")(d)

        d1, out_s1 = stream("s1", x1[:, :k], x2[:, :k])
        d2, out_s2 = stream("s2", x1[:, k:], x2[:, k:])
        out_fusion = self.outc_fusion(torch.cat([d1, d2], dim=1))
        return out_fusion, out_s1, out_s2


def power_jaccard(logits, target, mask=None):
    p = torch.sigmoid(logits)
    t = target
    if mask is not None:
        m = mask.view(-1, *([1] * (p.dim() - 1)))
        p, t = p * m, t * m
    p, t = p.flatten(), t.flatten()
    inter = (p * t).sum()
    denom = (p * p + t * t).sum() - inter + 1e-6
    return 1 - inter / denom


def make_loss(regime, batch_size, device):
    """Mirror each regime's loss composition. bench.py runs all-labeled
    batches, so the semisup consistency term carries a zero mask — but the
    term (and its backward) still executes, matching the masked-reduction
    XLA graph."""
    alpha = 0.1  # CONSISTENCY_TRAINER.LOSS_FACTOR (configs/base.yaml)
    lab = torch.ones(batch_size, device=device)
    unlab = 1.0 - lab

    if regime == "supervised":
        return lambda out, y: power_jaccard(out, y)
    if regime == "dualtask":
        def dualtask_loss(out, y):
            change, sem1, sem2 = out
            sem = (power_jaccard(sem1, y) + power_jaccard(sem2, y)) / 2
            return (power_jaccard(change, y) + sem) / 2
        return dualtask_loss

    def semisup_loss(out, y):
        fusion, s1, s2 = out
        sup = alpha * (power_jaccard(fusion, y, lab)
                       + power_jaccard(s1, y, lab)
                       + power_jaccard(s2, y, lab)) / 3
        cons = (1 - alpha) * power_jaccard(s1, torch.sigmoid(s2), unlab)
        return lab.max() * sup + unlab.max() * cons
    return semisup_loss


REGIME_MODELS = {
    "supervised": TorchSiameseUNetBench,
    "dualtask": TorchDualTaskBench,
    "semisupervised": TorchWhateverNetBench,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--regime", default="supervised",
                    choices=list(REGIME_MODELS))
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = REGIME_MODELS[args.regime]().to(device).train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=0.01)
    loss_fn = make_loss(args.regime, args.batch_size, device)

    rng = np.random.default_rng(0)
    x1 = torch.from_numpy(rng.uniform(0, 1, (args.batch_size, 6, args.crop, args.crop))
                          .astype(np.float32)).to(device)
    x2 = torch.from_numpy(rng.uniform(0, 1, (args.batch_size, 6, args.crop, args.crop))
                          .astype(np.float32)).to(device)
    y = torch.from_numpy((rng.uniform(0, 1, (args.batch_size, 1, args.crop, args.crop))
                          > 0.8).astype(np.float32)).to(device)

    def step():
        opt.zero_grad()
        loss = loss_fn(model(x1, x2), y)
        loss.backward()
        opt.step()

    for _ in range(args.warmup):
        step()
    if device == "cuda":
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    if device == "cuda":
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0
    pps = args.batch_size * args.steps / dt
    print(json.dumps({"metric": "torch_reference_patches_per_sec",
                      "regime": args.regime,
                      "value": round(pps, 3), "unit": "patches/sec",
                      "device": device,
                      "step_ms": round(dt / args.steps * 1e3, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
