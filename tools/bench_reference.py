#!/usr/bin/env python
"""Measure the PyTorch reference's training throughput under the same step
definition as bench.py (fwd+bwd+AdamW on 256px bitemporal s1s2 pairs,
Siamese U-Net [64,128,256,512]).

The reference repo's author hardware is unspecified CUDA (BASELINE.md);
this environment has CPU-only torch, so the measured number is a
host-CPU reference point, recorded with that caveat in BASELINE.md.

The model here is an independent torch implementation of the same
architecture spec (Siamese shared encoder, per-level feature differences,
transposed-conv decoder, (conv3x3-BN-ReLU)x2 blocks) written for this
benchmark — it reproduces the compute shape, not the reference's code.
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


class TorchSiameseUNetBench(nn.Module):
    """Compute-equivalent Siamese U-Net for throughput measurement."""

    def __init__(self, in_ch=6, topo=(64, 128, 256, 512)):
        super().__init__()
        widths = [topo[i + 1] if i + 1 < len(topo) else topo[i]
                  for i in range(len(topo))]
        self.inc = double_conv(in_ch, topo[0])
        self.downs = nn.ModuleList()
        prev = topo[0]
        for w in widths:
            self.downs.append(double_conv(prev, w))
            prev = w
        up_topo = [topo[0]] + widths
        self.ups = nn.ModuleList()
        self.up_convs = nn.ModuleList()
        for idx in reversed(range(len(topo))):
            x2_idx = idx - 1 if idx != 0 else idx
            in_dim = up_topo[idx] * 2
            self.up_convs.append(nn.ConvTranspose2d(in_dim // 2, in_dim // 2, 2, stride=2))
            self.ups.append(double_conv(in_dim, up_topo[x2_idx]))
        self.outc = nn.Conv2d(topo[0], 1, 1)
        self.pool = nn.MaxPool2d(2)

    def encode(self, x):
        feats = [self.inc(x)]
        for down in self.downs:
            feats.append(down(self.pool(feats[-1])))
        return feats[::-1]

    def forward(self, x1, x2):
        f1 = self.encode(x1)
        f2 = self.encode(x2)
        diffs = [b - a for a, b in zip(f1, f2)]
        x = diffs[0]
        for up_conv, up, skip in zip(self.up_convs, self.ups, diffs[1:]):
            x = up_conv(x)
            x = torch.cat([skip, x], dim=1)
            x = up(x)
        return self.outc(x)


def power_jaccard(logits, target):
    p = torch.sigmoid(logits).flatten()
    t = target.flatten()
    inter = (p * t).sum()
    denom = (p * p + t * t).sum() - inter + 1e-6
    return 1 - inter / denom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = TorchSiameseUNetBench().to(device).train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=0.01)

    rng = np.random.default_rng(0)
    x1 = torch.from_numpy(rng.uniform(0, 1, (args.batch_size, 6, args.crop, args.crop))
                          .astype(np.float32)).to(device)
    x2 = torch.from_numpy(rng.uniform(0, 1, (args.batch_size, 6, args.crop, args.crop))
                          .astype(np.float32)).to(device)
    y = torch.from_numpy((rng.uniform(0, 1, (args.batch_size, 1, args.crop, args.crop))
                          > 0.8).astype(np.float32)).to(device)

    def step():
        opt.zero_grad()
        loss = power_jaccard(model(x1, x2), y)
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
                      "value": round(pps, 3), "unit": "patches/sec",
                      "device": device,
                      "step_ms": round(dt / args.steps * 1e3, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
