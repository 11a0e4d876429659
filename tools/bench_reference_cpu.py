#!/usr/bin/env python
"""Measure the REFERENCE NopeSAC model's inference rate, torch CPU, bs=1.

The reference repo publishes no throughput numbers (BASELINE.md) and no GPU
exists in this environment, so this harness times the reference's OWN
modules (imported from /root/reference with detectron2 stubbed by
tests/refstubs.py) on this host's CPU:

    R50 backbone x2 -> PlaneTRHead x2 -> PlaneCameraHead.inference_Joint
    (PixelCameraHead + MatchingHead GNN/Sinkhorn + NOPE-SAC refine)

at the reference's enforced inference setting (batch=1 single-stream,
siamese_planeTR.py:340, 480x640). The backbone is the one module that lives
in the detectron2 *dependency* rather than the reference repo, so an
architecturally-identical torch ResNet-50 (d2 layout: caffe stride-in-1x1
bottlenecks, frozen BN as eval-mode BN) stands in for it; everything else
is the reference's own code. Host-side postprocessing (RLE, instance dict
assembly) is excluded on both sides of any comparison.

Writes reference_cpu_bench.json next to BASELINE.md. Run once:
    python tools/bench_reference_cpu.py [--pairs 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, _REPO)

import refstubs  # noqa: F401  (stubs detectron2/fvcore/quaternion, adds /root/reference)
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.Tensor.cuda = lambda self, *a, **k: self  # reference hardcodes .cuda()


# --------------------------------------------------------------------------
# d2-layout ResNet-50 (stand-in for the detectron2 dependency's backbone;
# structure per utils/torch_import._resnet_mapping: stem conv1 7x7/s2+BN,
# maxpool, res2..res5 bottlenecks with caffe stride-in-1x1)
# --------------------------------------------------------------------------
class Bottleneck(nn.Module):
    def __init__(self, cin, cmid, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cmid, 1, stride=stride, bias=False)
        self.bn1 = nn.BatchNorm2d(cmid)
        self.conv2 = nn.Conv2d(cmid, cmid, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cmid)
        self.conv3 = nn.Conv2d(cmid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.short = None
        if cin != cout or stride != 1:
            self.short = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.short is None else self.short(x)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))
        return F.relu(x + idn)


class ResNet50D2(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64), nn.ReLU(),
            nn.MaxPool2d(3, stride=2, padding=1))
        chans = [(64, 64, 256), (256, 128, 512), (512, 256, 1024), (1024, 512, 2048)]
        blocks = [3, 4, 6, 3]
        self.stages = nn.ModuleList()
        for si, ((cin, cmid, cout), n) in enumerate(zip(chans, blocks)):
            stage = [Bottleneck(cin, cmid, cout, 1 if si == 0 else 2)]
            stage += [Bottleneck(cout, cmid, cout, 1) for _ in range(n - 1)]
            self.stages.append(nn.Sequential(*stage))

    def forward(self, x):
        x = self.stem(x)
        out = {}
        for i, stage in enumerate(self.stages):
            x = stage(x)
            out[f"res{i + 2}"] = x
        return out


def build_reference(cfg):
    from detectron2.layers import ShapeSpec

    from NopeSAC_Net.modeling.planeTR_net.planeTR_head import PlaneTRHead
    from NopeSAC_Net.modeling.camera_net.camera_head import PlaneCameraHead
    from NopeSAC_Net.modeling.matching_net.matching_head import MatchingHead

    shape = {f"res{i}": ShapeSpec(channels=c, stride=s)
             for i, c, s in ((2, 256, 4), (3, 512, 8), (4, 1024, 16), (5, 2048, 32))}
    backbone = ResNet50D2().eval()
    plane_head = PlaneTRHead(cfg, shape).eval()
    camera_head = PlaneCameraHead(cfg, shape).eval()
    matching = MatchingHead(cfg).eval()
    return backbone, plane_head, camera_head, matching


@torch.no_grad()
def run_pair(mods, img0, img1, n_planes=20):
    """One reference inference pair: siamese detection + full NOPE-SAC pose."""
    backbone, plane_head, camera_head, matching = mods
    f1 = backbone(img0)
    f2 = backbone(img1)
    out1, q1 = plane_head(f1)
    out2, q2 = plane_head(f2)
    # plane selection stand-in: top-k queries by class prob (the reference's
    # _postprocess does thresholding + RLE on host; excluded from timing
    # scope on both sides)
    p1 = out1["pred_params"][:, :n_planes]
    p2 = out2["pred_params"][:, :n_planes]
    a1 = q1[:, :n_planes]
    a2 = q2[:, :n_planes]
    cams, trans_list, rot_list, _, _, _ = camera_head(
        f1, f2, p1, p2, planeApp1=a1, planeApp2=a2, matching_net=matching)
    return cams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()

    from nopesac_tpu.config.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.EMBEDDING_ON = True   # plane matcher on -> full refine path
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CAMERA_HEAD.CAM_REC_ON = True
    cfg.MODEL.CAMERA_HEAD.REFINE_ON = True
    cfg.MODEL.SEM_SEG_HEAD.PARAM_ON = True
    cfg.MODEL.SEM_SEG_HEAD.CENTER_ON = True
    torch.manual_seed(0)
    mods = build_reference(cfg)

    rng = np.random.default_rng(0)
    mk = lambda: torch.from_numpy(
        rng.normal(size=(1, 3, args.height, args.width)).astype(np.float32))

    # warmup
    run_pair(mods, mk(), mk())
    t0 = time.perf_counter()
    for _ in range(args.pairs):
        run_pair(mods, mk(), mk())
    dt = time.perf_counter() - t0
    pairs_per_sec = args.pairs / dt

    out = {
        "metric": "reference_cpu_pair_inference_throughput",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/sec (torch CPU, bs=1, reference's own modules)",
        "pairs": args.pairs,
        "seconds_per_pair": round(dt / args.pairs, 2),
        "note": "backbone is an architecturally-identical torch R50 stand-in "
                "for the d2 dependency; all heads are the reference's code",
    }
    path = os.path.join(_REPO, "reference_cpu_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
