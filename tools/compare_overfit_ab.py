#!/usr/bin/env python
"""Summarise the Pallas-mask-loss precision A/B overfit runs.

Usage: python tools/compare_overfit_ab.py output/overfit_ab_pallas output/overfit_ab_naive

Prints a step-by-step table of the detection losses (the quantities the
bf16-upsample kernel touches: loss_mask / loss_dice / loss_ce) from each
run's metrics.json, plus both final eval blocks — the evidence for PERF.md's
"mask-loss precision A/B" (VERDICT round-3 item 7).
"""
import json
import sys


def load(d):
    rows, ev = [], None
    with open(f"{d}/metrics.json") as fh:
        for line in fh:
            r = json.loads(line)
            if "eval" in r:
                ev = r["eval"]
            elif "loss_mask" in r:
                rows.append(r)
    return rows, ev


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    a, a_ev = load(a_dir)
    b, b_ev = load(b_dir)
    keys = ["loss_mask", "loss_dice", "loss_ce", "total_loss"]
    print(f"{'iter':>5} | " + " | ".join(f"{k:>22}" for k in keys))
    print(f"{'':>5} | " + " | ".join(f"{'pallas':>10} {'naive':>11}" for _ in keys))
    bs = {r["iteration"]: r for r in b}
    for r in a:
        it = r["iteration"]
        if it not in bs:
            continue
        cells = " | ".join(
            f"{r[k]:10.4f} {bs[it][k]:11.4f}" for k in keys)
        print(f"{it:5d} | {cells}")
    for name, ev in [("pallas", a_ev), ("naive", b_ev)]:
        if ev:
            sel = {k: ev[k] for k in
                   ["mask_ap@0.5", "plane_ap@iou0.5normal30.0offset0.3",
                    "R median err", "T median err", "F-score"] if k in ev}
            print(f"final eval [{name}]: {sel}")


if __name__ == "__main__":
    main()
