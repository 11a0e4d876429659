#!/usr/bin/env python
"""Render PARITY.md from the diffs recorded by tests/test_reference_parity.py.

Usage:
    python -m pytest tests/test_reference_parity.py -q   # writes .parity_diffs.json
    python tools/parity_report.py                        # renders PARITY.md
"""
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    src = os.path.join(REPO, ".parity_diffs.json")
    if not os.path.exists(src):
        raise SystemExit("run `pytest tests/test_reference_parity.py` first")
    with open(src) as f:
        diffs = json.load(f)

    lines = [
        "# PARITY — numeric agreement with the reference torch code",
        "",
        "Max absolute difference between `nopesac_tpu` (JAX, f32, CPU) and the",
        "reference's own modules imported from `/root/reference` (torch 2.13 CPU,",
        "detectron2/fvcore/quaternion stubbed by `tests/refstubs.py`), evaluated",
        "on identical random inputs — see `tests/test_reference_parity.py`.",
        "Module-level forwards share weights via `utils/torch_import.py`.",
        "",
        "| check (reference spec) | max abs diff |",
        "|---|---|",
    ]
    for name in sorted(diffs):
        lines.append(f"| {name} | {diffs[name]:.2e} |")
    lines += [
        "",
        "All checks assert `atol = rtol = tol` per entry in the test file;",
        "regenerate with the two commands in this file's docstring.",
        "",
    ]
    out = os.path.join(REPO, "PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out} ({len(diffs)} checks)")


if __name__ == "__main__":
    main()
