#!/usr/bin/env python
"""One-time converter: legacy sklearn/spherecluster kmeans pickles -> .npz.

The reference ships camera pose bins as sklearn-0.21 KMeans /
spherecluster SphericalKMeans pickles (camCls/*.pkl, consumed by
planercnn_transforms.py:408-420). Those cannot be unpickled with a modern
sklearn, so we extract the only thing the pipeline needs - the
cluster_centers_ arrays - into plain .npz files. Nearest-centre predict is a
10-line numpy function (nopesac_tpu/data/cam_bins.py).

Usage: python tools/extract_camcls.py <src_dir> <dst_dir>
"""
import os
import pickle
import sys

import numpy as np


class _StubUnpickler(pickle.Unpickler):
    """Unpickler that stubs out missing sklearn/spherecluster classes and
    keeps their __dict__ so we can read cluster_centers_."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:

            class Stub:
                def __setstate__(self, state):
                    if isinstance(state, dict):
                        self.__dict__.update(state)

            Stub.__name__ = name
            return Stub


def extract(src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    names = [
        ("kmeans_trans_32.pkl", "mp3d_trans_centers"),
        ("kmeans_rots_32.pkl", "mp3d_rots_centers"),
        ("scannet_kmeans_trans_32.pkl", "scannet_trans_centers"),
        ("scannet_kmeans_rots_32.pkl", "scannet_rots_centers"),
    ]
    out = {}
    for fname, key in names:
        path = os.path.join(src_dir, fname)
        if not os.path.exists(path):
            print(f"skip (missing): {path}")
            continue
        with open(path, "rb") as f:
            obj = _StubUnpickler(f).load()
        centers = np.asarray(obj.cluster_centers_, dtype=np.float64)
        out[key] = centers
        print(f"{fname}: {centers.shape}")
    dst = os.path.join(dst_dir, "cam_bins.npz")
    np.savez(dst, **out)
    print(f"wrote {dst}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/camCls"
    dst = sys.argv[2] if len(sys.argv) > 2 else "camCls"
    extract(src, dst)
