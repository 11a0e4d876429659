"""ctypes loader for the native RLE codec (nopesac_tpu/csrc/rle.cc).

The shared library is built on demand at first use (single g++ invocation,
~1 s) so the C++ codec is the default path in tests, bench, and eval alike;
`make -C nopesac_tpu/csrc` still works for explicit builds. Set
NOPESAC_NO_NATIVE_BUILD=1 to suppress the auto-build (rle.py then uses its
pure-python implementation).
"""
from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np

_LIB = None
_BUILD_TRIED = False


def _try_build(target: str) -> None:
    """Compile csrc/rle.cc -> target atomically (tempfile + rename).

    Atomic rename makes concurrent builders (pytest workers, forked eval
    pools) race-safe: last writer wins, every reader sees a complete .so.
    """
    global _BUILD_TRIED
    if _BUILD_TRIED or os.environ.get("NOPESAC_NO_NATIVE_BUILD"):
        return
    _BUILD_TRIED = True
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "csrc", "rle.cc")
    cxx = os.environ.get("CXX", "g++")
    if not os.path.exists(src) or shutil.which(cxx) is None:
        return
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(target))
    os.close(fd)
    try:
        subprocess.run(
            [cxx, "-O3", "-fPIC", "-std=c++17", "-shared", "-o", tmp, src],
            check=True, capture_output=True, timeout=120,
        )
        os.rename(tmp, target)
    except (subprocess.SubprocessError, OSError):
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, "libnopesac_native.so"),
        os.path.join(here, "..", "csrc", "libnopesac_native.so"),
    ]
    if not any(os.path.exists(p) for p in candidates):
        _try_build(candidates[0])
    for path in candidates:
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.rle_encode.restype = ctypes.c_int64
            lib.rle_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_char_p,
            ]
            lib.rle_decode.restype = None
            lib.rle_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.rle_iou.restype = None
            lib.rle_iou.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
            ]
            lib.rle_area.restype = ctypes.c_int64
            lib.rle_area.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            # optional (newer builds): raw runs -> COCO string
            if hasattr(lib, "rle_runs_to_string"):
                lib.rle_runs_to_string.restype = ctypes.c_int64
                lib.rle_runs_to_string.argtypes = [
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                    ctypes.c_char_p,
                ]
            _LIB = lib
            return lib
    raise OSError("libnopesac_native.so not built")


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def encode(flat_colmajor: np.ndarray, h: int, w: int) -> bytes:
    lib = _load()
    flat = np.ascontiguousarray(flat_colmajor, dtype=np.uint8)
    out = ctypes.create_string_buffer(6 * h * w + 16)
    n = lib.rle_encode(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, out)
    return out.raw[:n]


def decode(counts: bytes, h: int, w: int) -> np.ndarray:
    lib = _load()
    out = np.empty(h * w, dtype=np.uint8)
    lib.rle_decode(counts, len(counts), h, w,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def iou(dts: list, gts: list, h: int, w: int, iscrowd: np.ndarray) -> np.ndarray:
    lib = _load()
    dcat = b"".join(dts)
    gcat = b"".join(gts)
    doff = np.zeros(len(dts) + 1, np.int64)
    np.cumsum([len(d) for d in dts], out=doff[1:])
    goff = np.zeros(len(gts) + 1, np.int64)
    np.cumsum([len(g) for g in gts], out=goff[1:])
    out = np.zeros((len(dts), len(gts)), np.float64)
    crowd = np.ascontiguousarray(iscrowd, np.uint8)
    lib.rle_iou(
        dcat, doff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(dts),
        gcat, goff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(gts),
        crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def area(counts: bytes) -> int:
    lib = _load()
    return int(lib.rle_area(counts, len(counts)))


def runs_to_string(runs: np.ndarray):
    """Raw run-length counts -> COCO LEB string bytes, or None when the
    loaded library predates rle_runs_to_string."""
    lib = _load()
    if not hasattr(lib, "rle_runs_to_string"):
        return None
    r = np.ascontiguousarray(runs, dtype=np.int64)
    out = ctypes.create_string_buffer(12 * max(len(r), 1) + 16)
    n = lib.rle_runs_to_string(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(r), out)
    return out.raw[:n]
