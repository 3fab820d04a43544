"""ctypes binding for the native C++ GrabCut.

The reference's only native dependency is OpenCV's C++ GrabCut
(ref: mask_for_dataset.py:69-80); this framework ships its own
implementation (GMM + Boykov-Kolmogorov max-flow, ``native/grabcut.cpp``)
built with g++ on first use and loaded via ctypes — no OpenCV required
for mask refinement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["native_grabcut", "build_native", "native_available"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "grabcut.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libadvshadow_grabcut.so")

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False

# OpenCV GC_* mask values
GC_BGD, GC_FGD, GC_PR_BGD, GC_PR_FGD = 0, 1, 2, 3


def build_native(force: bool = False) -> str:
    """Compile the shared library (idempotent). Returns the .so path."""
    if force or not os.path.exists(_LIB) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True,
        )
    return _LIB


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        path = build_native()
        lib = ctypes.CDLL(path)
        lib.advshadow_grabcut.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_double,
        ]
        lib.advshadow_grabcut.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_grabcut(
    image: np.ndarray,
    mask: np.ndarray,
    iter_count: int = 10,
    gamma: float = 50.0,
) -> np.ndarray:
    """cv2.grabCut(GC_INIT_WITH_MASK)-compatible segmentation.

    Args:
      image: [H, W, 3] uint8.
      mask: [H, W] uint8 with GC_* values; a refined copy is returned.
      iter_count: GrabCut iterations.
      gamma: n-link strength (OpenCV uses 50).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native grabcut library unavailable (g++ build "
                           "failed); use the cv2 path instead")
    img = np.ascontiguousarray(image, dtype=np.uint8)
    out = np.ascontiguousarray(mask, dtype=np.uint8).copy()
    h, w = out.shape
    rc = lib.advshadow_grabcut(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        iter_count, gamma,
    )
    if rc != 0:
        raise RuntimeError(f"native grabcut failed with code {rc}")
    return out
