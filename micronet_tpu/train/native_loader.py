"""ctypes bindings for the native host runtime (native/micronet_host.cpp).

Gives the input pipeline a no-GIL multi-threaded batch gather and a
CIFAR-10 *binary* format loader. Falls back to numpy transparently when
the shared library has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "gather_u8", "load_cifar_bin", "kl_thresholds_batch"]

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_LIB_PATHS = (
    os.path.join(_NATIVE_DIR, "libmicronet_host.so"),
    os.environ.get("MICRONET_HOST_LIB", ""),
)


def _ensure_built(lib_path: str) -> None:
    """(Re)build the .so when missing or older than its source — the
    binary is not committed, so staleness cannot hide behind dlopen
    succeeding on an outdated artifact."""
    src = os.path.join(_NATIVE_DIR, "micronet_host.cpp")
    if not os.path.exists(src):
        return
    if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass  # numpy fallback below


_lib = None
_ensure_built(_LIB_PATHS[0])
for _p in _LIB_PATHS:
    if _p and os.path.exists(_p):
        try:
            _lib = ctypes.CDLL(os.path.abspath(_p))
            break
        except OSError:
            _lib = None

if _lib is not None:
    _lib.mn_gather_u8.restype = ctypes.c_int
    _lib.mn_gather_u8.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_int,
    ]
    _lib.mn_load_cifar_bin.restype = ctypes.c_int
    _lib.mn_load_cifar_bin.argtypes = [ctypes.c_char_p] + [ctypes.c_void_p] * 4
    # symbol may be absent from an older prebuilt library
    # (MICRONET_HOST_LIB override): degrade to the Python KL search
    # instead of failing the whole module import
    _HAS_KL = hasattr(_lib, "mn_kl_thresholds")
    if _HAS_KL:
        _lib.mn_kl_thresholds.restype = ctypes.c_int
        _lib.mn_kl_thresholds.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
else:
    _HAS_KL = False


def available() -> bool:
    return _lib is not None


def gather_u8(src: np.ndarray, idx: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """dst[i] = src[idx[i]] over the leading axis, multi-threaded in C++.

    src must be C-contiguous uint8; idx int64. numpy fallback otherwise.
    """
    if (
        _lib is None
        or src.dtype != np.uint8
        or not src.flags["C_CONTIGUOUS"]
    ):
        return src[idx]
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    item = int(np.prod(src.shape[1:]))
    dst = np.empty((idx.shape[0],) + src.shape[1:], np.uint8)
    rc = _lib.mn_gather_u8(
        src.ctypes.data,
        src.shape[0],
        idx.ctypes.data,
        idx.shape[0],
        item,
        dst.ctypes.data,
        n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"mn_gather_u8 failed (rc={rc})")
    return dst


def kl_thresholds_batch(
    counts: np.ndarray, absmax: np.ndarray, num_quantized_bins: int = 128
) -> Optional[np.ndarray]:
    """Parallel KL threshold search over a batch of histograms
    (native/micronet_host.cpp::mn_kl_thresholds); None when the native
    library is unavailable (caller falls back to the Python search)."""
    if _lib is None or not _HAS_KL:
        return None
    counts = np.ascontiguousarray(counts, np.float64)
    absmax = np.ascontiguousarray(absmax, np.float64)
    n, bins = counts.shape
    out = np.empty((n,), np.float64)
    rc = _lib.mn_kl_thresholds(
        counts.ctypes.data,
        absmax.ctypes.data,
        n,
        bins,
        num_quantized_bins,
        out.ctypes.data,
        0,
    )
    if rc != 0:
        return None
    return out


def load_cifar_bin(
    root: str,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Load cifar-10-batches-bin via the native parser; None if absent."""
    if _lib is None or not os.path.isdir(root):
        return None
    tr_x = np.empty((50000, 32, 32, 3), np.uint8)
    tr_y = np.empty((50000,), np.uint8)
    te_x = np.empty((10000, 32, 32, 3), np.uint8)
    te_y = np.empty((10000,), np.uint8)
    rc = _lib.mn_load_cifar_bin(
        root.encode(),
        tr_x.ctypes.data,
        tr_y.ctypes.data,
        te_x.ctypes.data,
        te_y.ctypes.data,
    )
    if rc != 0:
        return None
    return tr_x, tr_y.astype(np.int32), te_x, te_y.astype(np.int32)
