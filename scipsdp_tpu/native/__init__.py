"""Native (C++) components.

The reference's entire core is native C/C++; here the compute path is
JAX/XLA and the native layer covers host-side hot paths: the SDPA
tokenizer (sdpa_parse.cpp), loaded through ctypes with a pure-Python
fallback.  Build with ``python -m scipsdp_tpu.native.build`` (or the g++
one-liner in sdpa_parse.cpp); the repo ships no binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libsdpaparse.so")
_SRC_PATH = os.path.join(os.path.dirname(__file__), "sdpa_parse.cpp")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native parser, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC_PATH):
        _build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lp = ctypes.POINTER(ctypes.c_long)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.sdpa_count.restype = ctypes.c_int
        lib.sdpa_count.argtypes = [ctypes.c_char_p, lp, lp, lp, lp, lp]
        lib.sdpa_fill.restype = ctypes.c_int
        lib.sdpa_fill.argtypes = [ctypes.c_char_p, lp, dp, lp, lp, lp, lp,
                                  dp, lp, lp]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def parse_sdpa_native(path: str):
    """Tokenize a plain (non-gz) .dat-s file natively.

    Returns (blocksizes, obj, var, block, row, col, val, intidx, rank1idx)
    as numpy arrays (raw 1-based indices, unvalidated), or None when the
    native library is unavailable or rejects the file.
    """
    import numpy as np

    lib = get_lib()
    if lib is None or path.endswith(".gz"):
        return None
    c_long = ctypes.c_long
    nv, nb, ne, ni, nr = (c_long(0) for _ in range(5))
    rc = lib.sdpa_count(path.encode(), ctypes.byref(nv), ctypes.byref(nb),
                        ctypes.byref(ne), ctypes.byref(ni), ctypes.byref(nr))
    if rc != 0 or nv.value < 0 or nb.value < 0:
        return None
    bs = np.zeros(nb.value, np.int64)
    obj = np.zeros(nv.value, np.float64)
    var = np.zeros(ne.value, np.int64)
    blk = np.zeros(ne.value, np.int64)
    row = np.zeros(ne.value, np.int64)
    col = np.zeros(ne.value, np.int64)
    val = np.zeros(ne.value, np.float64)
    ii = np.zeros(ni.value, np.int64)
    rr = np.zeros(nr.value, np.int64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.sdpa_fill(path.encode(), ptr(bs, c_long), ptr(obj, ctypes.c_double),
                       ptr(var, c_long), ptr(blk, c_long), ptr(row, c_long),
                       ptr(col, c_long), ptr(val, ctypes.c_double),
                       ptr(ii, c_long), ptr(rr, c_long))
    if rc != 0:
        return None
    return bs, obj, var, blk, row, col, val, ii, rr
