"""Native (C++) components, built on demand with g++ and loaded via ctypes.

Currently: the batch edit-distance / PER scorer (qasr/native/edit_distance.cpp).
Import errors degrade gracefully — qasr.decode.scoring falls back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "edit_distance.cpp")
_SO = os.path.join(_DIR, "_qasr_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.qasr_edit_distance.restype = ctypes.c_int
        lib.qasr_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.qasr_batch_per.restype = None
        lib.qasr_batch_per.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return lib


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def edit_distance_native(ref, hyp) -> int:
    lib = _load()
    r = _as_i32(ref)
    h = _as_i32(hyp)
    return int(
        lib.qasr_edit_distance(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(r),
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(h),
        )
    )


def batch_per_native(refs, ref_lens, hyps, hyp_lens) -> tuple[int, int]:
    """Padded id matrices -> (total errors, total reference tokens)."""
    lib = _load()
    refs = _as_i32(refs)
    hyps = _as_i32(hyps)
    ref_lens = _as_i32(ref_lens)
    hyp_lens = _as_i32(hyp_lens)
    errs = ctypes.c_int64()
    total = ctypes.c_int64()
    lib.qasr_batch_per(
        refs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ref_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hyps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hyp_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        refs.shape[0],
        refs.shape[1] if refs.ndim == 2 else 0,
        hyps.shape[1] if hyps.ndim == 2 else 0,
        ctypes.byref(errs),
        ctypes.byref(total),
    )
    return int(errs.value), int(total.value)
