"""ctypes bindings for the native C++ runtime (builds on demand with g++).

≈ the reference's native host layer (see src/faiss_tpu_native.cpp for the
component-by-component parity map). The library compiles once per machine
into ``native/_build/`` and is loaded via ctypes; every entry point has a
numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "faiss_tpu_native.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_SO = os.path.join(_BUILD_DIR, "libfaiss_tpu_native.so")

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
        "-march=native", _SRC, "-o", _SO + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except (subprocess.SubprocessError, OSError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _build()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(so)
        c = ctypes
        lib.ft_alloc_aligned.restype = c.c_void_p
        lib.ft_alloc_aligned.argtypes = [c.c_size_t]
        lib.ft_free_aligned.argtypes = [c.c_void_p]
        lib.ft_f32_to_bf16.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int64, c.c_int]
        lib.ft_f32_to_f16.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int64, c.c_int]
        lib.ft_l2_norms_f32.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_int]
        lib.ft_merge_topk_f32.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int64,
            c.c_void_p, c.c_void_p, c.c_int64,
            c.c_void_p, c.c_void_p, c.c_int64, c.c_int64,
            c.c_int, c.c_int]
        lib.ft_fill_sentinels.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_int64,
            c.c_float, c.c_int64]
        lib.ft_version.restype = c.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _nthreads() -> int:
    return max(1, os.cpu_count() or 1)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


# ---------------------------------------------------------------------------
# public wrappers (native with numpy fallback)
# ---------------------------------------------------------------------------

def f32_to_bf16(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32→bf16; returns a uint16 view-compatible array
    (reinterpret with ml_dtypes/bfloat16 or feed to jax as raw bits)."""
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.uint16)
    lib = _load()
    if lib is not None:
        lib.ft_f32_to_bf16(_ptr(x), _ptr(out), x.size, _nthreads())
    else:
        u = x.view(np.uint32)
        nan = (u & np.uint32(0x7FFFFFFF)) > np.uint32(0x7F800000)
        bias = np.uint32(0x7FFF) + ((u >> np.uint32(16)) & np.uint32(1))
        rne = ((u + bias) >> np.uint32(16)).astype(np.uint16)
        qnan = ((u >> np.uint32(16)).astype(np.uint16)
                | np.uint16(0x0040))
        out[...] = np.where(nan, qnan, rne)
    return out


def f32_to_f16(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32→f16 (IEEE half), returned as np.float16."""
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is None:
        return x.astype(np.float16)  # numpy is RNE
    out = np.empty(x.shape, np.uint16)
    lib.ft_f32_to_f16(_ptr(x), _ptr(out), x.size, _nthreads())
    return out.view(np.float16)


def l2_norms(x: np.ndarray) -> np.ndarray:
    """Row-wise ‖v‖² of an (n, d) fp32 matrix (double accumulation)."""
    x = np.ascontiguousarray(x, np.float32)
    assert x.ndim == 2
    lib = _load()
    if lib is None:
        return (x.astype(np.float64) ** 2).sum(1).astype(np.float32)
    out = np.empty(x.shape[0], np.float32)
    lib.ft_l2_norms_f32(_ptr(x), _ptr(out), x.shape[0], x.shape[1],
                        _nthreads())
    return out


def merge_topk(va, ia, vb, ib, k: int, largest: bool = True):
    """Merge two best-first-sorted per-row k-lists into one (nq, k) list."""
    va = np.ascontiguousarray(va, np.float32)
    vb = np.ascontiguousarray(vb, np.float32)
    ia = np.ascontiguousarray(ia, np.int64)
    ib = np.ascontiguousarray(ib, np.int64)
    nq, ka = va.shape
    kb = vb.shape[1]
    vo = np.empty((nq, k), np.float32)
    io = np.empty((nq, k), np.int64)
    lib = _load()
    if lib is not None:
        lib.ft_merge_topk_f32(_ptr(va), _ptr(ia), ka, _ptr(vb), _ptr(ib), kb,
                              _ptr(vo), _ptr(io), k, nq,
                              1 if largest else 0, _nthreads())
        return vo, io
    vals = np.concatenate([va, vb], axis=1)
    ids = np.concatenate([ia, ib], axis=1)
    order = (np.argsort(-vals, axis=1, kind="stable") if largest
             else np.argsort(vals, axis=1, kind="stable"))[:, :k]
    return (np.take_along_axis(vals, order, 1),
            np.take_along_axis(ids, order, 1))


class AlignedBuffer:
    """Page-aligned host buffer (≈ alloc_aligned, MetalResources.h:20-33)."""

    def __init__(self, nbytes: int):
        lib = _load()
        self._lib = lib
        if lib is not None:
            self._ptr = lib.ft_alloc_aligned(nbytes)
            if not self._ptr:
                raise MemoryError(f"ft_alloc_aligned({nbytes}) failed")
            self.array = np.ctypeslib.as_array(
                ctypes.cast(self._ptr, ctypes.POINTER(ctypes.c_uint8)),
                shape=(nbytes,),
            )
        else:
            self._ptr = None
            self.array = np.empty(nbytes, np.uint8)

    def view(self, dtype, shape) -> np.ndarray:
        return self.array.view(dtype)[: int(np.prod(shape))].reshape(shape)

    def close(self):
        if self._ptr:
            self._lib.ft_free_aligned(self._ptr)
            self._ptr = None
            self.array = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
