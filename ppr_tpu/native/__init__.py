"""ctypes binding for the native C++ graph builder.

Compiled on first use with the system toolchain into a per-user cache dir;
callers fall back to the numpy path automatically when no compiler is
available (``build_csr_native`` returns None)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "graph_builder.cpp")
_lib = None
_lib_tried = False


def _compile_lib() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "PPR_TPU_NATIVE_CACHE",
        os.path.expanduser("~/.cache/ppr_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"graph_builder_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", so_path + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    os.replace(so_path + ".tmp", so_path)
    return so_path


def get_lib():
    global _lib, _lib_tried
    if _lib is None and not _lib_tried:
        _lib_tried = True
        so = _compile_lib()
        if so:
            lib = ctypes.CDLL(so)
            lib.ppr_build_csr.restype = ctypes.c_int
            lib.ppr_parse_edge_list.restype = ctypes.c_int64
            lib.ppr_build_alias.restype = ctypes.c_int
            _lib = lib
    return _lib


def _ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def build_csr_native(src: np.ndarray, dst: np.ndarray, n: int, n_pad: int):
    """Returns (indptr, indices, sorted_src, out_deg, in_deg) or None."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    m = src.shape[0]
    indptr = np.empty(n_pad + 1, np.int32)
    indices = np.empty(max(m, 1), np.int32)
    sorted_src = np.empty(max(m, 1), np.int32)
    out_deg = np.empty(n_pad, np.int32)
    in_deg = np.empty(n_pad, np.int32)
    rc = lib.ppr_build_csr(
        ctypes.c_int64(m), _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
        ctypes.c_int64(n), ctypes.c_int64(n_pad),
        _ptr(indptr, ctypes.c_int32), _ptr(indices, ctypes.c_int32),
        _ptr(sorted_src, ctypes.c_int32),
        _ptr(out_deg, ctypes.c_int32), _ptr(in_deg, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError("edge endpoint out of range")
    return indptr, indices[:m], sorted_src[:m], out_deg, in_deg


def build_alias_native(indptr: np.ndarray, coef: np.ndarray, m_pad: int):
    """Walker alias tables over CSR segments; returns (prob, other) or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int32)
    coef = np.ascontiguousarray(coef, np.float32)
    prob = np.ones(m_pad, np.float32)
    other = np.arange(m_pad, dtype=np.int32)
    rc = lib.ppr_build_alias(
        ctypes.c_int64(indptr.shape[0] - 1),
        _ptr(indptr, ctypes.c_int32), _ptr(coef, ctypes.c_float),
        _ptr(prob, ctypes.c_float), _ptr(other, ctypes.c_int32),
    )
    if rc != 0:
        return None
    return prob, other


def parse_edge_list_native(path: str, cap: int):
    """Returns (src, dst) int64 arrays, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.empty(cap, np.int64)
    dst = np.empty(cap, np.int64)
    m = lib.ppr_parse_edge_list(
        path.encode(), ctypes.c_int64(cap),
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
    )
    if m < 0:
        return None
    return src[:m], dst[:m]
