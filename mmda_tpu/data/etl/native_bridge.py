"""ctypes bridge to the C++ host-runtime library (native/libmmda_native.so).

Builds on demand with `make -C native` (g++ only; no pip deps).  Every entry
point has a pure-Python fallback in its caller, so the framework works without
a compiler - the native path is the fast one.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmmda_native.so")

_lib_cache: Optional[ctypes.CDLL] = None
_build_failed = False


def build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib_cache, _build_failed
    if _lib_cache is not None:
        return _lib_cache
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        if not (auto_build and build()):
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)

    lib.glove_scan.restype = ctypes.c_longlong
    lib.glove_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_double), ctypes.c_longlong, ctypes.c_longlong,
    ]
    lib.pack_tokens.restype = None
    lib.pack_tokens.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pack_floats.restype = None
    lib.pack_floats.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    _lib_cache = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def glove_scan(lib: ctypes.CDLL, word2id: Dict[str, int], path: str,
               emb: np.ndarray) -> int:
    """emb: (rows, dim) float64 C-contiguous, mutated in place."""
    assert emb.dtype == np.float64 and emb.flags.c_contiguous
    words = "\n".join(word2id.keys()).encode("utf-8")
    ids = np.fromiter(word2id.values(), dtype=np.int64, count=len(word2id))
    found = lib.glove_scan(
        path.encode(), words, _ptr(ids, ctypes.c_longlong), len(word2id),
        _ptr(emb, ctypes.c_double), emb.shape[0], emb.shape[1])
    if found < 0:
        raise IOError(f"glove_scan failed to open {path}")
    return int(found)


def pack_tokens(lib: ctypes.CDLL, streams, max_len: int, pad_id: int):
    offsets = np.zeros(len(streams) + 1, np.int64)
    for i, s in enumerate(streams):
        offsets[i + 1] = offsets[i] + len(s)
    flat = (np.concatenate([np.asarray(s, np.int32) for s in streams])
            if len(streams) and offsets[-1] else np.zeros(0, np.int32))
    out = np.empty((len(streams), max_len), np.int32)
    lengths = np.empty(len(streams), np.int32)
    lib.pack_tokens(
        _ptr(flat, ctypes.c_int32), _ptr(offsets, ctypes.c_longlong),
        len(streams), max_len, pad_id,
        _ptr(out, ctypes.c_int32), _ptr(lengths, ctypes.c_int32))
    return out, lengths


def pack_floats(lib: ctypes.CDLL, feats_list, max_len: int, znorm: bool):
    n = len(feats_list)
    dim = feats_list[0].shape[1] if n else 0
    offsets = np.zeros(n + 1, np.int64)
    for i, f in enumerate(feats_list):
        offsets[i + 1] = offsets[i] + len(f)
    flat = (np.concatenate([np.ascontiguousarray(f, np.float32) for f in feats_list])
            if n and offsets[-1] else np.zeros((0, dim), np.float32))
    out = np.empty((n, max_len, dim), np.float32)
    lib.pack_floats(
        _ptr(flat, ctypes.c_float), _ptr(offsets, ctypes.c_longlong),
        n, max_len, dim, int(znorm), _ptr(out, ctypes.c_float))
    return out
