"""ctypes bindings for the native host runtime (native/cxg_native.cpp).

Loads `native/libcxg_native.so`, building it with `make` on first use if
the toolchain is present; every entry point has a pure-Python fallback so
the framework works without a compiler. Equality between the two paths is
golden-tested (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from controllable_xgating_tpu.utils.logging import get_logger

log = get_logger("cxg.native")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libcxg_native.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_i64 = ctypes.c_int64
_f32 = ctypes.c_float
_p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_p_u32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    # always invoke make: it is a no-op when the .so is current, and it
    # rebuilds a stale .so whose symbols lag the sources (loading a stale
    # lib would fail the argtypes setup below)
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception as e:  # no toolchain / build failure
        if not os.path.exists(_SO_PATH):
            log.info("native build unavailable (%s); using Python fallback", e)
            return None
        log.info("native rebuild failed (%s); trying the existing .so", e)
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        log.info("native load failed (%s); using Python fallback", e)
        return None
    lib.cxg_build_df.restype = _i64
    lib.cxg_build_df.argtypes = [
        _p_i32, _p_i32, _i64, _i64, _i64, _p_i64, _i64,
        _p_u32, _p_u32, _p_f32, _i64,
    ]
    lib.cxg_cider_d.restype = None
    lib.cxg_cider_d.argtypes = [
        _p_i32, _i64, _i64, _p_i32,
        _p_i32, _p_i32, _i64, _i64, _i64,
        _p_u32, _p_u32, _p_f32, _i64, _f32, _p_f32,
    ]
    lib.cxg_ptb_tokenize.restype = _i64
    lib.cxg_ptb_tokenize.argtypes = [ctypes.c_char_p, ctypes.c_char_p, _i64]
    lib.cxg_porter_stem.restype = _i64
    lib.cxg_porter_stem.argtypes = [ctypes.c_char_p, ctypes.c_char_p, _i64]
    lib.cxg_meteor.restype = ctypes.c_double
    lib.cxg_meteor.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    try:  # synonym-stage entry points (absent only in a stale .so)
        lib.cxg_meteor_syn.restype = ctypes.c_double
        lib.cxg_meteor_syn.argtypes = [ctypes.c_char_p, ctypes.c_char_p, _i64]
        lib.cxg_syn_table_new.restype = _i64
        lib.cxg_syn_table_new.argtypes = [ctypes.c_char_p]
        lib.cxg_syn_table_free.restype = None
        lib.cxg_syn_table_free.argtypes = [_i64]
    except AttributeError:
        log.info("native .so lacks synonym entry points (stale build); "
                 "METEOR synonym tables fall back to Python")
    lib.cxg_rouge_l.restype = ctypes.c_double
    lib.cxg_rouge_l.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def build_df(
    caps: np.ndarray, ncaps: np.ndarray, df_video_indices: Sequence[int]
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Sorted (h1, h2, df) arrays, or None if the native lib is absent."""
    lib = _load()
    if lib is None:
        return None
    caps = np.ascontiguousarray(caps, np.int32)
    ncaps = np.ascontiguousarray(ncaps, np.int32)
    idx = np.ascontiguousarray(df_video_indices, np.int64)
    n, s, l = caps.shape
    cap = max(int(ncaps.sum()) * l * 4 + 16, 1024)
    h1 = np.empty(cap, np.uint32)
    h2 = np.empty(cap, np.uint32)
    df = np.empty(cap, np.float32)
    count = lib.cxg_build_df(caps, ncaps, n, s, l, idx, len(idx), h1, h2, df, cap)
    if count < 0:
        raise RuntimeError(f"cxg_build_df failed: {count}")
    return h1[:count].copy(), h2[:count].copy(), df[:count].copy()


def cider_d(
    cand: np.ndarray,
    video_indices: np.ndarray,
    caps: np.ndarray,
    ncaps: np.ndarray,
    h1: np.ndarray,
    h2: np.ndarray,
    df: np.ndarray,
    log_n: float,
) -> Optional[np.ndarray]:
    """Batch CIDEr-D on token ids, or None if the native lib is absent."""
    lib = _load()
    if lib is None:
        return None
    cand = np.ascontiguousarray(cand, np.int32)
    caps = np.ascontiguousarray(caps, np.int32)
    ncaps = np.ascontiguousarray(ncaps, np.int32)
    vidx = np.ascontiguousarray(video_indices, np.int32)
    h1 = np.ascontiguousarray(h1, np.uint32)
    h2 = np.ascontiguousarray(h2, np.uint32)
    df = np.ascontiguousarray(df, np.float32)
    b, lc = cand.shape
    n, s, l = caps.shape
    out = np.empty(b, np.float32)
    lib.cxg_cider_d(
        cand, b, lc, vidx, caps, ncaps, n, s, l,
        h1, h2, df, len(h1), float(log_n), out,
    )
    return out


_REF_SEP = b"\x1e"


def ptb_tokenize(text: str) -> Optional[list[str]]:
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(4 * len(text.encode()) + 64)
    n = lib.cxg_ptb_tokenize(text.encode(), buf, len(buf))
    if n < 0:
        raise RuntimeError("cxg_ptb_tokenize overflow")
    s = buf.value.decode()
    return s.split(" ") if s else []


def porter_stem(word: str) -> Optional[str]:
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(2 * len(word.encode()) + 16)
    n = lib.cxg_porter_stem(word.encode(), buf, len(buf))
    if n < 0:
        raise RuntimeError("cxg_porter_stem overflow")
    return buf.value.decode()


def meteor(
    hyp: str, refs: Sequence[str], syn_handle: int = 0
) -> Optional[float]:
    lib = _load()
    if lib is None:
        return None
    joined = _REF_SEP.join(r.encode() for r in refs)
    if syn_handle:
        return float(lib.cxg_meteor_syn(hyp.encode(), joined, syn_handle))
    return float(lib.cxg_meteor(hyp.encode(), joined))


def syn_table_new(groups: Sequence[Sequence[str]]) -> int:
    """Register a METEOR synonym table (synset groups) with the native
    lib; returns a handle for meteor(syn_handle=...), or -1 when the
    loaded .so predates the synonym stage (caller falls back to Python)."""
    lib = _load()
    if lib is None or not hasattr(lib, "cxg_syn_table_new"):
        return -1
    serialized = "\n".join(" ".join(g) for g in groups)
    return int(lib.cxg_syn_table_new(serialized.encode()))


def syn_table_free(handle: int) -> None:
    lib = _load()
    if lib is not None and handle > 0 and hasattr(lib, "cxg_syn_table_free"):
        lib.cxg_syn_table_free(handle)


def rouge_l(hyp: str, refs: Sequence[str], beta: float = 1.2) -> Optional[float]:
    lib = _load()
    if lib is None:
        return None
    return float(
        lib.cxg_rouge_l(
            hyp.encode(), _REF_SEP.join(r.encode() for r in refs), beta
        )
    )
