"""ctypes bindings for the native seed/chain runtime (seedchain.cpp).

Auto-builds ``libseedchain.so`` with the system C++ compiler on first
use; every entry point has a NumPy fallback in
nanopore_tpu.mapping.{index,chain}, so a missing toolchain only costs
speed, never correctness.  Set NANOPORE_TPU_NO_NATIVE=1 to force the
Python path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("nanopore_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "seedchain.cpp")
_SO = os.path.join(_NATIVE_DIR, "libseedchain.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as exc:
        logger.warning("native seedchain build failed: %s", exc)
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("NANOPORE_TPU_NO_NATIVE"):
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as exc:
            logger.warning("native seedchain load failed: %s", exc)
            return None
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.seedchain_build_index.restype = ctypes.c_int64
        lib.seedchain_build_index.argtypes = [
            i8p, ctypes.c_int64, ctypes.c_int32, i64p, i32p,
        ]
        lib.seedchain_mask_repeats.restype = ctypes.c_int64
        lib.seedchain_mask_repeats.argtypes = [
            i64p, i32p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.seedchain_lookup.restype = ctypes.c_int64
        lib.seedchain_lookup.argtypes = [
            i64p, i32p, ctypes.c_int64, i8p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, i32p, i32p,
        ]
        lib.seedchain_merge_anchors.restype = ctypes.c_int64
        lib.seedchain_merge_anchors.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p, i32p,
        ]
        lib.seedchain_chain_dp.restype = None
        lib.seedchain_chain_dp.argtypes = [
            i32p, i32p, i32p, i32p, f64p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
            ctypes.c_double, f64p, i64p,
        ]
        try:  # newer entry point; a stale .so just loses the fast path
            lib.seedchain_flank_corridor.restype = ctypes.c_int
            lib.seedchain_flank_corridor.argtypes = [
                i8p, ctypes.c_int64, f64p, f64p, f64p, f64p, f64p, f64p,
            ]
        except AttributeError:  # pragma: no cover - stale binary
            pass
        _lib = lib
        logger.info("native seedchain runtime loaded: %s", _SO)
    return _lib


# ------------------------------------------------------------------ #
# High-level wrappers (numpy in / numpy out)
# ------------------------------------------------------------------ #
def build_index(codes: np.ndarray, k: int):
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.int8)
    cap = max(len(codes) - k + 1, 0)
    kmers = np.empty(cap, np.int64)
    positions = np.empty(cap, np.int32)
    n = lib.seedchain_build_index(codes, len(codes), k, kmers, positions)
    return kmers[:n], positions[:n]


def mask_repeats(kmers: np.ndarray, positions: np.ndarray, max_occ: int):
    lib = get_lib()
    if lib is None:
        return None
    kmers = np.ascontiguousarray(kmers, np.int64)
    positions = np.ascontiguousarray(positions, np.int32)
    n = lib.seedchain_mask_repeats(kmers, positions, len(kmers), max_occ)
    return kmers[:n].copy(), positions[:n].copy()


def lookup(sorted_kmers, sorted_positions, read_codes, k,
           capacity: int | None = None, stride: int = 1):
    lib = get_lib()
    if lib is None:
        return None
    sorted_kmers = np.ascontiguousarray(sorted_kmers, np.int64)
    sorted_positions = np.ascontiguousarray(sorted_positions, np.int32)
    read_codes = np.ascontiguousarray(read_codes, np.int8)
    if capacity is None:
        capacity = max(len(read_codes) * 64, 1 << 16)
    ref_pos = np.empty(capacity, np.int32)
    read_pos = np.empty(capacity, np.int32)
    n = lib.seedchain_lookup(
        sorted_kmers, sorted_positions, len(sorted_kmers), read_codes,
        len(read_codes), k, stride, capacity, ref_pos, read_pos,
    )
    return ref_pos[:n].copy(), read_pos[:n].copy()


def merge_anchors(ref_pos, read_pos, k):
    lib = get_lib()
    if lib is None:
        return None
    ref_pos = np.ascontiguousarray(ref_pos, np.int32)
    read_pos = np.ascontiguousarray(read_pos, np.int32)
    n = len(ref_pos)
    q_start = np.empty(n, np.int32)
    r_start = np.empty(n, np.int32)
    length = np.empty(n, np.int32)
    cnt = lib.seedchain_merge_anchors(
        ref_pos, read_pos, n, k, q_start, r_start, length
    )
    return q_start[:cnt].copy(), r_start[:cnt].copy(), length[:cnt].copy()


def chain_dp(q_start, q_end, r_start, r_end, lengths, max_ref_gap,
             max_diag_drift, gap_open, gap_scale):
    lib = get_lib()
    if lib is None:
        return None
    q_start = np.ascontiguousarray(q_start, np.int32)
    q_end = np.ascontiguousarray(q_end, np.int32)
    r_start = np.ascontiguousarray(r_start, np.int32)
    r_end = np.ascontiguousarray(r_end, np.int32)
    lengths = np.ascontiguousarray(lengths, np.float64)
    n = len(q_start)
    score = np.empty(n, np.float64)
    parent = np.empty(n, np.int64)
    lib.seedchain_chain_dp(
        q_start, q_end, r_start, r_end, lengths, n,
        max_ref_gap, max_diag_drift, gap_open, gap_scale, score, parent,
    )
    return score, parent


def flank_corridor(x, t, eg, entry):
    """Exact pure-deletion corridor EM counts (align.flank), native.

    Returns (trans (5,5), emis (5,16), logz) or None when the native
    library (or this entry point) is unavailable — callers fall back to
    the NumPy reference implementation.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "seedchain_flank_corridor"):
        return None
    x = np.ascontiguousarray(x, np.int8)
    t = np.ascontiguousarray(t, np.float64)
    eg = np.ascontiguousarray(eg, np.float64)
    entry = np.ascontiguousarray(entry, np.float64)
    trans = np.zeros(25, np.float64)
    emis = np.zeros(80, np.float64)
    logz = np.zeros(1, np.float64)
    status = lib.seedchain_flank_corridor(
        x, len(x), t, eg, entry, trans, emis, logz
    )
    if status != 0:
        # corridor mass underflowed to exact zero (e.g. a zero
        # gap-emission probability for a base present in the flank):
        # the kernel's partial counts and -1e300 sentinel are not a
        # result.  Match the NumPy reference's contract (-inf loglik,
        # zero counts) so callers see the same degenerate-model signal
        # on both paths.
        return np.zeros((5, 5)), np.zeros((5, 16)), float("-inf")
    return trans.reshape(5, 5), emis.reshape(5, 16), float(logz[0])
