"""ctypes bindings for the single-core CPU fused realign (pairhmm_cpu.cpp).

This is the MEASURED baseline implementation for bench.py: an optimized
single-core C++ realisation of the exact workload the TPU kernels run
(banded scaled forward + backward/EM + reverse-MEA — the complete
``cactus_realign`` + Baum-Welch E-step equivalent, reference
nanopore/analyses/utils.py:587,509-523).  Auto-builds
``libpairhmmcpu.so`` on first use; returns None when the toolchain is
missing (callers fall back to the estimate).
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
_SRC = os.path.join(_NATIVE_DIR, "pairhmm_cpu.cpp")
_SO = os.path.join(_NATIVE_DIR, "libpairhmmcpu.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-ffast-math", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception as exc:
        logger.warning("native pairhmm_cpu build failed: %s", exc)
        return False


def get_lib():
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
            logger.warning("native pairhmm_cpu load failed: %s", exc)
            return None
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.pairhmm_cpu_realign_batch.restype = None
        lib.pairhmm_cpu_realign_batch.argtypes = [
            i8p, i8p, i8p, i8p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            i32p, i32p, i32p,
            f32p, f32p, f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_int32,
            f32p, f32p, f32p, f32p, f32p, f32p, i8p,
            ctypes.c_void_p,
        ]
        _lib = lib
        logger.info("native pairhmm_cpu baseline loaded: %s", _SO)
    return _lib


def cpu_realign_batch(
    batch, params, gap_gamma: float = 0.5, match_gamma: float = 0.0,
    emit_em: bool = True, emit_gamma: bool = False,
) -> dict | None:
    """Run the single-core fused realign over a BandedBatch.

    Returns dict(loglik (B,), score (B,), trans (B,5,5), emis (B,5,16),
    dirs (B,K+1,W)) matching ops.mea.realign_fused, or None when the
    native library is unavailable.  ``emit_em=False`` skips the
    Baum-Welch expectation accumulation — the decode-only workload that
    matches what ``cactus_realign`` itself computes (utils.py:587) and
    the TPU kernels' emit_em=False variant.
    """
    lib = get_lib()
    if lib is None:
        return None
    xc = np.ascontiguousarray(np.asarray(batch.xc), np.int8)
    yc = np.ascontiguousarray(np.asarray(batch.yc), np.int8)
    xn = np.ascontiguousarray(np.asarray(batch.xn), np.int8)
    yn = np.ascontiguousarray(np.asarray(batch.yn), np.int8)
    offsets = np.ascontiguousarray(np.asarray(batch.offsets), np.int32)
    m = np.ascontiguousarray(np.asarray(batch.m), np.int32)
    n = np.ascontiguousarray(np.asarray(batch.n), np.int32)
    kend = np.ascontiguousarray(np.asarray(batch.k_end), np.int32)
    B, K1, W = xc.shape
    t = np.ascontiguousarray(
        np.asarray(params.t).reshape(-1), np.float32
    )
    e_match = np.ascontiguousarray(
        np.asarray(params.e_match_flat), np.float32
    )
    e_gap = np.ascontiguousarray(np.asarray(params.e_gap_flat), np.float32)
    loglik = np.empty(B, np.float32)
    score = np.empty(B, np.float32)
    trans = np.empty((B, 25), np.float32)
    e16 = np.empty((B, 16), np.float32)
    edel = np.empty((B, 8), np.float32)
    eins = np.empty((B, 8), np.float32)
    dirs = np.empty((B, K1, W), np.int8)
    gamma = (
        np.zeros((B, K1, W), np.float32) if emit_gamma else None
    )
    lib.pairhmm_cpu_realign_batch(
        xc, yc, xn, yn, offsets, B, K1, W, m, n, kend,
        t, e_match, e_gap, float(gap_gamma), float(match_gamma),
        int(emit_em),
        loglik, score, trans, e16, edel, eins, dirs,
        gamma.ctypes.data if gamma is not None else None,
    )
    emis = np.zeros((B, 5, 16), np.float32)
    emis[:, 0, :] = e16
    emis[:, 1, :] = np.repeat(edel[:, 0:4] / 4.0, 4, axis=1)
    emis[:, 3, :] = np.repeat(edel[:, 4:8] / 4.0, 4, axis=1)
    emis[:, 2, :] = np.tile(eins[:, 0:4] / 4.0, (1, 4))
    emis[:, 4, :] = np.tile(eins[:, 4:8] / 4.0, (1, 4))
    out = {
        "loglik": loglik,
        "score": score,
        "trans": trans.reshape(B, 5, 5),
        "emis": emis,
        "dirs": dirs,
    }
    if gamma is not None:
        out["gamma_match"] = gamma
    return out
