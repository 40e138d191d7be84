"""Native (C++) host-side helpers with NumPy fallbacks.

The accelerator compute path is JAX/XLA; this module provides the native
host-runtime pieces around it (the role finufft's C++ spreader
infrastructure plays in the reference, SURVEY section 2.3): tile binning of
nonuniform points, ES kernel tap tables for large target sets, and a fused
direct-DFT accumulator for the host oracle.

The shared library is compiled lazily with g++ on first use and cached next
to this file; every entry point transparently falls back to NumPy when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fftvis_native.cpp")
_LIB = os.path.join(_HERE, "_fftvis_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
                _SRC
            ):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-shared",
                        "-fPIC",
                        "-std=c++17",
                        _SRC,
                        "-o",
                        _LIB,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
        except Exception as err:  # pragma: no cover - no-compiler environments
            logger.info("native build unavailable (%s); using NumPy fallbacks", err)
            _build_failed = True
            return None

        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        lib.bin_points_2d.argtypes = [
            f64p, f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, i64p, i64p,
        ]
        lib.bin_points_2d.restype = ctypes.c_int
        lib.es_taps.argtypes = [
            f64p, ctypes.c_int64, ctypes.c_int, ctypes.c_double, i64p, f64p,
        ]
        lib.es_taps.restype = ctypes.c_int
        lib.direct_dft_accum.argtypes = [
            f64p, f64p, f64p, ctypes.c_int64, f64p, ctypes.c_int64,
            ctypes.c_int, f64p, f64p,
        ]
        lib.direct_dft_accum.restype = ctypes.c_int
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


def bin_points_2d(uy, ux, nf, tile):
    """Counting-sort 2D points into grid tiles.

    Returns (perm, offsets): point indices ordered tile-by-tile and
    CSR-style tile boundaries ((nty*ntx + 1,)).
    """
    uy = np.ascontiguousarray(uy, dtype=np.float64)
    ux = np.ascontiguousarray(ux, dtype=np.float64)
    n = uy.size
    nfy, nfx = int(nf[0]), int(nf[1])
    ty, tx = int(tile[0]), int(tile[1])
    nty = -(-nfy // ty)
    ntx = -(-nfx // tx)

    lib = _load()
    if lib is not None:
        perm = np.empty(n, dtype=np.int64)
        offsets = np.zeros(nty * ntx + 1, dtype=np.int64)
        lib.bin_points_2d(uy, ux, n, nfy, nfx, ty, tx, perm, offsets)
        return perm, offsets

    # NumPy fallback: stable argsort by tile id.
    iy = np.clip(uy.astype(np.int64) // ty, 0, nty - 1)
    ix = np.clip(ux.astype(np.int64) // tx, 0, ntx - 1)
    tid = iy * ntx + ix
    perm = np.argsort(tid, kind="stable").astype(np.int64)
    counts = np.bincount(tid, minlength=nty * ntx)
    offsets = np.zeros(nty * ntx + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return perm, offsets


def es_taps(v, w: int, beta: float):
    """Tap start indices + ES kernel values for fractional positions ``v``.

    Returns (k0 (m,) int64, vals (m, w) float64) with
    k0 = ceil(v - w/2), vals[i, t] = psi(v_i - (k0_i + t)).
    """
    v = np.ascontiguousarray(v, dtype=np.float64)
    m = v.size
    lib = _load()
    if lib is not None:
        k0 = np.empty(m, dtype=np.int64)
        vals = np.empty((m, w), dtype=np.float64)
        lib.es_taps(v, m, w, float(beta), k0, vals)
        return k0, vals

    from ..nufft.kernels import es_kernel_grid

    k0 = np.ceil(v - w / 2.0).astype(np.int64)
    offs = np.arange(w)
    vals = es_kernel_grid(v[:, None] - (k0[:, None] + offs[None, :]), w, beta)
    return k0, vals


def direct_dft_accum(x, weights, targets, out=None):
    """out[k] += sum_j weights[j] exp(i x_j . b_k); float64 host oracle core."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    weights = np.ascontiguousarray(weights, dtype=np.complex128)
    targets = np.ascontiguousarray(np.asarray(targets, dtype=np.float64).T)  # (m, d)
    d, n = x.shape
    m = targets.shape[0]
    if out is None:
        out = np.zeros(m, dtype=np.complex128)

    lib = _load()
    if lib is not None:
        out_re = np.ascontiguousarray(out.real)
        out_im = np.ascontiguousarray(out.imag)
        lib.direct_dft_accum(
            x,
            np.ascontiguousarray(weights.real),
            np.ascontiguousarray(weights.imag),
            n, targets, m, d, out_re, out_im,
        )
        out = out_re + 1j * out_im
        return out

    phase = x.T @ targets.T  # (n, m)
    out = out + weights @ np.exp(1j * phase)
    return out
