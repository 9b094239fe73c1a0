"""ctypes bindings for the native golden-reference engine.

Loads (building on first use) `native/libnbody_ref.so` — the C++ f64 oracle
with the reference's exact physics: additive-eps force law (sim/mod.rs:22-37),
semi-implicit Euler (direct.rs:8-24), and the quirk-faithful Barnes-Hut
octree (tree.rs, mod.rs). Used by golden tests at body counts where Python
loop oracles are unusable, and available as a fast threaded CPU engine.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnbody_ref.so")

SOFTENING = {"ref": 0, "plummer": 1}
ALGORITHM = {"direct": 0, "barnes_hut": 1}

_lock = threading.Lock()
_lib = None


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True,
        text=True,
    )


def lib() -> ctypes.CDLL:
    """The loaded library, building it if needed."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "nbody_ref.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            _build()
        l = ctypes.CDLL(_LIB_PATH)
        dp = ctypes.POINTER(ctypes.c_double)
        l.nbody_acc_direct.argtypes = [
            dp, dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, dp,
        ]
        l.nbody_acc_barnes_hut.argtypes = [
            dp, dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, dp,
        ]
        l.nbody_rollout.argtypes = [
            dp, dp, dp, ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.c_double,
        ]
        l.nbody_total_energy.argtypes = [
            dp, dp, dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_int,
        ]
        l.nbody_total_energy.restype = ctypes.c_double
        _lib = l
        return _lib


def _as_c(a):
    a = np.ascontiguousarray(a, np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def acc_direct(pos, mass, *, g, eps, softening="ref") -> np.ndarray:
    pos, p = _as_c(pos)
    mass, m = _as_c(mass)
    out = np.zeros_like(pos)
    out_c = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib().nbody_acc_direct(p, m, len(mass), g, eps, SOFTENING[softening], out_c)
    return out


def acc_barnes_hut(pos, mass, *, theta, g, eps, softening="ref") -> np.ndarray:
    pos, p = _as_c(pos)
    mass, m = _as_c(mass)
    out = np.zeros_like(pos)
    out_c = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib().nbody_acc_barnes_hut(
        p, m, len(mass), theta, g, eps, SOFTENING[softening], out_c
    )
    return out


def rollout(pos, vel, mass, *, dt, steps, g, eps, softening="ref",
            algorithm="direct", theta=0.5):
    """Semi-implicit Euler rollout; returns (pos, vel) copies."""
    pos = np.ascontiguousarray(pos, np.float64).copy()
    vel = np.ascontiguousarray(vel, np.float64).copy()
    mass, m = _as_c(mass)
    p = pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    v = vel.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib().nbody_rollout(
        p, v, m, len(mass), dt, steps, g, eps, SOFTENING[softening],
        ALGORITHM[algorithm], theta,
    )
    return pos, vel


def total_energy(pos, vel, mass, *, g, eps=0.0, softening="plummer") -> float:
    pos, p = _as_c(pos)
    vel, v = _as_c(vel)
    mass, m = _as_c(mass)
    return lib().nbody_total_energy(p, v, m, len(mass), g, eps,
                                    SOFTENING[softening])
