"""ctypes binding for the native C++ statevector engine.

Builds ``qsim/native/statevec.cc`` on first use (g++, cached as a .so next
to the source) and exposes batched circuit evolution. Falls back gracefully:
callers check :func:`available` and use the numpy path otherwise — the
numerical results are identical (tested to ~1e-6).

This is the framework's native-runtime analogue of the reference's only
native dependency, Qiskit Aer's C++ simulator (``data_gen.py:88,130``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ddqst_tpu.qsim import gates as G
from ddqst_tpu.qsim.states import Circuit

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_DIR, "statevec.cc")
_SO = os.path.join(_DIR, "libstatevec.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        lib.evolve.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, i32p, i32p, f32p, i64p,
        ]
        lib.evolve_batch_from_zero.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, i32p, i32p, i32p, i32p, f32p,
            i64p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _pack_program(circuits: list[Circuit]):
    """Flatten circuits into the engine's program arrays."""
    ks, qubits, mats, offsets, starts, counts = [], [], [], [], [], []
    cursor = 0
    mat_cursor = 0
    for qc in circuits:
        starts.append(cursor)
        counts.append(len(qc.gates))
        for g in qc.gates:
            m = G.gate_matrix(g.name, g.params)
            k = len(g.qubits)
            ks.append(k)
            qubits.extend([g.qubits[0], g.qubits[1] if k == 2 else 0])
            flat = np.ascontiguousarray(m, dtype=np.complex64).view(
                np.float32
            ).ravel()
            mats.append(flat)
            offsets.append(mat_cursor)
            mat_cursor += flat.size
            cursor += 1
    return (
        np.asarray(ks, np.int32),
        np.asarray(qubits, np.int32),
        np.concatenate(mats).astype(np.float32) if mats else np.zeros(0, np.float32),
        np.asarray(offsets, np.int64),
        np.asarray(starts, np.int32),
        np.asarray(counts, np.int32),
    )


def statevectors(circuits: list[Circuit]) -> np.ndarray:
    """Exact statevectors ``[C, 2^N]`` complex64 via the native engine."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native engine unavailable (g++ build failed)")
    if not circuits:
        return np.zeros((0, 0), np.complex64)
    n = circuits[0].num_qubits
    ks, qubits, mats, offsets, starts, counts = _pack_program(circuits)
    out = np.zeros((len(circuits), 2 * (1 << n)), np.float32)
    lib.evolve_batch_from_zero(
        out, n, len(circuits), starts, counts, ks, qubits, mats, offsets
    )
    return out.view(np.complex64).reshape(len(circuits), 1 << n)
