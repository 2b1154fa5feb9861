"""ctypes bindings for the native C++ components.

The active-set QP solver (native/qp_solver.cpp) is an independent numerical
oracle for the JAX interior-point solver — the role the reference delegates
to cvxopt's compiled solver — and a fast host-side fallback for small QPs
(e.g. resolve batches on machines without an accelerator).

The shared library is compiled on first use with g++ and cached next to the
source; set HYBDRT_TPU_NO_NATIVE=1 to disable.
"""
import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libqp_solver.so"
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build_library():
    src = _NATIVE_DIR / "qp_solver.cpp"
    if not src.exists():
        raise NativeUnavailable(f"native source not found at {src}")
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-fopenmp",
           "-o", str(_LIB_PATH), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as err:
        raise NativeUnavailable(f"failed to build native QP solver: {err}")


def get_library():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("HYBDRT_TPU_NO_NATIVE"):
        raise NativeUnavailable("native components disabled by HYBDRT_TPU_NO_NATIVE")
    if not _LIB_PATH.exists() or \
            _LIB_PATH.stat().st_mtime < (_NATIVE_DIR / "qp_solver.cpp").stat().st_mtime:
        _build_library()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.solve_qp_box.restype = ctypes.c_int
    lib.solve_qp_box.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.c_double,
    ]
    _lib = lib
    return lib


def solve_qp_box_batch(p_batch, q_batch, lb, max_iter=0, tol=1e-10):
    """Solve a batch of box QPs with the native solver, threaded over host
    cores (OpenMP). p_batch: (B, n, n); q_batch: (B, n); shared lb: (n,)."""
    lib = get_library()
    p = np.ascontiguousarray(p_batch, dtype=np.float64)
    q = np.ascontiguousarray(q_batch, dtype=np.float64)
    lb = np.ascontiguousarray(lb, dtype=np.float64)
    b, n = q.shape
    x = np.zeros((b, n), dtype=np.float64)
    lib.solve_qp_box_batch.restype = ctypes.c_int
    lib.solve_qp_box_batch.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        ctypes.c_int, ctypes.c_double]
    worst = lib.solve_qp_box_batch(b, n, p, q, lb, x, int(max_iter), float(tol))
    return x, worst


def solve_qp_box(p_matrix, q_vector, lb, max_iter=0, tol=1e-10):
    """Solve min 1/2 x'Px + q'x s.t. x >= lb with the native active-set solver.

    Returns (x, n_iterations)."""
    lib = get_library()
    p = np.ascontiguousarray(np.asarray(p_matrix, dtype=np.float64))
    q = np.ascontiguousarray(np.asarray(q_vector, dtype=np.float64))
    lb = np.ascontiguousarray(np.asarray(lb, dtype=np.float64))
    n = len(q)
    x = np.zeros(n, dtype=np.float64)
    n_iter = lib.solve_qp_box(n, p, q, lb, x, int(max_iter), float(tol))
    if n_iter < 0:
        raise RuntimeError("native QP solver failed (non-PD reduced system)")
    return x, int(n_iter)


def available():
    try:
        get_library()
        return True
    except NativeUnavailable:
        return False
