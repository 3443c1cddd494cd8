"""ctypes wrapper over the REAL reference SPA2d solver.

Compiled from the unmodified reference source
(`/root/reference/lesson6/lib/sparse_bundle_adjustment/src/spa2d.cpp`) against
the mini-Eigen shim by `parity/Makefile`; see `parity/spa2d_harness.cpp`.
Runs doSPA's dense-Cholesky path (same normal equations / LM schedule as the
SpaSolver's default sparse path, spa_solver.cc:51).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

PARITY_DIR = Path(__file__).resolve().parents[2] / "parity"
LIB_PATH = PARITY_DIR / "build" / "libspa2d_ref.so"

_lib = None


def build() -> bool:
    if LIB_PATH.exists():
        return True
    try:
        subprocess.run(
            ["make", "-j4", "build/libspa2d_ref.so"],
            cwd=PARITY_DIR, check=True, capture_output=True, timeout=600,
        )
    except Exception:
        return False
    return LIB_PATH.exists()


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        return None
    lib = ctypes.CDLL(str(LIB_PATH))
    d, i, vp = ctypes.c_double, ctypes.c_int, ctypes.c_void_p
    dp = ctypes.POINTER(d)
    lib.spa_new.restype = vp
    lib.spa_free.argtypes = [vp]
    lib.spa_add_node.argtypes = [vp, d, d, d, i]
    lib.spa_add_constraint.restype = i
    lib.spa_add_constraint.argtypes = [vp, i, i, dp, dp]
    lib.spa_do_spa.restype = i
    lib.spa_do_spa.argtypes = [vp, i, d]
    lib.spa_do_spa_sparse.restype = i
    lib.spa_do_spa_sparse.argtypes = [vp, i, d]
    lib.spa_calc_cost.restype = d
    lib.spa_calc_cost.argtypes = [vp]
    lib.spa_num_nodes.restype = i
    lib.spa_num_nodes.argtypes = [vp]
    lib.spa_get_poses.argtypes = [vp, dp]
    _lib = lib
    return lib


class RefSPA2d:
    """One SysSPA2d instance (reference spa2d.h:192-280)."""

    def __init__(self):
        self.lib = load()
        assert self.lib is not None
        self._s = self.lib.spa_new()

    def close(self):
        if self._s is not None:
            self.lib.spa_free(self._s)
            self._s = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def add_node(self, pose, node_id: int) -> None:
        self.lib.spa_add_node(
            self._s, float(pose[0]), float(pose[1]), float(pose[2]),
            int(node_id),
        )

    def add_constraint(self, id0: int, id1: int, mean, precision) -> bool:
        m = np.ascontiguousarray(mean, np.float64)
        p = np.ascontiguousarray(precision, np.float64).reshape(-1)
        dp = ctypes.POINTER(ctypes.c_double)
        return bool(
            self.lib.spa_add_constraint(
                self._s, int(id0), int(id1),
                m.ctypes.data_as(dp), p.ctypes.data_as(dp),
            )
        )

    def do_spa(self, niter: int = 40, s_lambda: float = 1e-4) -> int:
        return self.lib.spa_do_spa(self._s, int(niter), float(s_lambda))

    def do_spa_sparse(self, niter: int = 40, s_lambda: float = 1e-4) -> int:
        """doSPA over the reference's DEFAULT sparse-Cholesky path
        (spa2d.cpp:505 csp.doChol -> cs_cholsol; SpaSolver runs this one,
        spa_solver.cc:51)."""
        return self.lib.spa_do_spa_sparse(self._s, int(niter), float(s_lambda))

    def cost(self) -> float:
        return float(self.lib.spa_calc_cost(self._s))

    def poses(self) -> tuple[np.ndarray, np.ndarray]:
        """(node_ids, poses (N,3)) in insertion order."""
        n = self.lib.spa_num_nodes(self._s)
        out = np.zeros(n * 4, np.float64)
        self.lib.spa_get_poses(
            self._s, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        out = out.reshape(n, 4)
        return out[:, 0].astype(np.int64), out[:, 1:]
