"""Frame-to-frame point-to-point ICP odometry.

The lesson2 workload (`lesson2/src/scan_match_icp.cc:50-164`,
ScanMatchICP): match each scan against the previous one with vanilla ICP and
accumulate the deltas. The reference logs the per-frame (x, y, yaw) delta and
takes ~0.12 s/frame via PCL; this accumulates a full trajectory with the
matmul-based matcher in ops/icp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_slam import geometry as geo
from tpu_slam.config import SLAMConfig
from tpu_slam.data.scan import Scan, index_scan
from tpu_slam.ops.icp import icp_match


class ICPOdometry:
    def __init__(self, cfg: SLAMConfig):
        self.cfg = cfg
        self._match = jax.jit(functools.partial(icp_match, cfg=cfg.icp))
        self.reset()

    def reset(self):
        self._prev = None
        self.pose = jnp.zeros(3, dtype=jnp.float32)

    def step(self, scan: Scan) -> np.ndarray:
        pts, valid = scan.points(), scan.valid
        if self._prev is None:
            self._prev = (pts, valid)
            return np.asarray(self.pose)
        # transform current scan onto previous (ScanMatchWithICP :135-164)
        d, err, n = self._match(pts, valid, *self._prev)
        self.pose = geo.compose(self.pose, d)
        self._prev = (pts, valid)
        return np.asarray(self.pose)

    def run(self, scans: Scan) -> np.ndarray:
        T = scans.ranges.shape[0]
        out = np.zeros((T, 3))
        for t in range(T):
            out[t] = self.step(index_scan(scans, t))
        return out
