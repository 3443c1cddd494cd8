"""Frame-to-frame PL-ICP matcher node (lesson3's first stage).

`lesson3/src/scan_match_plicp.cc:38-300` (ScanMatchPLICP): match each scan
against the PREVIOUS scan (no keyframes, no prediction) and report the
(x, y, yaw) delta — the stepping stone the reference builds before the full
odometry. Equivalent to PLICPOdometry with kf_scan_count=1 and no motion
model; kept as its own node for workload parity (BASELINE.json config 2).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from tpu_slam import geometry as geo
from tpu_slam.config import SLAMConfig
from tpu_slam.data.scan import Scan, index_scan
from tpu_slam.ops.plicp import plicp_match


class ScanMatchPLICP:
    def __init__(self, cfg: SLAMConfig):
        self.cfg = cfg
        self._match = jax.jit(functools.partial(plicp_match, cfg=cfg.plicp))
        self.reset()

    def reset(self):
        self._prev = None
        self.pose = np.zeros(3)
        self.last_delta = np.zeros(3)

    def step(self, scan: Scan) -> np.ndarray:
        """Returns the frame-to-frame delta (the reference's printed
        transfrom [sic] x/y/yaw, scan_match_plicp.cc:~260)."""
        pts, valid = scan.points(), scan.valid
        if self._prev is None:
            self._prev = (pts, valid)
            return np.zeros(3)
        res = self._match(pts, valid, *self._prev)
        self.last_delta = np.asarray(res.pose, np.float64)
        self.pose = np.asarray(
            geo.compose(
                jax.numpy.asarray(self.pose, jax.numpy.float32),
                res.pose,
            ),
            np.float64,
        )
        self._prev = (pts, valid)
        return self.last_delta

    def run(self, scans: Scan) -> np.ndarray:
        T = scans.ranges.shape[0]
        out = np.zeros((T, 3))
        for t in range(T):
            self.step(index_scan(scans, t))
            out[t] = self.pose
        return out
