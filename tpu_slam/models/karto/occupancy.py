"""Occupancy-grid generation from all corrected scans.

The `updateMap` path of the karto node (`lesson6/src/karto_slam.cc:507-581`)
+ `karto::OccupancyGrid::CreateFromScans` (Karto.h:5659-6039): whenever the
map is requested, ray-trace EVERY stored scan from its corrected pose into
pass/hit counters and threshold. The reference rebuilds at <1 Hz on CPU
(SURVEY §6 ~0.09 s for 4M cells before ray tracing); here each scan is two
scatter-adds on device and the loop is a `lax.scan` over the stacked scan
store.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from tpu_slam import geometry as geo
from tpu_slam.config import GridConfig
from tpu_slam.ops import gridmap as gm


def compute_grid_bounds(
    poses: np.ndarray, range_threshold: float, resolution: float,
    margin: float = 0.5,
) -> GridConfig:
    """Auto-size the grid to cover all scans (the bounding-box pass of
    CreateFromScans, Karto.h:5659-5720)."""
    lo = poses[:, :2].min(axis=0) - range_threshold - margin
    hi = poses[:, :2].max(axis=0) + range_threshold + margin
    size_x = int(math.ceil((hi[0] - lo[0]) / resolution))
    size_y = int(math.ceil((hi[1] - lo[1]) / resolution))
    return GridConfig(
        resolution=resolution,
        size_x=size_x,
        size_y=size_y,
        origin_x=float(lo[0]),
        origin_y=float(lo[1]),
    )


def occupancy_from_scans(
    grid_cfg: GridConfig,
    poses: np.ndarray,  # (T, 3) corrected sensor poses
    pts_laser: np.ndarray,  # (T, N, 2)
    valid: np.ndarray,  # (T, N)
    range_threshold: float,
    min_pass_through: int = 2,
    occupancy_threshold: float = 0.1,
    scans_per_block: int = 1,
    engine: str = "auto",
) -> np.ndarray:
    """CreateFromScans: returns int8 (H, W) map (-1 unknown/0 free/100 occ).

    One jitted lax.scan accumulates pass/hit counters over the scan axis —
    the batched form of AddScan→RayTrace→UpdateCell (Karto.h:5852-5968).

    engine: "device" (XLA scatter loop), "native" (the C++ host rasterizer
    `native.karto_counts`, an operation-for-operation float32 mirror of the
    device path), or "auto" (native when available). Rasterization is the
    one primitive where a host scalar loop beats XLA-on-TPU — scatter-add
    cost is superlinear in update count (see BENCHMARKS.md), measured
    ~25x on whole-mission rebuilds — and map regeneration is a host-facing
    publish step, not part of the device compute path.

    scans_per_block: scans rasterized per scatter op. Counter-intuitively,
    1 is fastest on v5e: XLA TPU scatter cost grows SUPERLINEARLY in the
    per-op update count (512-scan 0.9M-cell rebuild: 1.5 s at B=1, 2.1 s at
    B=4, 5.7 s at B=16, 26 s at B=64), so batching scans into bigger
    scatters loses even though total updates are identical. Kept as a knob
    for other backends, where the associativity argument does pay off.
    """
    ncells = grid_cfg.size_y * grid_cfg.size_x
    T = poses.shape[0]
    if T == 0:
        return np.full((grid_cfg.size_y, grid_cfg.size_x), -1, np.int8)

    if engine != "device":
        from tpu_slam import native

        if native.available():
            # world endpoints from corrected poses (host, float32)
            p32 = np.asarray(poses, np.float32)
            c = np.cos(p32[:, 2])[:, None]
            s = np.sin(p32[:, 2])[:, None]
            pl32 = np.asarray(pts_laser, np.float32)
            wx = p32[:, 0:1] + c * pl32[..., 0] - s * pl32[..., 1]
            wy = p32[:, 1:2] + s * pl32[..., 0] + c * pl32[..., 1]
            ends = np.stack([wx, wy], axis=-1)
            pc, hc = native.karto_counts(
                p32[:, :2], ends, np.asarray(valid, bool), grid_cfg,
                range_threshold,
            )
            passed = pc > min_pass_through
            occ = passed & (
                hc / np.maximum(pc, 1) >= occupancy_threshold
            )
            return np.where(occ, 100, np.where(passed, 0, -1)).astype(
                np.int8
            )
        if engine == "native":
            raise RuntimeError("native library unavailable")
    C = min(scans_per_block, T)
    pad = (-T) % C
    if pad:
        poses = np.concatenate([poses, np.zeros((pad, 3), poses.dtype)])
        pts_laser = np.concatenate(
            [pts_laser, np.zeros((pad,) + pts_laser.shape[1:],
                                 pts_laser.dtype)]
        )
        valid = np.concatenate(
            [valid, np.zeros((pad,) + valid.shape[1:], bool)]
        )
    TB = (T + pad) // C

    @jax.jit
    def build(poses_d, pts_d, valid_d):
        def body(carry, inp):
            p, h = carry
            pose, pts, v = inp  # (C, 3), (C, N, 2), (C, N)
            wp = geo.apply(pose, pts)
            p, h = gm.karto_counts_update_scan(
                p, h, grid_cfg, pose[:, :2], wp, v, range_threshold
            )
            return (p, h), None

        init = (
            jnp.zeros((ncells,), jnp.int32),
            jnp.zeros((ncells,), jnp.int32),
        )
        (p, h), _ = jax.lax.scan(body, init, (poses_d, pts_d, valid_d))
        return gm.karto_occupancy(
            p, h, min_pass_through, occupancy_threshold
        )

    out = build(
        jnp.asarray(poses, jnp.float32).reshape(TB, C, 3),
        jnp.asarray(pts_laser, jnp.float32).reshape(
            TB, C, *pts_laser.shape[1:]
        ),
        jnp.asarray(valid).reshape(TB, C, *valid.shape[1:]),
    )
    return np.asarray(out).reshape(grid_cfg.size_y, grid_cfg.size_x)


def karto_map(slam, resolution: float = 0.05) -> tuple[np.ndarray, GridConfig]:
    """updateMap for a KartoSLAM instance: auto-bounded map from all scans."""
    slam.flush()  # apply any in-flight async correction first
    # rasterize from corrected SENSOR poses — pts_laser are laser-frame, so
    # the rig offset must stay applied (GetSensorPose, Karto.h:5331-5345);
    # trajectory() would strip it
    poses = np.asarray([r.corrected_pose for r in slam.scans]).reshape(-1, 3)
    if len(poses) == 0:
        raise ValueError("no scans processed yet")
    rng_th = slam.cfg.scan.range_threshold
    cfg = compute_grid_bounds(poses, rng_th, resolution)
    pts = np.stack([r.pts_laser for r in slam.scans])
    # occupancy ray filter from RAW ranges (AddScan skips r<=min / r>=max /
    # NaN, Karto.h:5913-5918); beam_valid is the matcher's finite mask
    sc = slam.cfg.scan
    valid = np.stack(
        [
            (
                np.isfinite(r.ranges)
                & (r.ranges > sc.range_min)
                & (r.ranges < sc.range_max)
                & (r.ranges <= rng_th)
            )
            if r.ranges is not None
            else r.beam_valid
            for r in slam.scans
        ]
    )
    return (
        occupancy_from_scans(cfg, poses, pts, valid, rng_th),
        cfg,
    )
