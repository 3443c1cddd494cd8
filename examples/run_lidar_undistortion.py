"""Motion-distortion correction end-to-end (the lesson5 workload):
a fast-spinning robot renders rolling-shutter scans; IMU yaw-rate
integration + odometry interpolation undistort every beam into the
first-beam frame (lidar_undistortion.cc:96-463)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan
    from tpu_slam.ops.undistort import undistort_scan
    from tpu_slam import geometry as geo

    cfg = default_config().scan
    # fast rotation → heavy rolling-shutter distortion
    traj = sim.circle_trajectory(80, radius=1.2, angular_rate=2.0)
    world = sim.office_world(seed=21, clear_path=traj)
    seq = sim.simulate_sequence(
        world, traj, cfg, noise_std=0.0, seed=3, motion_distortion=True,
        imu_rate_hz=500.0, odom_rate_hz=200.0,
    )
    scans = make_scan(
        seq.ranges, cfg, stamp=seq.stamps.astype(np.float32)
    )

    fn = jax.jit(undistort_scan)
    inputs = (
        scans,
        jnp.asarray(seq.imu_stamps, jnp.float32),
        jnp.asarray(seq.imu_omega, jnp.float32),
        jnp.asarray(seq.odom_stamps, jnp.float32),
        jnp.asarray(seq.odom_poses, jnp.float32),
    )
    _ = np.asarray(fn(*inputs))  # compile + barrier
    t0 = time.perf_counter()
    corrected_np = np.asarray(fn(*inputs))
    dt = time.perf_counter() - t0

    # ground truth: each beam's world endpoint (from its own interpolated
    # pose) expressed in the first-beam frame — the frame the corrected
    # points live in (lidar_undistortion.cc:374-393)
    raw = np.asarray(scans.points())
    valid = np.asarray(scans.valid)
    dt_beam = cfg.scan_period / cfg.num_beams
    errs_raw, errs_cor = [], []
    for t in range(scans.ranges.shape[0] - 1):
        bt = seq.stamps[t] + dt_beam * np.arange(cfg.num_beams)
        idx = np.clip(
            np.searchsorted(seq.stamps, bt, side="right") - 1,
            0, len(seq.stamps) - 2,
        )
        alpha = (bt - seq.stamps[idx]) / cfg.scan_period
        beam_poses = np.asarray(
            geo.interpolate(
                jnp.asarray(seq.gt_poses[idx], jnp.float32),
                jnp.asarray(seq.gt_poses[idx + 1], jnp.float32),
                jnp.asarray(alpha, jnp.float32),
            )
        )
        world_pts = np.asarray(
            geo.apply(
                jnp.asarray(beam_poses), jnp.asarray(raw[t])[:, None, :]
            )
        )[:, 0, :]
        first_frame = np.asarray(
            geo.apply(
                geo.inverse(jnp.asarray(beam_poses[0])),
                jnp.asarray(world_pts),
            )
        )
        ok = valid[t]
        errs_raw.append(np.linalg.norm(raw[t] - first_frame, axis=-1)[ok])
        errs_cor.append(
            np.linalg.norm(corrected_np[t] - first_frame, axis=-1)[ok]
        )
    raw_err = np.concatenate(errs_raw)
    cor_err = np.concatenate(errs_cor)
    print(
        f"{scans.ranges.shape[0]} scans undistorted in {dt * 1e3:.1f} ms "
        f"(batched, one device program)"
    )
    print(f"mean endpoint error raw:       {raw_err.mean():.4f} m")
    print(f"mean endpoint error corrected: {cor_err.mean():.4f} m")
    assert cor_err.mean() < 0.25 * raw_err.mean()


if __name__ == "__main__":
    main()
