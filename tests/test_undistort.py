import jax.numpy as jnp
import numpy as np

from tpu_slam import geometry as geo
from tpu_slam.config import ScanConfig
from tpu_slam.data import simulator as sim
from tpu_slam.data.scan import make_scan, index_scan
from tpu_slam.ops.undistort import (
    integrate_imu_rotation,
    interp_pose_timeline,
    undistort_scan,
)


def test_integrate_constant_omega():
    t = jnp.linspace(0.0, 1.0, 101)
    w = jnp.full((101,), 0.5)
    q = jnp.array([0.0, 0.5, 1.0])
    rot = integrate_imu_rotation(t, w, q)
    np.testing.assert_allclose(np.asarray(rot), [0.0, 0.25, 0.5], atol=1e-6)


def test_interp_pose_timeline_wraps():
    stamps = jnp.array([0.0, 1.0])
    poses = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, -3.0]])
    mid = interp_pose_timeline(stamps, poses, jnp.array([0.5]))
    assert abs(abs(float(mid[0, 2])) - np.pi) < 0.2


def test_zero_motion_is_identity():
    cfg = ScanConfig(num_beams=90)
    scan = make_scan(np.full(90, 2.0), cfg)
    it = jnp.linspace(-0.1, 0.3, 50)
    out = undistort_scan(
        scan,
        it,
        jnp.zeros(50),
        it,
        jnp.zeros((50, 3)),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(scan.points()), atol=1e-6
    )


def test_undistortion_recovers_true_geometry():
    """Distorted scan + exact IMU/odom → points match true world geometry
    expressed in the first-beam sensor frame (lidar_undistortion.cc:374-447
    semantics)."""
    cfg = ScanConfig(num_beams=180)
    world = sim.office_world(seed=5)
    # fast rotation → strong distortion
    traj = sim.circle_trajectory(30, radius=1.5, angular_rate=1.5)
    seq = sim.simulate_sequence(
        world, traj, cfg, noise_std=0.0, seed=1, motion_distortion=True,
        imu_rate_hz=500.0, odom_rate_hz=200.0,
    )
    t = 10
    scan = index_scan(
        make_scan(seq.ranges, cfg, stamp=seq.stamps.astype(np.float32)), t
    )
    corrected = undistort_scan(
        scan,
        jnp.asarray(seq.imu_stamps, dtype=jnp.float32),
        jnp.asarray(seq.imu_omega, dtype=jnp.float32),
        jnp.asarray(seq.odom_stamps, dtype=jnp.float32),
        jnp.asarray(seq.odom_poses, dtype=jnp.float32),
    )

    # ground truth: per-beam world endpoint, expressed in first-beam frame
    dt_beam = cfg.scan_period / cfg.num_beams
    bt = seq.stamps[t] + dt_beam * np.arange(cfg.num_beams)
    idx = np.clip(
        np.searchsorted(seq.stamps, bt, side="right") - 1, 0, len(seq.stamps) - 2
    )
    alpha = (bt - seq.stamps[idx]) / cfg.scan_period
    gt_beam_poses = np.asarray(
        geo.interpolate(
            jnp.asarray(seq.gt_poses[idx]),
            jnp.asarray(seq.gt_poses[idx + 1]),
            jnp.asarray(alpha),
        )
    )
    pts_local = np.asarray(scan.points())
    world_pts = np.asarray(
        geo.apply(jnp.asarray(gt_beam_poses), jnp.asarray(pts_local)[:, None, :])
    )[:, 0, :]
    first_frame = np.asarray(
        geo.apply(
            geo.inverse(jnp.asarray(gt_beam_poses[0])), jnp.asarray(world_pts)
        )
    )

    valid = np.asarray(scan.valid)
    err = np.linalg.norm(np.asarray(corrected) - first_frame, axis=-1)[valid]
    # uncorrected error for comparison
    raw_err = np.linalg.norm(pts_local - first_frame, axis=-1)[valid]
    assert raw_err.max() > 0.05  # distortion is significant
    assert err.max() < 0.02  # corrected within interp error
    assert err.mean() < raw_err.mean() / 10.0


def test_undistortion_feeds_matcher():
    """The lesson5 capability in context (BASELINE config 3: 'correction
    feeding matcher'): under fast rotation, PL-ICP frame-to-frame deltas on
    undistorted points must beat deltas on raw distorted points."""
    from tpu_slam.config import default_config
    from tpu_slam.ops.plicp import plicp_match

    cfg = default_config()
    scfg = ScanConfig(num_beams=180)
    world = sim.office_world(seed=5)
    T = 12
    traj = sim.circle_trajectory(T, radius=1.5, angular_rate=1.5)
    seq = sim.simulate_sequence(
        world, traj, scfg, noise_std=0.0, seed=1, motion_distortion=True,
        imu_rate_hz=500.0, odom_rate_hz=200.0,
    )
    scans = make_scan(seq.ranges, scfg, stamp=seq.stamps.astype(np.float32))

    raw = np.where(
        np.asarray(scans.valid)[..., None], np.asarray(scans.points()), 0.0
    ).astype(np.float32)
    corrected = np.stack(
        [
            np.asarray(
                undistort_scan(
                    index_scan(scans, t),
                    jnp.asarray(seq.imu_stamps, jnp.float32),
                    jnp.asarray(seq.imu_omega, jnp.float32),
                    jnp.asarray(seq.odom_stamps, jnp.float32),
                    jnp.asarray(seq.odom_poses, jnp.float32),
                )
            )
            for t in range(T)
        ]
    )
    valid = np.asarray(scans.valid)

    # gt deltas between first-beam poses (= poses at the scan stamps)
    gt_d = np.stack(
        [
            np.asarray(
                geo.relative(
                    jnp.asarray(seq.gt_poses[t - 1]),
                    jnp.asarray(seq.gt_poses[t]),
                )
            )
            for t in range(1, T)
        ]
    )

    def delta_rmse(pts):
        res = plicp_match(
            jnp.asarray(pts[1:]), jnp.asarray(valid[1:]),
            jnp.asarray(pts[:-1]), jnp.asarray(valid[:-1]),
            cfg.plicp,
        )
        err = np.asarray(res.pose) - gt_d
        err[:, 2] = np.arctan2(np.sin(err[:, 2]), np.cos(err[:, 2]))
        return (
            float(np.sqrt((err[:, :2] ** 2).mean())),
            float(np.sqrt((err[:, 2] ** 2).mean())),
        )

    raw_t, raw_r = delta_rmse(raw)
    cor_t, cor_r = delta_rmse(corrected)
    # correction must help substantially under strong rotation distortion
    assert cor_r < 0.5 * raw_r, (raw_r, cor_r)
    assert cor_t < 0.7 * raw_t, (raw_t, cor_t)
    # and be accurate in absolute terms
    assert cor_t < 0.01 and cor_r < 0.01, (cor_t, cor_r)
