import numpy as np
import pytest

from tpu_slam.config import default_config
from tpu_slam.data import simulator as sim
from tpu_slam.data.scan import make_scan
from tpu_slam.models.icp_odometry import ICPOdometry
from tpu_slam.models.plicp_odometry import PLICPOdometry
from tpu_slam.utils.evaluation import ate_rmse, rpe_rmse


@pytest.fixture(scope="module")
def office_seq():
    cfg = default_config()
    traj = sim.circle_trajectory(80, radius=1.6, angular_rate=0.6)
    world = sim.office_world(seed=11, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=4)
    scans = make_scan(seq.ranges, cfg.scan, stamp=seq.stamps.astype(np.float32))
    return cfg, scans, seq


def test_plicp_odometry_ate(office_seq):
    cfg, scans, seq = office_seq
    odom = PLICPOdometry(cfg)
    est = odom.run(scans)
    ate = ate_rmse(est, seq.gt_poses)
    rpe = rpe_rmse(est, seq.gt_poses)
    # ~7.5 m of travel; reference-parity bound for a well-conditioned indoor run
    assert ate < 0.05, f"ATE {ate:.4f} too high"
    assert rpe < 0.01, f"RPE {rpe:.4f} too high"


def test_plicp_odometry_keyframes_reduce_drift(office_seq):
    """Keyframe matching (lesson3's point) must not be worse than
    frame-to-frame at the same matcher settings."""
    cfg, scans, seq = office_seq
    kf_est = PLICPOdometry(cfg).run(scans)
    # frame-to-frame: force keyframe every scan
    import dataclasses

    f2f_cfg = dataclasses.replace(
        cfg, keyframe=dataclasses.replace(cfg.keyframe, kf_scan_count=1)
    )
    f2f_est = PLICPOdometry(f2f_cfg).run(scans)
    assert ate_rmse(kf_est, seq.gt_poses) <= ate_rmse(f2f_est, seq.gt_poses) * 1.5


def test_icp_odometry_tracks(office_seq):
    cfg, scans, seq = office_seq
    est = ICPOdometry(cfg).run(scans)
    ate = ate_rmse(est, seq.gt_poses)
    # point-to-point frame-to-frame drifts more; loose bound
    assert ate < 0.25, f"ICP ATE {ate:.4f}"


def test_odometry_static_scene():
    cfg = default_config()
    world = sim.office_world(seed=2)
    traj = np.tile(np.array([0.5, 0.0, 0.1]), (10, 1))
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.003, seed=9)
    scans = make_scan(seq.ranges, cfg.scan, stamp=seq.stamps.astype(np.float32))
    est = PLICPOdometry(cfg).run(scans)
    # stationary robot: pose stays at origin within noise
    assert np.abs(est[:, :2]).max() < 0.01


def test_odometry_correction_bounds_gate():
    """max_linear_correction / max_angular_correction_deg (sm_params,
    plicp_odometry.cc:71-77): a correction exceeding the declared bounds is
    rejected — with a zero bound every match fails, so the trajectory must
    be pure constant-velocity prediction (zeros from rest) instead of
    following the scans."""
    import dataclasses

    cfg = default_config()
    traj = sim.circle_trajectory(10, radius=1.6, angular_rate=0.6)
    world = sim.office_world(seed=11, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=4)
    scans = make_scan(seq.ranges, cfg.scan, stamp=seq.stamps.astype(np.float32))

    strict = dataclasses.replace(
        cfg,
        plicp=dataclasses.replace(
            cfg.plicp, max_linear_correction=0.0,
            max_angular_correction_deg=0.0,
        ),
    )
    est = PLICPOdometry(strict).run(scans)
    # all matches rejected → velocity never leaves zero → stays at origin
    np.testing.assert_allclose(est, 0.0, atol=1e-6)
    # sane bounds on the same data track normally
    est2 = PLICPOdometry(cfg).run(scans)
    assert ate_rmse(est2, seq.gt_poses) < 0.05


def test_odometry_survives_sensor_blackout():
    """Match-failure fallback (plicp_odometry.cc:412-418 'not Converged'):
    a total sensor blackout must not produce NaN or unbounded jumps."""
    cfg = default_config()
    traj = sim.circle_trajectory(40, radius=1.6, angular_rate=0.6)
    world = sim.office_world(seed=21, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=4)
    r = seq.ranges.copy()
    r[20:23, :] = np.inf
    est = PLICPOdometry(cfg).run(
        make_scan(r, cfg.scan, stamp=seq.stamps.astype(np.float32))
    )
    assert np.isfinite(est).all()
    assert ate_rmse(est, seq.gt_poses) < 0.05
