import numpy as np

from tpu_slam.config import ScanConfig
from tpu_slam.data import simulator as sim
from tpu_slam.utils.evaluation import ate_rmse, rpe_rmse


def test_raycast_box_center():
    w = sim.World.box(-2, -2, 2, 2)
    angles = np.array([0.0, np.pi / 2, np.pi, -np.pi / 2])
    r = sim.raycast(w, np.zeros((4, 2)), angles, range_max=10.0)
    np.testing.assert_allclose(r, 2.0, atol=1e-9)


def test_raycast_diagonal_and_miss():
    w = sim.World(np.array([[1.0, -1.0, 1.0, 1.0]]))  # vertical wall at x=1
    r = sim.raycast(
        w, np.zeros((3, 2)), np.array([0.0, np.pi / 4, np.pi]), 10.0
    )
    np.testing.assert_allclose(r[0], 1.0, atol=1e-9)
    np.testing.assert_allclose(r[1], np.sqrt(2), atol=1e-9)
    assert np.isinf(r[2])


def test_simulate_sequence_shapes():
    cfg = ScanConfig(num_beams=90, range_max=15.0)
    world = sim.office_world(seed=3)
    poses = sim.circle_trajectory(20, radius=1.5)
    seq = sim.simulate_sequence(world, poses, cfg, seed=1)
    assert seq.ranges.shape == (20, 90)
    assert np.isfinite(seq.ranges).mean() > 0.8  # indoor: most beams return
    assert seq.gt_poses.shape == (20, 3)
    assert seq.imu_omega.shape == seq.imu_stamps.shape
    # circle at angular_rate 0.25 → omega ≈ 0.25 rad/s
    assert abs(np.median(seq.imu_omega) - 0.25) < 0.02


def test_motion_distortion_changes_ranges():
    cfg = ScanConfig(num_beams=180)
    world = sim.office_world(seed=3)
    poses = sim.circle_trajectory(10, radius=1.5, angular_rate=2.0)
    a = sim.simulate_sequence(world, poses, cfg, noise_std=0.0, seed=1)
    b = sim.simulate_sequence(
        world, poses, cfg, noise_std=0.0, seed=1, motion_distortion=True
    )
    both = np.isfinite(a.ranges) & np.isfinite(b.ranges)
    diff = np.abs(a.ranges - b.ranges)[both]
    assert diff.max() > 0.01  # distortion is visible


def test_ate_perfect_and_offset():
    poses = sim.circle_trajectory(50)
    assert ate_rmse(poses, poses) < 1e-12
    g = np.array([1.0, -2.0, 0.3])
    moved = np.stack(
        [
            np.cos(g[2]) * poses[:, 0] - np.sin(g[2]) * poses[:, 1] + g[0],
            np.sin(g[2]) * poses[:, 0] + np.cos(g[2]) * poses[:, 1] + g[1],
            poses[:, 2] + g[2],
        ],
        axis=-1,
    )
    # rigidly transformed trajectory aligns back to zero error
    assert ate_rmse(moved, poses) < 1e-9
    assert rpe_rmse(moved, poses) < 1e-9


def test_loop_trajectory_closes():
    traj = sim.loop_trajectory()
    start, end = traj[0, :2], traj[-1, :2]
    # ends near the first arm again (revisits start region)
    assert np.hypot(*(traj[-1, :2] - traj[0, :2])) < 8.0
    assert traj.shape[0] > 200
