import numpy as np
import pytest

from tpu_slam import native
from tpu_slam.data import simulator as sim

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_native_raycast_matches_numpy():
    world = sim.office_world(seed=5)
    rng = np.random.default_rng(0)
    origins = rng.uniform(-2, 2, (64, 2))
    angles = rng.uniform(-np.pi, np.pi, 64)
    a = native.raycast(world.segments, origins, angles, 12.0)
    b = sim.raycast(world, origins, angles, 12.0)
    both = np.isfinite(a) & np.isfinite(b)
    np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
    np.testing.assert_allclose(a[both], b[both], atol=1e-9)


def test_bresenham_vs_scatter_rasterizer():
    """The device scatter rasterizer (sampled rays) vs the reference-exact
    native Bresenham: occupied cells must be IDENTICAL; free cells differ by
    discretization (the sampler marks every ray-crossed cell — supercover —
    while 8-connected Bresenham picks one diagonal neighbor at corner
    crossings, visiting some cells the true ray never touches). Require
    ≥85% of Bresenham's free cells covered."""
    import jax.numpy as jnp

    from tpu_slam.config import GridConfig
    from tpu_slam.ops import gridmap as gm

    cfg = GridConfig(resolution=0.1, size_x=128, size_y=128,
                     origin_x=-6.4, origin_y=-6.4)
    rng = np.random.default_rng(1)
    n = 90
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    ranges = rng.uniform(1.0, 5.5, n)
    origin = np.array([0.3, -0.2])
    endpoints = origin + np.stack(
        [ranges * np.cos(angles), ranges * np.sin(angles)], -1
    )
    valid = np.ones(n, bool)

    free_d, occ_d = gm.scan_masks(
        cfg, jnp.asarray(origin, jnp.float32),
        jnp.asarray(endpoints, jnp.float32), jnp.asarray(valid),
    )
    free_d = np.asarray(free_d).reshape(128, 128)
    occ_d = np.asarray(occ_d).reshape(128, 128)

    oc = (origin - [cfg.origin_x, cfg.origin_y]) / cfg.resolution
    ec = (endpoints - [cfg.origin_x, cfg.origin_y]) / cfg.resolution
    free_n, occ_n = native.bresenham_masks(oc, ec, valid, 128, 128)

    # occupied cells identical
    np.testing.assert_array_equal(occ_d, occ_n)
    # free coverage: device covers nearly all Bresenham cells
    cover = (free_d & free_n).sum() / free_n.sum()
    assert cover > 0.85, cover
    # and free cells are a superset-ish (device marks more crossed cells)
    assert free_d.sum() >= free_n.sum()


def test_decimate():
    r = np.array([3.0, 1.0, 2.0, 5.0, 4.0, 0.5], np.float32)
    out = native.decimate(r, 2)
    np.testing.assert_allclose(out, [1.0, 2.0, 0.5])


class TestNativeBagDecoder:
    """ts_bag_* native decoder vs the pure-python reader (golden)."""

    def _make_bag(self, tmp_path, compression):
        import numpy as np
        from tpu_slam.data import rosbag

        rng = np.random.default_rng(7)
        msgs = []
        for i in range(5):
            scan = {
                "stamp": 10.0 + 0.1 * i,
                "angle_min": -1.5,
                "angle_max": 1.5,
                "angle_increment": 0.05,
                "time_increment": 1e-4,
                "scan_time": 0.1,
                "range_min": 0.1,
                "range_max": 8.0,
                "ranges": rng.uniform(0.3, 7.0, 61).astype(np.float32),
            }
            msgs.append(
                ("scan", "sensor_msgs/LaserScan", scan["stamp"],
                 rosbag.serialize_laser_scan(scan))
            )
            msgs.append(
                ("imu", "sensor_msgs/Imu", scan["stamp"],
                 rosbag.serialize_imu(scan["stamp"], 0.1 * i,
                                      [0.0, 0.0, 0.2 + 0.01 * i]))
            )
            msgs.append(
                ("odom", "nav_msgs/Odometry", scan["stamp"],
                 rosbag.serialize_odometry(
                     scan["stamp"], [0.1 * i, -0.05 * i, 0.02 * i],
                     twist=[0.9, 0.0, 0.2]))
            )
        path = str(tmp_path / f"test_{compression}.bag")
        rosbag.write_bag(path, msgs, compression=compression)
        return path, msgs

    @pytest.mark.parametrize("compression", ["none", "bz2"])
    def test_scan_decode_matches_python(self, tmp_path, compression):
        import numpy as np
        from tpu_slam import native
        from tpu_slam.data import rosbag

        if not native.available():
            pytest.skip("no native library")
        path, _ = self._make_bag(tmp_path, compression)
        out = native.bag_read_scans(path, "scan")
        assert out is not None
        ranges, stamps, meta = out
        py = [p for m, p in rosbag.parse_messages(path, {"scan"})]
        assert ranges.shape == (5, 61)
        for i, parsed in enumerate(py):
            np.testing.assert_array_equal(ranges[i], parsed["ranges"])
            assert abs(stamps[i] - parsed["stamp"]) < 1e-6
        for k in ("angle_min", "angle_increment", "range_max"):
            assert abs(meta[k] - py[0][k]) < 1e-6

    def test_loader_prefers_native_and_matches(self, tmp_path):
        import numpy as np
        from tpu_slam.data import rosbag

        path, _ = self._make_bag(tmp_path, "bz2")
        ranges, stamps, meta = rosbag.load_scan_array(path, "scan")
        assert ranges.shape == (5, 61) and len(stamps) == 5
        assert meta["range_min"] == pytest.approx(0.1)

    def test_imu_odom_decode(self, tmp_path):
        import numpy as np
        from tpu_slam import native
        from tpu_slam.data import rosbag

        if not native.available():
            pytest.skip("no native library")
        path, _ = self._make_bag(tmp_path, "none")
        stamps, yaw, gyro = native.bag_read_imu(path, "imu")
        py = [p for m, p in rosbag.parse_messages(path, {"imu"})]
        assert len(stamps) == 5
        for i, parsed in enumerate(py):
            assert yaw[i] == pytest.approx(parsed["yaw"], abs=1e-9)
            np.testing.assert_allclose(
                gyro[i], parsed["angular_velocity"], atol=1e-12
            )
        stamps, pose, twist = native.bag_read_odom(path, "odom")
        pyo = [p for m, p in rosbag.parse_messages(path, {"odom"})]
        for i, parsed in enumerate(pyo):
            np.testing.assert_allclose(pose[i], parsed["pose"], atol=1e-9)
            assert twist[i][0] == pytest.approx(0.9)
            assert twist[i][2] == pytest.approx(0.2)


def test_native_karto_counts_matches_device():
    """ts_karto_counts mirrors ops/gridmap.karto_counts_update_scan
    (float32, exact Karto Bresenham/threshold semantics): identical f32
    arithmetic on both sides, so the maps must be cell-identical."""
    import dataclasses

    import jax.numpy as jnp

    from tpu_slam import native
    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import index_scan, make_scan
    from tpu_slam.models.karto.occupancy import (
        compute_grid_bounds, occupancy_from_scans,
    )

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        scan=dataclasses.replace(
            cfg.scan, num_beams=120, range_max=6.0, range_threshold=5.0
        ),
    )
    traj = sim.circle_trajectory(24, radius=1.4, angular_rate=0.6)
    world = sim.office_world(seed=9, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=3)
    scans = make_scan(seq.ranges, cfg.scan)
    ranges = np.asarray(scans.ranges)
    with np.errstate(invalid="ignore"):
        pts = np.asarray(scans.points()).astype(np.float32)
    pts[~np.isfinite(pts)] = 0.0
    poses = seq.gt_poses.astype(np.float32)
    gcfg = compute_grid_bounds(poses, cfg.scan.range_threshold, 0.05)

    args = (gcfg, poses, pts, ranges, cfg.scan.range_threshold)
    kw = dict(min_range=cfg.scan.range_min, max_range=cfg.scan.range_max)
    m_dev = occupancy_from_scans(*args, engine="device", **kw)
    m_nat = occupancy_from_scans(*args, engine="native", **kw)
    np.testing.assert_array_equal(m_dev, m_nat)
