"""Offline batch SLAM (models/offline.py): chain integration, multi-start
loop matching, global optimization."""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_slam import geometry as geo
from tpu_slam.config import default_config
from tpu_slam.data import simulator as sim
from tpu_slam.data.scan import make_scan
from tpu_slam.models.offline import _loop_candidates, offline_slam
from tpu_slam.utils.evaluation import ate_rmse


def test_compose_chain_matches_sequential():
    rng = np.random.default_rng(0)
    pose0 = jnp.asarray(rng.normal(0, 1, 3), jnp.float32)
    rels = jnp.asarray(rng.normal(0, 0.3, (50, 3)), jnp.float32)
    out = np.asarray(geo.compose_chain(pose0, rels))
    ref = [np.asarray(pose0)]
    for k in range(50):
        ref.append(np.asarray(geo.compose(jnp.asarray(ref[-1]), rels[k])))
    ref = np.stack(ref)
    np.testing.assert_allclose(out[:, :2], ref[:, :2], atol=1e-4)
    dth = np.arctan2(
        np.sin(out[:, 2] - ref[:, 2]), np.cos(out[:, 2] - ref[:, 2])
    )
    np.testing.assert_allclose(dth, 0.0, atol=1e-5)


def test_loop_candidates_gap_radius_nms():
    # square path revisiting the origin
    poses = np.zeros((100, 3))
    poses[:, 0] = np.linspace(0, 10, 100)
    poses[90:, 0] = np.linspace(0, 0.5, 10)  # jump back near start
    cfg = default_config().offline
    cfg = dataclasses.replace(cfg, loop_min_gap=40, loop_radius=1.0)
    cands = _loop_candidates(poses, cfg, set())
    assert cands, "revisit not detected"
    for i, j in cands:
        assert j - i >= 40
        assert np.linalg.norm(poses[i, :2] - poses[j, :2]) <= 1.0
    # NMS: no two candidates within the gap on both ends
    for a in range(len(cands)):
        for b in range(a + 1, len(cands)):
            assert not (
                abs(cands[a][0] - cands[b][0]) < cfg.loop_nms_gap
                and abs(cands[a][1] - cands[b][1]) < cfg.loop_nms_gap
            )


def _corridor_mission():
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        scan=dataclasses.replace(
            cfg.scan, num_beams=128, range_max=6.0, range_threshold=5.0
        ),
        offline=dataclasses.replace(
            cfg.offline, max_candidates=6, seeds_xy=3, seeds_theta=3,
            seed_xy=0.5, seed_theta=math.radians(12.0), rounds=2,
            loop_min_gap=40,
        ),
    )
    arm, width = 6.0, 2.2
    m = (arm / 2 + (arm / 2 - width)) / 2
    wps = np.array(
        [[-m, -m], [m, -m], [m, m], [-m, m], [-m, -m], [0.0, -m]]
    )
    traj = sim.waypoint_trajectory(wps, speed=0.9, dt=0.1)
    world = sim.corridor_loop_world(arm=arm, width=width)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=5)
    scans = make_scan(seq.ranges, cfg.scan)
    # drifting odometry guesses (the karto-example recipe)
    rng = np.random.default_rng(3)
    odom = [seq.gt_poses[0].copy()]
    for i in range(1, len(seq.gt_poses)):
        d = np.array(
            geo.relative(
                jnp.asarray(seq.gt_poses[i - 1]), jnp.asarray(seq.gt_poses[i])
            )
        )
        d[:2] += rng.normal(0, 0.01, 2)
        d[2] += rng.normal(0, 0.002)
        odom.append(
            np.asarray(geo.compose(jnp.asarray(odom[-1]), jnp.asarray(d)))
        )
    return cfg, scans, seq, np.asarray(odom)


def test_offline_slam_corridor_loop():
    """One corridor lap: the offline pipeline must find the start-revisit
    loop closure and the optimized trajectory must beat the raw chain."""
    cfg, scans, seq, odom = _corridor_mission()
    res = offline_slam(scans, cfg, odom=odom)
    T = len(seq.gt_poses)
    assert res.poses.shape == (T, 3)
    assert res.loops, "no loop closures accepted"
    for e in res.loops:
        assert e.j - e.i >= cfg.offline.loop_min_gap
        assert e.error <= cfg.offline.max_mean_error
        # the loop edge must agree with ground truth UNDER ITS OWN
        # covariance: in corridor geometry a match may slide along the
        # corridor axis, and the honest GN covariance must declare that
        # direction uncertain (low Mahalanobis distance) while staying
        # tight across the corridor
        gt_rel = np.asarray(
            geo.relative(
                jnp.asarray(seq.gt_poses[e.i]), jnp.asarray(seq.gt_poses[e.j])
            )
        )
        d = e.mean - gt_rel
        d[2] = math.atan2(math.sin(d[2]), math.cos(d[2]))
        chi2 = float(d @ np.linalg.inv(e.covariance) @ d)
        assert chi2 < 25.0, (e.i, e.j, d, chi2)
    ate_chain = ate_rmse(res.chain_poses, seq.gt_poses)
    ate_opt = ate_rmse(res.poses, seq.gt_poses)
    assert ate_opt < 0.08
    assert ate_opt <= ate_chain + 1e-6


@pytest.mark.slow
def test_offline_slam_sharded_matches_unsharded():
    """offline_slam(mesh=8-device CPU mesh) must reproduce the unsharded
    result: the batched matcher is embarrassingly parallel over pairs and
    the pair batches are padded to mesh-divisible buckets."""
    from tpu_slam.parallel.mesh import make_mesh

    cfg, scans, seq, odom = _corridor_mission()
    base = offline_slam(scans, cfg, odom=odom)
    sharded = offline_slam(scans, cfg, odom=odom, mesh=make_mesh(8))
    np.testing.assert_allclose(
        sharded.chain_poses, base.chain_poses, atol=1e-5
    )
    assert len(sharded.loops) == len(base.loops)
    np.testing.assert_allclose(sharded.poses, base.poses, atol=5e-4)


def test_offline_undistortion_mission():
    """Lesson5 capability in the offline pipeline: whole-mission batched
    undistortion (one device call) equals the per-scan op, and feeding the
    corrected points to offline_slam beats matching raw distorted scans
    under fast rotation."""
    import jax.numpy as jnp

    from tpu_slam.config import ScanConfig
    from tpu_slam.data.scan import index_scan
    from tpu_slam.models.offline import undistort_mission
    from tpu_slam.ops.undistort import undistort_scan

    cfg = default_config()
    scfg = ScanConfig(num_beams=180)
    cfg = dataclasses.replace(cfg, scan=scfg)
    world = sim.office_world(seed=5)
    T = 16
    traj = sim.circle_trajectory(T, radius=1.5, angular_rate=1.5)
    seq = sim.simulate_sequence(
        world, traj, scfg, noise_std=0.0, seed=1, motion_distortion=True,
        imu_rate_hz=500.0, odom_rate_hz=200.0,
    )
    scans = make_scan(seq.ranges, scfg, stamp=seq.stamps.astype(np.float32))

    corrected = undistort_mission(
        scans, seq.imu_stamps, seq.imu_omega, seq.odom_stamps,
        seq.odom_poses,
    )
    # batched call == per-scan op
    one = np.asarray(
        undistort_scan(
            index_scan(scans, 5),
            jnp.asarray(seq.imu_stamps, jnp.float32),
            jnp.asarray(seq.imu_omega, jnp.float32),
            jnp.asarray(seq.odom_stamps, jnp.float32),
            jnp.asarray(seq.odom_poses, jnp.float32),
        )
    )
    v5 = np.asarray(scans.valid)[5]
    np.testing.assert_allclose(
        corrected[5][v5], one[v5], atol=1e-5
    )

    raw = offline_slam(scans, cfg, odom=seq.gt_poses)
    fixed = offline_slam(
        scans, cfg, odom=seq.gt_poses, corrected_pts=corrected
    )
    ate_raw = ate_rmse(raw.chain_poses, seq.gt_poses)
    ate_fix = ate_rmse(fixed.chain_poses, seq.gt_poses)
    assert ate_fix < ate_raw * 0.5, (ate_raw, ate_fix)


def test_loop_selector_matches_host_gating():
    """make_loop_selector (device-side best-seed argmin + inlier/basin/
    error gates, fetched as (C, 16) winner rows) must reproduce the host
    reference computation over the full packed (C*S, 14) results."""
    from tpu_slam.parallel.distributed_step import (
        make_loop_selector, make_packed_indexed_matcher,
    )

    cfg, scans, seq, odom = _corridor_mission()
    ranges = np.asarray(scans.ranges)
    valid = np.asarray(scans.valid)
    angles = np.asarray(scans.angles)
    a0 = angles[0] if angles.ndim == 2 else angles
    T = ranges.shape[0]
    store = np.where(valid & np.isfinite(ranges), ranges, 0.0).astype(
        np.float32
    )
    dirs = np.stack([np.cos(a0), np.sin(a0)], -1).astype(np.float32)

    # genuine revisit candidates (from ground-truth proximity) with a
    # 3-seed lattice; relatives predicted from ground truth so the gates
    # have real accepts to exercise
    cands = _loop_candidates(seq.gt_poses, cfg.offline, set())
    assert len(cands) >= 4
    cands = cands[:8]
    C, S = len(cands), 3
    ci = np.asarray([c[0] for c in cands])
    cj = np.asarray([c[1] for c in cands])
    from tpu_slam import geometry_np as gnp

    rel = gnp.relative(
        seq.gt_poses[ci], seq.gt_poses[cj]
    ).astype(np.float32)
    seeds = np.asarray(
        [[0, 0, 0], [0.3, -0.2, 0.05], [-0.25, 0.3, -0.04]], np.float32
    )
    g = (rel[:, None, :] + seeds[None]).reshape(C * S, 3)
    si = np.repeat(cj, S).astype(np.int32)
    ti = np.repeat(ci, S).astype(np.int32)
    gates = np.asarray([0.35, 0.5, 0.21, 0.06], np.float32)

    ds, dv, dd = jnp.asarray(store), jnp.asarray(valid), jnp.asarray(dirs)
    sel = np.asarray(
        make_loop_selector(cfg, S)(
            ds, dv, dd, jnp.asarray(si), jnp.asarray(ti), jnp.asarray(g),
            jnp.asarray(rel), jnp.asarray(gates),
        )
    )
    pk = np.asarray(
        make_packed_indexed_matcher(cfg)(
            ds, dv, dd, jnp.asarray(si), jnp.asarray(ti), jnp.asarray(g)
        ),
        np.float64,
    )
    # host reference: same gates over the full packed results
    err = pk[:, 3].reshape(C, S)
    inl = pk[:, 4].reshape(C, S)
    pose = pk[:, :3].reshape(C, S, 3)
    nv = valid[cj].sum(-1)
    frac = inl / np.maximum(nv[:, None], 1)
    dev = pose - rel[:, None].astype(np.float64)
    dth = np.arctan2(np.sin(dev[..., 2]), np.cos(dev[..., 2]))
    ok = (
        (frac >= gates[0])
        & (np.hypot(dev[..., 0], dev[..., 1]) <= gates[1])
        & (np.abs(dth) <= gates[2])
    )
    err_m = np.where(ok, err, np.inf)
    best = np.argmin(err_m, 1)
    rows = np.arange(C)
    accept = np.isfinite(err_m[rows, best]) & (err_m[rows, best] <= gates[3])
    assert accept.any(), "test must exercise accepted candidates"
    np.testing.assert_array_equal(sel[:, 15] > 0.5, accept)
    np.testing.assert_allclose(
        sel[:, :3], pose[rows, best], rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        sel[:, 14], frac[rows, best], rtol=1e-6, atol=1e-6
    )
