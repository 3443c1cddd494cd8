import dataclasses
import math

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_slam import geometry as geo
from tpu_slam.config import default_config
from tpu_slam.data import simulator as sim
from tpu_slam.data.scan import make_scan
from tpu_slam.models.karto.pipeline import KartoSLAM
from tpu_slam.utils.evaluation import ate_rmse


def small_karto_cfg():
    cfg = default_config()
    # shrink grids for CPU test speed: coarser correlation grid + shorter range
    cfg = dataclasses.replace(
        cfg,
        scan=dataclasses.replace(
            cfg.scan, num_beams=180, range_max=6.0, range_threshold=5.0
        ),
        correlative=dataclasses.replace(
            cfg.correlative,
            correlation_search_space_resolution=0.02,
        ),
        loop=dataclasses.replace(
            cfg.loop,
            loop_search_space_dimension=4.0,
            loop_search_maximum_distance=3.0,
            loop_match_minimum_chain_size=5,
        ),
    )
    return cfg


def drifted_odometry(gt, seed=0, trans_sigma=0.02, rot_sigma=0.004):
    """Integrate gt relative motions with noise → drifting wheel odometry."""
    rng = np.random.default_rng(seed)
    odom = [gt[0].copy()]
    for i in range(1, len(gt)):
        d = np.array(
            geo.relative(jnp.asarray(gt[i - 1]), jnp.asarray(gt[i]))
        )
        d[:2] += rng.normal(0, trans_sigma, 2)
        d[2] += rng.normal(0, rot_sigma)
        odom.append(
            np.asarray(geo.compose(jnp.asarray(odom[-1]), jnp.asarray(d)))
        )
    return np.asarray(odom)


@pytest.fixture(scope="module")
def loop_setup():
    cfg = small_karto_cfg()
    traj = sim.loop_trajectory(arm=9.0, width=2.6, speed=0.9)
    world = sim.corridor_loop_world(arm=9.0, width=2.6)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=8)
    odom = drifted_odometry(seq.gt_poses, seed=3)
    scans = make_scan(seq.ranges, cfg.scan, stamp=seq.stamps.astype(np.float32))
    return cfg, scans, seq, odom


def test_karto_front_end_tracks(loop_setup):
    """Scan matching alone (loop closing off) keeps ATE below raw odometry."""
    cfg, scans, seq, odom = loop_setup
    cfg2 = dataclasses.replace(
        cfg, karto=dataclasses.replace(cfg.karto, do_loop_closing=False)
    )
    slam = KartoSLAM(cfg2)
    accepted = slam.run(scans, odom)
    assert len(accepted) > 30  # HasMovedEnough decimates ~10Hz scans
    est = slam.trajectory()
    gt = seq.gt_poses[accepted]
    ate = ate_rmse(est, gt)
    ate_odom = ate_rmse(odom[accepted], gt)
    assert ate < ate_odom * 0.9, (ate, ate_odom)
    assert ate < 0.4, ate


def test_karto_loop_closure_improves(loop_setup):
    cfg, scans, seq, odom = loop_setup
    slam = KartoSLAM(cfg)
    accepted = slam.run(scans, odom)
    est = slam.trajectory()
    gt = seq.gt_poses[accepted]
    ate = ate_rmse(est, gt)
    assert slam.loop_closures >= 1, "no loop closures found"
    # with loop closure the full-loop trajectory should be well under 20 cm
    assert ate < 0.2, ate


def test_karto_async_loop_closure_matches_sync(loop_setup):
    """Pipeline-parallel back-end: corrections dispatched asynchronously and
    propagated chain-consistently must land within a few cm of the inline
    (reference-semantics) solve."""
    cfg, scans, seq, odom = loop_setup
    cfg2 = dataclasses.replace(
        cfg, karto=dataclasses.replace(cfg.karto, async_loop_closure=True)
    )
    slam = KartoSLAM(cfg2)
    accepted = slam.run(scans, odom)
    est = slam.trajectory()
    gt = seq.gt_poses[accepted]
    ate = ate_rmse(est, gt)
    assert slam.loop_closures >= 1, "no loop closures found"
    assert ate < 0.2, ate


def test_karto_rejects_stationary(loop_setup):
    cfg, scans, seq, odom = loop_setup
    slam = KartoSLAM(cfg)
    from tpu_slam.data.scan import index_scan

    s0 = index_scan(scans, 0)
    assert slam.process(s0, odom[0])
    # same pose again → HasMovedEnough gate rejects
    assert not slam.process(s0, odom[0])
    assert len(slam.scans) == 1
