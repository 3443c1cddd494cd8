import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_slam.config import SolverConfig, default_config
from tpu_slam.parallel.mesh import make_mesh, replicated, shard_batch
from tpu_slam.parallel.distributed_step import (
    make_batched_matcher,
    make_sharded_training_step,
)
from tpu_slam.solver.distributed import (
    make_distributed_cg_delta,
    make_distributed_lm_delta,
)
from tpu_slam.solver.pose_graph import PoseGraphSolver, dense_solve, normal_equations


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def ring(n=17, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.stack([5 * np.cos(th), 5 * np.sin(th), th], -1).astype(np.float32)
    E = n
    ei = np.arange(E) % n
    ej = (np.arange(E) + 1) % n
    means = []
    for i in range(E):
        a, b = gt[ei[i]], gt[ej[i]]
        c, s = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        m = np.array(
            [c * d[0] + s * d[1], -s * d[0] + c * d[1], b[2] - a[2]]
        )
        m[2] = np.arctan2(np.sin(m[2]), np.cos(m[2]))
        means.append(m + rng.normal(0, noise, 3))
    return gt, ei.astype(np.int32), ej.astype(np.int32), np.asarray(
        means, np.float32
    )


def test_distributed_lm_matches_single_device():
    """Edge-sharded psum assembly must equal the single-device solve."""
    mesh = make_mesh(8)
    gt, ei, ej, means = ring(n=17)
    M, E = 17, 17
    pad = (-E) % 8
    Ep = E + pad
    eip = np.concatenate([ei, np.zeros(pad, np.int32)])
    ejp = np.concatenate([ej, np.zeros(pad, np.int32)])
    meansp = np.concatenate([means, np.zeros((pad, 3), np.float32)])
    infos = np.tile(np.eye(3, dtype=np.float32) * 50, (Ep, 1, 1))
    mask = np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])
    free = np.arange(M) > 0
    poses = gt + np.random.default_rng(1).normal(0, 0.05, gt.shape).astype(
        np.float32
    )
    poses[0] = gt[0]
    lam = jnp.float32(1e-3)

    # single-device reference
    Hd, Hij, b = normal_equations(
        jnp.asarray(poses), jnp.asarray(eip), jnp.asarray(ejp),
        jnp.asarray(meansp), jnp.asarray(infos), jnp.asarray(mask), M,
    )
    want = dense_solve(
        Hd, Hij, jnp.asarray(eip), jnp.asarray(ejp), b, lam,
        jnp.asarray(free),
    )

    args = (
        replicated(mesh, jnp.asarray(poses)),
        shard_batch(mesh, jnp.asarray(eip)),
        shard_batch(mesh, jnp.asarray(ejp)),
        shard_batch(mesh, jnp.asarray(meansp)),
        shard_batch(mesh, jnp.asarray(infos)),
        shard_batch(mesh, jnp.asarray(mask)),
        lam,
        replicated(mesh, jnp.asarray(free)),
    )
    got = make_distributed_lm_delta(mesh, M)(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    got_cg = make_distributed_cg_delta(mesh, M, cg_iters=60)(*args)
    np.testing.assert_allclose(
        np.asarray(got_cg), np.asarray(want), atol=5e-3
    )


def test_sharded_matcher_matches_unsharded():
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        scan=dataclasses.replace(cfg.scan, num_beams=90, range_max=6.0),
        plicp=dataclasses.replace(cfg.plicp, max_iterations=4),
    )
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan

    B = 8
    traj = sim.circle_trajectory(B + 1, radius=1.2)
    world = sim.office_world(seed=3, size=8.0, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, seed=1)
    scans = make_scan(seq.ranges, cfg.scan)
    pts = np.where(
        np.asarray(scans.valid)[..., None], np.asarray(scans.points()), 0.0
    ).astype(np.float32)
    valid = np.asarray(scans.valid)
    args_np = (pts[1:], valid[1:], pts[:-1], valid[:-1],
               np.zeros((B, 3), np.float32))

    plain = make_batched_matcher(cfg)(*map(jnp.asarray, args_np))
    mesh = make_mesh(8)
    sharded_args = tuple(shard_batch(mesh, jnp.asarray(a)) for a in args_np)
    sharded = make_batched_matcher(cfg, mesh)(*sharded_args)
    np.testing.assert_allclose(
        np.asarray(sharded.pose), np.asarray(plain.pose), atol=1e-5
    )


def test_sharded_matcher_partitions_without_collectives():
    """The data-parallel matcher must partition into a communication-FREE
    program (batch axis fully sharded → per-device ICP, no ICI traffic):
    scaling efficiency on real meshes is then bounded only by per-chip
    throughput. Asserted on the partitioned HLO, which is what a real
    multi-chip slice would execute."""
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        scan=dataclasses.replace(cfg.scan, num_beams=90, range_max=6.0),
        plicp=dataclasses.replace(cfg.plicp, max_iterations=4),
    )
    B, N = 16, 90
    mesh = make_mesh(8)
    args = tuple(
        shard_batch(mesh, jnp.asarray(a))
        for a in (
            np.zeros((B, N, 2), np.float32), np.ones((B, N), bool),
            np.zeros((B, N, 2), np.float32), np.ones((B, N), bool),
            np.zeros((B, 3), np.float32),
        )
    )
    hlo = make_batched_matcher(cfg, mesh).lower(*args).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "all-to-all", "reduce-scatter"):
        assert coll not in hlo, f"unexpected collective {coll} in matcher"


def test_distributed_lm_uses_one_psum_per_assembly():
    """The edge-sharded LM delta must reduce its normal equations with
    all-reduce(s) (the psum) and nothing else — no all-to-all / gather
    traffic that would not ride ICI efficiently."""
    mesh = make_mesh(8)
    M, E = 17, 24
    ei = np.arange(E, dtype=np.int32) % (M - 1)
    ej = ei + 1
    args = (
        replicated(mesh, jnp.zeros((M, 3), jnp.float32)),
        shard_batch(mesh, jnp.asarray(ei)),
        shard_batch(mesh, jnp.asarray(ej)),
        shard_batch(mesh, jnp.zeros((E, 3), jnp.float32)),
        shard_batch(mesh, jnp.tile(np.eye(3, dtype=np.float32), (E, 1, 1))),
        shard_batch(mesh, jnp.ones((E,), bool)),
        jnp.float32(1e-3),
        replicated(mesh, jnp.asarray(np.arange(M) > 0)),
    )
    fn = make_distributed_lm_delta(mesh, M)
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    assert "all-reduce" in hlo, "expected a psum in the distributed LM"
    assert "all-to-all" not in hlo


@pytest.mark.slow
def test_training_step_runs_on_mesh():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_ring_loop_search_matches_direct():
    from tpu_slam.parallel.loop_search import loop_candidates, make_ring_loop_search

    mesh = make_mesh(8)
    rng = np.random.default_rng(4)
    Q, K = 16, 64
    queries = rng.uniform(-10, 10, (Q, 2)).astype(np.float32)
    kfs = rng.uniform(-10, 10, (K, 2)).astype(np.float32)

    f = make_ring_loop_search(mesh)
    d2 = np.asarray(
        f(
            shard_batch(mesh, jnp.asarray(queries)),
            shard_batch(mesh, jnp.asarray(kfs)),
        )
    )
    direct = ((queries[:, None, :] - kfs[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, direct, rtol=1e-4, atol=1e-4)

    # chain extraction semantics
    row = np.full(20, 100.0)
    row[3:9] = 1.0  # run of 6
    row[12:15] = 1.0  # run of 3 (too short)
    chains = loop_candidates(row, max_distance=2.0, min_chain=5)
    assert chains == [[3, 4, 5, 6, 7, 8]]
    chains = loop_candidates(
        row, max_distance=2.0, min_chain=5, exclude={5}
    )
    assert chains == []  # excluded id breaks the run


def test_sharded_logodds_update_matches_unsharded():
    from tpu_slam.config import GridConfig, LogOddsConfig
    from tpu_slam.ops import gridmap as gm
    from tpu_slam.parallel.sharded_map import make_sharded_logodds_update
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    cfg = GridConfig(resolution=0.1, size_x=128, size_y=128,
                     origin_x=-6.4, origin_y=-6.4)
    lo = LogOddsConfig()
    rng = np.random.default_rng(2)
    n = 90
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    ranges = rng.uniform(1.0, 5.5, n)
    origin = jnp.asarray([0.3, -0.2], jnp.float32)
    endpoints = jnp.asarray(
        np.asarray(origin)
        + np.stack([ranges * np.cos(angles), ranges * np.sin(angles)], -1),
        jnp.float32,
    )
    valid = jnp.ones(n, bool)

    want = gm.logodds_update_scan(
        jnp.zeros((128 * 128,), jnp.float32), cfg, lo, origin, endpoints,
        valid, max_range=6.0,
    ).reshape(128, 128)

    f = make_sharded_logodds_update(mesh, cfg, lo, max_range=6.0)
    grid0 = jax.device_put(
        jnp.zeros((128, 128), jnp.float32), NamedSharding(mesh, P("data"))
    )
    got = f(grid0, origin, endpoints, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sharded_hector_step_matches_unsharded():
    from tpu_slam.config import GridConfig
    from tpu_slam.ops.hector import gn_step
    from tpu_slam.parallel.sharded_map import make_sharded_hector_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    cfg = GridConfig(resolution=0.1, size_x=128, size_y=128,
                     origin_x=-6.4, origin_y=-6.4)
    rng = np.random.default_rng(3)
    prob = jnp.asarray(
        rng.uniform(0, 1, (128, 128)).astype(np.float32)
    )
    n = 120
    pts = jnp.asarray(rng.uniform(-4, 4, (n, 2)) / cfg.resolution,
                      jnp.float32)
    valid = jnp.ones(n, bool)
    pose = jnp.asarray([64.0, 64.0, 0.1], jnp.float32)

    want_pose, want_H = gn_step(
        prob.reshape(-1), 128, 128, pose, pts, valid, 0.2
    )

    f = make_sharded_hector_step(mesh, cfg)
    prob_s = jax.device_put(prob, NamedSharding(mesh, P("data")))
    got_pose, got_H = f(prob_s, pose, pts, valid)
    np.testing.assert_allclose(
        np.asarray(got_pose), np.asarray(want_pose), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_H), np.asarray(want_H), rtol=1e-4, atol=1e-3
    )
