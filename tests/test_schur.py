"""Schur-complement submap solver: parity with the dense LM solve."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_slam.solver.pose_graph import dense_solve, normal_equations
from tpu_slam.solver.schur import (
    build_partition,
    make_distributed_schur_delta,
    schur_delta,
)


def ring_graph(M=64, loop_stride=12, seed=0):
    """Noisy circle with odometry ring + cross loop closures."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * math.pi, M, endpoint=False)
    gt = np.stack(
        [8.0 * np.cos(th), 8.0 * np.sin(th), th + math.pi / 2], -1
    )

    def rel(a, b):
        c, s = math.cos(a[2]), math.sin(a[2])
        d = b[:2] - a[:2]
        dth = math.atan2(math.sin(b[2] - a[2]), math.cos(b[2] - a[2]))
        return [c * d[0] + s * d[1], -s * d[0] + c * d[1], dth]

    ei, ej, means = [], [], []
    for i in range(M - 1):  # chain (ring closed by a loop edge)
        ei.append(i), ej.append(i + 1), means.append(rel(gt[i], gt[i + 1]))
    for i in range(0, M, loop_stride):
        j = (i + M // 2) % M
        ei.append(i), ej.append(j), means.append(rel(gt[i], gt[j]))
    E = len(ei)
    ei, ej = np.asarray(ei), np.asarray(ej)
    means = np.asarray(means, np.float32)
    infos = np.tile(
        np.diag([40.0, 40.0, 80.0]).astype(np.float32), (E, 1, 1)
    )
    mask = np.ones(E, bool)
    noise = np.cumsum(rng.normal(0, [0.03, 0.03, 0.005], (M, 3)), 0)
    poses = (gt + noise).astype(np.float32)
    free = np.arange(M) > 0
    return poses, ei, ej, means, infos, mask, free


def _deltas(M=64, S=4):
    poses, ei, ej, means, infos, mask, free = ring_graph(M)
    part = build_partition(ei, ej, mask, M, S)
    lam = jnp.float32(1e-3)
    args = (
        jnp.asarray(poses), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(means), jnp.asarray(infos), jnp.asarray(mask),
        lam, jnp.asarray(free),
    )
    Hd, Hij, b = normal_equations(
        args[0], args[1], args[2], args[3], args[4], args[5], M
    )
    ref = np.asarray(
        dense_solve(Hd, Hij, args[1], args[2], b, lam, args[7])
    )
    sch = np.asarray(jax.jit(lambda *a: schur_delta(part, *a))(*args))
    return part, args, ref, sch


def test_partition_separators_cover_cross_edges():
    M, S = 64, 4
    _, ei, ej, _, _, mask, _ = ring_graph(M)
    part = build_partition(ei, ej, mask, M, S)
    sep = set(part.sep_nodes[part.sep_valid].tolist())
    blk = np.minimum(np.arange(M) // (-(-M // S)), S - 1)
    for a, b in zip(ei, ej):
        if blk[a] != blk[b]:
            assert a in sep and b in sep
    # internal slots + separators cover every node exactly once
    ints = part.int_nodes[part.int_valid].tolist()
    assert sorted(ints + sorted(sep)) == list(range(M))


def test_schur_matches_dense():
    _, _, ref, sch = _deltas()
    scale = np.abs(ref).max()
    np.testing.assert_allclose(sch, ref, atol=2e-3 * max(scale, 1.0))


def test_schur_zero_at_fixed_node():
    _, _, _, sch = _deltas()
    np.testing.assert_allclose(sch[0], 0.0, atol=1e-7)


@pytest.mark.parametrize("S", [2, 8])
def test_schur_submap_count_invariance(S):
    _, _, ref, sch = _deltas(M=64, S=S)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(sch, ref, atol=2e-3 * max(scale, 1.0))


def test_solver_with_schur_converges_like_dense():
    """PoseGraphSolver(use_schur=True) runs the identical LM loop with the
    Schur factorization and must land on the same optimum."""
    import dataclasses

    from tpu_slam.config import SolverConfig
    from tpu_slam.solver.pose_graph import PoseGraphSolver

    M = 48
    poses, ei, ej, means, infos, mask, _ = ring_graph(M, seed=3)

    results = []
    for use_schur in (False, True):
        cfg = SolverConfig(use_schur=use_schur, schur_submaps=4)
        s = PoseGraphSolver(cfg)
        for i in range(M):
            s.add_node(i, poses[i])
        for k in range(len(ei)):
            s.add_constraint(
                int(ei[k]), int(ej[k]), means[k], information=infos[k]
            )
        stats = s.compute()
        assert stats.final_cost < 0.05 * stats.initial_cost
        results.append(s.get_poses())
    np.testing.assert_allclose(results[1], results[0], atol=5e-3)


def test_distributed_schur_matches_single():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from tpu_slam.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    M = 64
    poses, ei, ej, means, infos, mask, free = ring_graph(M)
    part = build_partition(ei, ej, mask, M, 8)
    lam = jnp.float32(1e-3)
    args = (
        jnp.asarray(poses), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(means), jnp.asarray(infos), jnp.asarray(mask),
        lam, jnp.asarray(free),
    )
    single = np.asarray(jax.jit(lambda *a: schur_delta(part, *a))(*args))
    dist = np.asarray(make_distributed_schur_delta(mesh, part)(*args))
    np.testing.assert_allclose(dist, single, atol=1e-4)


def test_bucketed_partition_same_delta_and_stable_shapes():
    """bucket_partition pads index maps to power-of-two widths: the delta is
    unchanged (pad slots are identity/dropped) and the padded SHAPES stay
    fixed as the graph grows within a bucket — the property that lets the
    compiled LM program be reused across loop closures instead of paying a
    fresh multi-second compile per closure."""
    from tpu_slam.solver.schur import bucket_partition

    part, args, ref, sch = _deltas(M=64, S=4)
    bp = bucket_partition(part)
    for name in ("int_nodes", "ii_edge", "is_edge", "sep_nodes", "ss_edge"):
        w = getattr(bp, name).shape[-1]
        assert w >= getattr(part, name).shape[-1]
        assert w & (w - 1) == 0 or w == 16, (name, w)
    sch_b = np.asarray(
        jax.jit(lambda p, *a: schur_delta(p, *a))(bp, *args)
    )
    np.testing.assert_allclose(sch_b, sch, rtol=1e-4, atol=1e-5)

    # two nearby graph sizes land in the same padded shapes
    def shapes(M):
        poses, ei, ej, means, infos, mask, free = ring_graph(M)
        p = bucket_partition(build_partition(ei, ej, mask, M, 4))
        return tuple(
            np.asarray(getattr(p, n)).shape
            for n in ("int_nodes", "ii_edge", "is_edge", "sep_nodes",
                      "ss_edge")
        )

    assert shapes(56) == shapes(60)
