import dataclasses

import numpy as np
import pytest

from tpu_slam import geometry as geo
from tpu_slam.config import SolverConfig
from tpu_slam.solver.pose_graph import PoseGraphSolver

import jax.numpy as jnp


def rel(a, b):
    return np.asarray(
        geo.relative(jnp.asarray(a, jnp.float64), jnp.asarray(b, jnp.float64))
    )


def ring_graph(n=30, radius=5.0, noise=0.0, seed=0):
    """Ground-truth ring of poses + consecutive relative constraints."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.stack(
        [radius * np.cos(th), radius * np.sin(th), th + np.pi / 2], -1
    )
    gt[:, 2] = np.arctan2(np.sin(gt[:, 2]), np.cos(gt[:, 2]))
    edges = []
    for i in range(n - 1):
        m = rel(gt[i], gt[i + 1]) + rng.normal(0, noise, 3)
        edges.append((i, i + 1, m))
    # loop closure
    m = rel(gt[n - 1], gt[0]) + rng.normal(0, noise, 3)
    edges.append((n - 1, 0, m))
    return gt, edges


def test_perfect_constraints_recover_exactly():
    gt, edges = ring_graph(noise=0.0)
    rng = np.random.default_rng(3)
    solver = PoseGraphSolver(SolverConfig())
    for i, p in enumerate(gt):
        init = p + (rng.normal(0, 0.2, 3) if i > 0 else 0.0)
        solver.add_node(i, init)
    info = np.diag([100.0, 100.0, 400.0])
    for i, j, m in edges:
        solver.add_constraint(i, j, m, information=info)
    stats = solver.compute()
    out = solver.get_poses()
    assert stats.final_cost < 1e-4 * stats.initial_cost
    # node 0 is the gauge — compare relative structure
    err = np.linalg.norm(out[:, :2] - gt[:, :2], axis=1)
    assert err.max() < 0.02, err.max()


def test_noisy_loop_reduces_drift():
    gt, edges = ring_graph(n=40, noise=0.01, seed=1)
    # integrate odometry only → drifted initial guesses
    init = [gt[0]]
    for i in range(len(gt) - 1):
        m = edges[i][2]
        init.append(
            np.asarray(
                geo.compose(jnp.asarray(init[-1]), jnp.asarray(m))
            )
        )
    init = np.asarray(init)
    drift0 = np.linalg.norm(init[:, :2] - gt[:, :2], axis=1).max()

    solver = PoseGraphSolver(SolverConfig())
    for i, p in enumerate(init):
        solver.add_node(i, p)
    info = np.diag([1e4, 1e4, 4e4])
    for i, j, m in edges:
        solver.add_constraint(i, j, m, information=info)
    stats = solver.compute()
    out = solver.get_poses()
    drift1 = np.linalg.norm(out[:, :2] - gt[:, :2], axis=1).max()
    assert stats.final_cost < stats.initial_cost
    assert drift1 < drift0 * 0.6, (drift0, drift1)
    # gauge fixed
    np.testing.assert_allclose(out[0], init[0], atol=1e-12)


def test_cg_matches_dense():
    gt, edges = ring_graph(n=24, noise=0.02, seed=5)
    rng = np.random.default_rng(7)
    outs = []
    for dense_limit in (10_000, 0):  # dense path, then CG path
        cfg = SolverConfig(use_dense_below=dense_limit)
        s = PoseGraphSolver(cfg)
        for i, p in enumerate(gt):
            s.add_node(i, p + (rng.standard_normal(3) * 0.0))
        info = np.diag([100.0, 100.0, 400.0])
        for i, j, m in edges:
            s.add_constraint(i, j, m, information=info)
        rng = np.random.default_rng(7)
        s.compute()
        outs.append(s.get_poses())
    np.testing.assert_allclose(outs[0], outs[1], atol=5e-3)


def test_covariance_input_path():
    """AddConstraint with covariance (SpaSolver inverts it, spa_solver.cc:60)."""
    s = PoseGraphSolver(SolverConfig())
    s.add_node(0, [0.0, 0.0, 0.0])
    s.add_node(1, [1.2, 0.1, 0.0])
    s.add_constraint(0, 1, [1.0, 0.0, 0.0], covariance=np.eye(3) * 0.01)
    stats = s.compute()
    out = s.get_poses()
    np.testing.assert_allclose(out[1], [1.0, 0.0, 0.0], atol=1e-4)
    assert stats.final_cost <= stats.initial_cost
