"""Direct cyclic-reduction solver: host prep, numpy oracle, kernel.

The oracle (solver/banded.py) mirrors the Pallas kernel's elimination
order; it is validated here against an f64 dense solve of the same
normal equations (spa2d.cpp:425-609 residual model), and the kernel is
validated in interpret mode against the oracle-driven LM.
"""

import math

import numpy as np
import pytest

from tpu_slam.solver import banded


def ring_problem(M, stride=16, seed=0):
    """The bench_solver ring: odometry loop + duplicated cross closures
    (i and i+M/2 both measure the same pair -> exercises slot banks)."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * math.pi, M, endpoint=False)
    R = 10.0
    gt = np.stack([R * np.cos(th), R * np.sin(th), th + math.pi / 2], -1)

    def rel(a, b):
        c, s = math.cos(a[2]), math.sin(a[2])
        d = b[:2] - a[:2]
        dth = math.atan2(math.sin(b[2] - a[2]), math.cos(b[2] - a[2]))
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], dth])

    init = gt + np.cumsum(rng.normal(0, [0.02, 0.02, 0.004], (M, 3)), 0)
    info = np.diag([50., 50., 100.])
    E = []
    for i in range(M):
        E.append((i, (i + 1) % M, rel(gt[i], gt[(i + 1) % M]), info))
    for i in range(0, M, stride):
        j = (i + M // 2) % M
        E.append((i, j, rel(gt[i], gt[j]), info))
    ei = np.array([e[0] for e in E])
    ej = np.array([e[1] for e in E])
    means = np.stack([e[2] for e in E]).astype(np.float32)
    infos = np.stack([e[3] for e in E]).astype(np.float32)
    return init, ei, ej, means, infos


def dense_f64_delta(M, init, ei, ej, means, infos, lam):
    """f64 dense damped gauge-fixed solve of the same residual model."""
    H = np.zeros((3 * M, 3 * M))
    b = np.zeros(3 * M)
    for e in range(len(ei)):
        i, j = ei[e], ej[e]
        pa, pb = init[i], init[j]
        c, s = np.cos(pa[2]), np.sin(pa[2])
        dx, dy = pb[0] - pa[0], pb[1] - pa[1]
        r = np.array([
            c * dx + s * dy - means[e][0],
            -s * dx + c * dy - means[e][1],
            np.arctan2(np.sin(pb[2] - pa[2] - means[e][2]),
                       np.cos(pb[2] - pa[2] - means[e][2]))])
        drx, dry = -s * dx + c * dy, -c * dx - s * dy
        Ja = np.array([[-c, -s, drx], [s, -c, dry], [0, 0, -1]])
        Jb = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
        Om = infos[e].astype(np.float64)
        H[3*i:3*i+3, 3*i:3*i+3] += Ja.T @ Om @ Ja
        H[3*j:3*j+3, 3*j:3*j+3] += Jb.T @ Om @ Jb
        H[3*i:3*i+3, 3*j:3*j+3] += Ja.T @ Om @ Jb
        H[3*j:3*j+3, 3*i:3*i+3] += (Ja.T @ Om @ Jb).T
        b[3*i:3*i+3] += Ja.T @ Om @ r
        b[3*j:3*j+3] += Jb.T @ Om @ r
    H[np.arange(3 * M), np.arange(3 * M)] *= (1 + lam)
    H[0:3, :] = 0
    H[:, 0:3] = 0
    H[0:3, 0:3] = np.eye(3)
    b[0:3] = 0
    return np.linalg.solve(H, -b).reshape(M, 3)


def test_prepare_banded_ring_and_mission_shapes():
    init, ei, ej, means, infos = ring_problem(512)
    spec = banded.prepare_banded(ei, ej, 512)
    assert spec is not None
    assert spec.W == 6  # measured RCM bandwidth of the ring family
    assert spec.K >= -(-512 // 6) and (spec.K & (spec.K - 1)) == 0
    # duplicated closures land in bank 1, never beyond
    assert spec.edge_bank.max() == 1
    # perm/inv/flat maps are consistent bijections
    assert np.array_equal(np.sort(spec.flat_of_orig),
                          np.unique(spec.flat_of_orig))
    p = spec.inv[np.arange(512)]
    assert np.array_equal(spec.perm[p], np.arange(512))


def test_prepare_banded_rejects_dense_graph():
    # a complete graph on 32 nodes cannot band at WMAX
    ei, ej = np.triu_indices(32, k=1)
    assert banded.prepare_banded(ei, ej, 32) is None


def test_cr_solve_matches_f64_dense():
    M = 160
    init, ei, ej, means, infos = ring_problem(M)
    spec = banded.prepare_banded(ei, ej, M)
    lam = 1e-4
    D, B, rhs = banded.assemble_supernodes(
        spec, init.astype(np.float32), means, infos, lam)
    x = banded.cr_solve(D, B, rhs)
    delta = banded.flat_delta(spec, x)
    dref = dense_f64_delta(M, init.astype(np.float32).astype(np.float64),
                           ei, ej, means.astype(np.float64),
                           infos.astype(np.float64), lam)
    err = np.abs(delta - dref).max()
    assert err < 2e-4, (err, np.abs(dref).max())


def test_cr_solve_gauge_row_fixed():
    M = 96
    init, ei, ej, means, infos = ring_problem(M)
    spec = banded.prepare_banded(ei, ej, M)
    D, B, rhs = banded.assemble_supernodes(
        spec, init.astype(np.float32), means, infos, 1e-4)
    x = banded.cr_solve(D, B, rhs)
    delta = banded.flat_delta(spec, x)
    assert np.all(delta[0] == 0.0)  # node 0 gauge-fixed (nFixed=1)


@pytest.mark.slow
def test_kernel_interpret_matches_oracle_lm():
    """The Pallas kernel (interpret mode), 3 LM iterations, vs the numpy
    oracle running the identical doSPA schedule with cr_solve."""
    import jax.numpy as jnp

    from tpu_slam.solver.pallas_cr_lm import fused_cr_lm

    M = 72
    init, ei, ej, means, infos = ring_problem(M, stride=8)
    spec = banded.prepare_banded(ei, ej, M, min_k=32)
    assert spec is not None and spec.K == 32

    slots = banded.build_slots_np(spec, means, infos)
    pT8 = banded.flat_poses_np(spec, init)
    out = np.asarray(fused_cr_lm(
        jnp.asarray(pT8), jnp.asarray(slots), jnp.float32(1e-4),
        W=spec.W, K=spec.K, iters=3, sq_min_delta=1e-8, interpret=True))
    poses_k = banded.unflatten_poses_np(spec, out)

    def cost(p):
        acc = np.float32(0.0)
        for e in range(len(ei)):
            pa = p[ei[e]].astype(np.float32)
            pb = p[ej[e]].astype(np.float32)
            c, s = np.cos(pa[2]), np.sin(pa[2])
            dx, dy = pb[0] - pa[0], pb[1] - pa[1]
            r = np.array([
                c * dx + s * dy - means[e][0],
                -s * dx + c * dy - means[e][1],
                np.arctan2(np.sin(pb[2] - pa[2] - means[e][2]),
                           np.cos(pb[2] - pa[2] - means[e][2]))],
                np.float32)
            acc += r @ infos[e] @ r
        return float(acc)

    poses = init.astype(np.float64).copy()
    lam, laminc, cst, good = 1e-4, 2.0, cost(poses), 0
    for _ in range(3):
        D, B, rhs = banded.assemble_supernodes(
            spec, poses.astype(np.float32), means, infos, lam)
        x = banded.cr_solve(D, B, rhs)
        delta = banded.flat_delta(spec, x)
        if float(np.sum(delta.astype(np.float64) ** 2)) < 1e-8:
            break
        cand = poses + delta
        cand[:, 2] = np.arctan2(np.sin(cand[:, 2]), np.cos(cand[:, 2]))
        nc = cost(cand)
        if nc < cst:
            poses, cst, lam, good = cand, nc, lam * 0.5, good + 1
        else:
            lam, laminc = lam * laminc, laminc * 2.0

    assert int(out[3, 2]) == good
    err = np.abs(poses_k[1:] - poses[1:]).max()
    assert err < 5e-3, err
    np.testing.assert_allclose(out[3, 1], cst, rtol=0.05, atol=1e-3)
