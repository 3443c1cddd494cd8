"""HBM-streamed cyclic-reduction LM (solver/cr_stream.py).

The streamed pipeline must be numerically interchangeable with the
monolithic in-VMEM kernel (solver/pallas_cr_lm.py) — same contract, same
doSPA schedule, same factorization — since PoseGraphSolver dispatches
between them purely by size (pose_graph._compute_direct)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_slam.solver import banded
from tests.test_banded import ring_problem


def _setup(M=72, stride=8, min_k=32):
    init, ei, ej, means, infos = ring_problem(M, stride=stride)
    spec = banded.prepare_banded(ei, ej, M, min_k=min_k)
    assert spec is not None
    slots = banded.build_slots_np(spec, means, infos)
    pT8 = banded.flat_poses_np(spec, init)
    return spec, slots, pT8, (init, ei, ej, means, infos)


@pytest.mark.slow
def test_streamed_matches_monolith_interpret():
    """Interpret mode: the streamed pipeline and the monolith kernel run
    the identical LM schedule to the same poses/stats."""
    from tpu_slam.solver.cr_stream import streamed_cr_lm
    from tpu_slam.solver.pallas_cr_lm import fused_cr_lm

    spec, slots, pT8, _ = _setup()
    kw = dict(W=spec.W, K=spec.K, iters=3, sq_min_delta=1e-8,
              interpret=True)
    a = np.asarray(fused_cr_lm(
        jnp.asarray(pT8), jnp.asarray(slots), jnp.float32(1e-4), **kw))
    b = np.asarray(streamed_cr_lm(
        jnp.asarray(pT8), jnp.asarray(slots), jnp.float32(1e-4), **kw))
    assert np.abs(a[0:3] - b[0:3]).max() < 1e-4  # poses
    assert a[3, 2] == b[3, 2]  # accepted-step count
    assert a[3, 3] == b[3, 3]  # iterations
    np.testing.assert_allclose(a[3, 0], b[3, 0], rtol=1e-5)  # cost0
    assert b[3, 1] <= a[3, 1] * 2 + 1e-6  # same optimum class


@pytest.mark.slow
def test_streamed_converges_on_ring():
    """More iterations: the streamed LM reaches the near-zero optimum of
    the consistent ring (chi² → ~0), interpret mode."""
    from tpu_slam.solver.cr_stream import streamed_cr_lm

    spec, slots, pT8, _ = _setup(M=96, stride=8)
    out = np.asarray(streamed_cr_lm(
        jnp.asarray(pT8), jnp.asarray(slots), jnp.float32(1e-4),
        W=spec.W, K=spec.K, iters=12, sq_min_delta=1e-16, interpret=True))
    cost0, cost = out[3, 0], out[3, 1]
    assert cost < 1e-3 * cost0, (cost0, cost)


@pytest.mark.slow
def test_dispatch_streamed_when_monolith_rejected(monkeypatch):
    """PoseGraphSolver falls through to the streamed path when the
    monolith's VMEM/compile gate rejects the shape, and reaches the same
    optimum as the default (unforced) solve."""
    from tpu_slam import solver as _  # noqa: F401
    from tpu_slam.config import SolverConfig
    from tpu_slam.solver import pallas_cr_lm
    from tpu_slam.solver.pose_graph import (
        PoseGraphSolver, _CR_SPEC_CACHE)

    init, ei, ej, means, infos = ring_problem(120, stride=8)

    def build():
        s = PoseGraphSolver(SolverConfig())
        for i in range(len(init)):
            s.add_node(i, init[i])
        for k in range(len(ei)):
            s.add_constraint(ei[k], ej[k], means[k], information=infos[k])
        return s

    s_mono = build()
    r_mono = s_mono.compute()
    _CR_SPEC_CACHE.clear()  # cached entries carry the gate decision
    monkeypatch.setattr(pallas_cr_lm, "cr_lm_applicable",
                        lambda W, K: False)
    s_str = build()
    r_str = s_str.compute()
    _CR_SPEC_CACHE.clear()
    np.testing.assert_allclose(
        r_str.final_cost, r_mono.final_cost, rtol=1e-3, atol=1e-6)
    d = np.abs(s_str.get_poses() - s_mono.get_poses())
    assert d.max() < 1e-3, d.max()
