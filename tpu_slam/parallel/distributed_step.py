"""The full distributed SLAM step: data-parallel matching + graph-parallel
pose optimization over one device mesh.

This is the "training step" of the framework (SURVEY §2.5): a batch of scan
pairs is matched in parallel (batch axis sharded — embarrassingly parallel,
XLA partitions the vmapped matcher with no collectives), the matched
relative poses become chain constraints, and one LM delta of the resulting
pose graph is computed with edges sharded over the same axis (partial normal
equations + psum). The reference processes one scan at a time on one core;
this is the multi-chip re-design, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_slam.config import SLAMConfig
from tpu_slam.ops.plicp import plicp_match
from tpu_slam.solver.pose_graph import normal_equations
from tpu_slam.solver.pose_graph import assemble_dense, finalize_dense_solve


def make_sharded_training_step(mesh: Mesh, cfg: SLAMConfig, axis: str = "data"):
    """Returns a jitted step over the mesh.

    step(src_pts (B,N,2), src_valid, tgt_pts, tgt_valid, guesses (B,3),
         poses (B+1,3), lam) → (new_poses (B+1,3), match_errors (B,))

    B scan pairs are matched data-parallel; edges (i → i+1 chain, means =
    matched relative poses, Ω = I·w) are sharded over the same axis for the
    normal-equation psum; the dense solve runs replicated.
    """
    pl = functools.partial(plicp_match, cfg=cfg.plicp)

    def step(src_pts, src_valid, tgt_pts, tgt_valid, guesses, poses, lam):
        B = src_pts.shape[0]
        M = B + 1
        res = pl(
            src_pts, src_valid, tgt_pts, tgt_valid, init_pose=guesses
        )

        ei = jnp.arange(B, dtype=jnp.int32)
        ej = ei + 1
        means = res.pose
        w = jnp.clip(res.num_inliers.astype(poses.dtype), 1.0, None)
        infos = jnp.eye(3, dtype=poses.dtype)[None] * w[:, None, None]
        mask = jnp.ones((B,), bool)

        Hd, Hij, b = normal_equations(poses, ei, ej, means, infos, mask, M)
        H = assemble_dense(Hd, Hij, ei, ej)
        free = jnp.arange(M) > 0
        delta = finalize_dense_solve(H, b, lam, free)
        new_poses = poses + delta
        th = jnp.arctan2(jnp.sin(new_poses[:, 2]), jnp.cos(new_poses[:, 2]))
        new_poses = jnp.concatenate([new_poses[:, :2], th[:, None]], axis=-1)
        return new_poses, res.error

    batch = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(batch, batch, batch, batch, batch, repl, repl),
        out_shardings=(repl, batch),
    )


def make_batched_matcher(cfg: SLAMConfig, mesh: Mesh | None = None,
                         axis: str = "data"):
    """Data-parallel batched PL-ICP matcher; sharded if a mesh is given.

    This is the per-chip throughput workhorse for the benchmarks
    (BASELINE.json "≥10× CPU scans/s per chip").

    Memoized on (plicp config, mesh, axis): every call site gets the SAME
    jitted callable, so its compiled executables are shared — a fresh
    wrapper per call would silently recompile identical programs (jax's
    jit cache keys on function identity).
    """
    key = (cfg.plicp, mesh, axis, jax.default_backend())
    hit = _MATCHER_CACHE.get(key)
    if hit is not None:
        return hit
    fn = _make_batched_matcher(cfg, mesh, axis)
    _MATCHER_CACHE[key] = fn
    return fn


_MATCHER_CACHE: dict = {}


def make_indexed_matcher(cfg: SLAMConfig, mesh: Mesh | None = None,
                         axis: str = "data"):
    """Batched PL-ICP over a scan TABLE: pairs are (src_idx, tgt_idx) rows
    into one uploaded (U, N, 2) array, gathered on device.

    For multi-start matching (C candidates x S seeds) the direct batched
    matcher would transfer every candidate scan S times; here each unique
    scan crosses the link once and the (B,) index vectors are bytes. The
    table is replicated over the mesh, the pair batch is sharded."""
    key = ("indexed", cfg.plicp, mesh, axis, jax.default_backend())
    hit = _MATCHER_CACHE.get(key)
    if hit is not None:
        return hit
    base = _match_fn(cfg)

    def f(store_pts, store_valid, src_idx, tgt_idx, guesses):
        return base(
            store_pts[src_idx], store_valid[src_idx],
            store_pts[tgt_idx], store_valid[tgt_idx], guesses,
        )

    if mesh is None:
        fn = jax.jit(f)
    else:
        repl = NamedSharding(mesh, P())
        batch = NamedSharding(mesh, P(axis))
        fn = jax.jit(
            f,
            in_shardings=(repl, repl, batch, batch, batch),
            out_shardings=batch,
        )
    _MATCHER_CACHE[key] = fn
    return fn


def _match_fn(cfg: SLAMConfig):
    """The per-backend batched PL-ICP callable (unjitted)."""
    if jax.default_backend() == "tpu" and cfg.plicp.use_point_to_line_distance:
        from tpu_slam.ops.pallas.plicp_fused import plicp_match_fused

        return lambda sp, sv, tp, tv, g: plicp_match_fused(
            sp, sv, tp, tv, cfg.plicp, init_pose=g
        )
    pl_ = functools.partial(plicp_match, cfg=cfg.plicp)
    return lambda sp, sv, tp, tv, g: pl_(sp, sv, tp, tv, init_pose=g)


def _make_batched_matcher(cfg: SLAMConfig, mesh: Mesh | None, axis: str):
    # On TPU the fully-fused Pallas matcher (one kernel for the whole ICP
    # loop) runs ~8× faster than the XLA op-by-op path; elsewhere (CPU tests,
    # interpret-less backends) use the XLA path.
    f = _match_fn(cfg)
    if mesh is None:
        return jax.jit(f)
    batch = NamedSharding(mesh, P(axis))
    return jax.jit(
        f,
        in_shardings=(batch,) * 5,
        out_shardings=batch,
    )
