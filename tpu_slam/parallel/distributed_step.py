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


def _pack_result(r):
    """(B, 14) f32: [pose(3), error(1), num_inliers(1), cov.flat(9)]."""
    B = r.pose.shape[0]
    return jnp.concatenate(
        [
            r.pose.astype(jnp.float32),
            r.error.reshape(B, 1).astype(jnp.float32),
            r.num_inliers.reshape(B, 1).astype(jnp.float32),
            r.covariance.reshape(B, 9).astype(jnp.float32),
        ],
        axis=-1,
    )


def _gather_scan(store, idx, dirs):
    """Gather scan rows from the store; reconstruct Cartesian points on
    device when the store holds RANGES.

    A (U, N) ranges store crosses the tunnel at a third of the bytes of a
    (U, N, 2) points store — the beam directions are static per laser, so
    they ship once as a tiny (N, 2) table and the x/y expansion is a free
    VPU multiply after the gather. 3-D stores (motion-corrected points,
    which have no shared direction table) pass through unchanged; the jit
    cache keys on store rank, so both layouts share one factory."""
    g = store[idx]
    if g.ndim == 2:  # (B, N) ranges
        return g[..., None] * dirs[None, :, :]
    return g


def make_chain_matcher(cfg: SLAMConfig):
    """Packed chain match + on-device pose integration in ONE dispatch.

    Returns (2B+1, 14): rows [:B] are the packed per-pair results
    (see make_packed_indexed_matcher), rows [B:] are the integrated
    trajectory compose_chain(pose0, rels) zero-padded to 14 columns.
    One D2H fetch covers both — a separate integrate dispatch pays a full
    tunnel RTT for ~1 ms of device work. Prefix-associativity makes the
    batch padding harmless: padded rels only affect trajectory rows past
    the real scan count, which the caller slices off."""
    from tpu_slam import geometry as geo

    key = ("chain", cfg.plicp, jax.default_backend())
    hit = _MATCHER_CACHE.get(key)
    if hit is not None:
        return hit
    base = _match_fn(cfg)

    def f(store, store_valid, dirs, src_idx, tgt_idx, guesses, pose0):
        r = base(
            _gather_scan(store, src_idx, dirs), store_valid[src_idx],
            _gather_scan(store, tgt_idx, dirs), store_valid[tgt_idx],
            guesses,
        )
        packed = _pack_result(r)
        poses = geo.compose_chain(pose0, r.pose.astype(jnp.float32))
        posep = jnp.pad(poses, ((0, 0), (0, 11)))
        return jnp.concatenate([packed, posep], axis=0)

    fn = jax.jit(f)
    _MATCHER_CACHE[key] = fn
    return fn


def make_loop_selector(cfg: SLAMConfig, n_seeds: int):
    """Multi-start loop match + per-candidate best-seed selection ON
    DEVICE: one dispatch returns (C, 16) rows
    ``[pose(3), error(1), num_inliers(1), cov.flat(9), frac(1), accept(1)]``
    for the winning seed of each candidate, instead of shipping all C·S
    packed rows to the host (9× the bytes at the default seed lattice) and
    masking there.

    Gate semantics mirror the host code exactly: a seed is eligible when
    its inlier fraction clears ``min_frac`` AND its result stayed inside
    the seeded basin (confident-but-aliased optima land outside it —
    models/offline.py step 5); the best eligible seed must also clear the
    mission-calibrated ``err_gate``."""
    key = ("loopsel", cfg.plicp, n_seeds, jax.default_backend())
    hit = _MATCHER_CACHE.get(key)
    if hit is not None:
        return hit
    base = _match_fn(cfg)
    S = n_seeds

    def f(store, store_valid, dirs, src_idx, tgt_idx, guesses,
          rel_pred, gates):
        # src_idx/tgt_idx/guesses: (C*S,), rel_pred: (C, 3)
        # gates: (4,) = [min_frac, seed_xy, seed_theta, err_gate]
        r = base(
            _gather_scan(store, src_idx, dirs), store_valid[src_idx],
            _gather_scan(store, tgt_idx, dirs), store_valid[tgt_idx],
            guesses,
        )
        packed = _pack_result(r)  # (C*S, 14)
        C = rel_pred.shape[0]
        packed = packed.reshape(C, S, 14)
        nv = jnp.sum(
            store_valid[src_idx.reshape(C, S)[:, 0]], axis=-1
        ).astype(jnp.float32)  # valid beams of the src scan, per candidate
        frac = packed[:, :, 4] / jnp.maximum(nv[:, None], 1.0)
        dev = packed[:, :, :3] - rel_pred[:, None, :]
        dev_th = jnp.arctan2(jnp.sin(dev[:, :, 2]), jnp.cos(dev[:, :, 2]))
        in_basin = (
            (jnp.hypot(dev[:, :, 0], dev[:, :, 1]) <= gates[1])
            & (jnp.abs(dev_th) <= gates[2])
        )
        ok = (frac >= gates[0]) & in_basin
        err = jnp.where(ok, packed[:, :, 3], jnp.inf)
        best = jnp.argmin(err, axis=1)  # (C,)
        rows = jnp.arange(C)
        sel = packed[rows, best]  # (C, 14)
        best_err = err[rows, best]
        accept = jnp.isfinite(best_err) & (best_err <= gates[3])
        return jnp.concatenate(
            [
                sel,
                frac[rows, best][:, None],
                accept[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )

    fn = jax.jit(f)
    _MATCHER_CACHE[key] = fn
    return fn


def make_packed_indexed_matcher(cfg: SLAMConfig, mesh: Mesh | None = None,
                                axis: str = "data"):
    """Indexed matcher whose result is ONE (B, 14) f32 array:
    ``[pose(3), error(1), num_inliers(1), covariance.flat(9)]``.

    Every synced device→host fetch pays a full tunnel round-trip; the
    offline pipeline reads four result fields per stage, so fetching the
    PLICPResult leaves costs 4 RTTs where one packed array costs 1
    (measured ~10-40 ms/RTT through the axon tunnel — comparable to the
    whole batched match compute at mission shapes)."""
    key = ("packed", cfg.plicp, mesh, axis, jax.default_backend())
    hit = _MATCHER_CACHE.get(key)
    if hit is not None:
        return hit
    base = _match_fn(cfg)

    def f(store, store_valid, dirs, src_idx, tgt_idx, guesses):
        r = base(
            _gather_scan(store, src_idx, dirs), store_valid[src_idx],
            _gather_scan(store, tgt_idx, dirs), store_valid[tgt_idx],
            guesses,
        )
        return _pack_result(r)

    if mesh is None:
        fn = jax.jit(f)
    else:
        repl = NamedSharding(mesh, P())
        batch = NamedSharding(mesh, P(axis))
        fn = jax.jit(
            f,
            in_shardings=(repl, repl, repl, batch, batch, batch),
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
