"""Distributed pose-graph solving: edges sharded across devices.

The scale-out path of SURVEY §2.5 ("graph parallelism"): constraint blocks
are distributed over the mesh's ``data`` axis; each device computes partial
normal equations from its edge shard, and a ``psum`` over ICI assembles the
global system (the reference's serial setupSparseSys, spa2d.cpp:328-413,
had no such axis — its NCCL/MPI slot was empty).

Two paths mirroring solver/pose_graph.py:
  * dense: psum the fully-assembled (3M, 3M) system, solve replicated —
    right when M is small relative to the edge count;
  * CG: the edge-wise matvec runs on local shards with one psum per
    iteration — right at scale, where H never materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_slam.solver.pose_graph import (
    assemble_dense,
    cg_matvec,
    edge_jacobians,
    edge_residuals,
    finalize_dense_solve,
    normal_equations,
)


def make_distributed_lm_delta(mesh: Mesh, n_nodes: int, axis: str = "data"):
    """One LM delta with edges sharded over ``axis``.

    Inputs: poses (M,3) replicated; ei/ej/means/infos/mask sharded (E,...);
    lam scalar; free_mask (M,) replicated. Output delta (M,3) replicated.
    """

    def step(poses, ei, ej, means, infos, mask, lam, free_mask):
        Hd, Hij, b = normal_equations(
            poses, ei, ej, means, infos, mask, n_nodes
        )
        H_local = assemble_dense(Hd, Hij, ei, ej)
        H = jax.lax.psum(H_local, axis)
        b = jax.lax.psum(b, axis)
        return finalize_dense_solve(H, b, lam, free_mask)

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(), P()),
            out_specs=P(),
        )
    )


def make_distributed_cg_delta(
    mesh: Mesh, n_nodes: int, cg_iters: int, axis: str = "data"
):
    """CG path: never materializes H; one psum per matvec application."""

    def step(poses, ei, ej, means, infos, mask, lam, free_mask):
        Hd_l, Hij, b_l = normal_equations(
            poses, ei, ej, means, infos, mask, n_nodes
        )
        Hd = jax.lax.psum(Hd_l, axis)
        b = jax.lax.psum(b_l, axis)
        dt = poses.dtype
        eye3 = jnp.eye(3, dtype=dt)
        Hdd = Hd + 1e-12 * eye3
        Hdd = Hdd.at[:, jnp.arange(3), jnp.arange(3)].mul(1.0 + lam)
        fm = free_mask.astype(dt)
        Minv = jnp.linalg.inv(
            Hdd * fm[:, None, None] + (1.0 - fm)[:, None, None] * eye3
        )

        def mv(x):
            x = x * fm[:, None]
            # off-diagonal: local edge shard + psum
            y_off = jnp.zeros_like(x)
            y_off = y_off.at[ei].add(jnp.einsum("eab,eb->ea", Hij, x[ej]))
            y_off = y_off.at[ej].add(jnp.einsum("eba,eb->ea", Hij, x[ei]))
            y = jnp.einsum("mab,mb->ma", Hdd, x) + jax.lax.psum(y_off, axis)
            return y * fm[:, None] + x * (1.0 - fm[:, None])

        bb = -b * fm[:, None]
        x0 = jnp.zeros_like(bb)
        r0 = bb - mv(x0)
        z0 = jnp.einsum("mab,mb->ma", Minv, r0)

        def body(carry, _):
            x, r, z, p, rz = carry
            Ap = mv(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(pAp != 0.0, pAp, 1.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = jnp.einsum("mab,mb->ma", Minv, r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(rz != 0.0, rz, 1.0)
            return (x, r, z, z + beta * p, rz_new), None

        (x, *_), _ = jax.lax.scan(
            body, (x0, r0, z0, z0, jnp.sum(r0 * z0)), None, length=cg_iters
        )
        return x

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(), P()),
            out_specs=P(),
        )
    )
