"""Distributed loop-closure candidate search: keyframe ring-pass.

The reference's loop search is a linear scan of every stored scan against
the current pose (FindPossibleLoopClosure, Mapper.cpp:1333-1394) — O(all
scans) on one core. At pod scale the keyframe store is sharded across
devices (SURVEY §5 "long-context / sequence parallelism"); the blockwise
distance computation rotates keyframe blocks around the mesh ring with
`ppermute` — structurally identical to ring attention's KV rotation — so
each device only ever holds O(K/D) keyframes while producing its shard of
the full (Q, K) query↔keyframe distance matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_ring_loop_search(mesh: Mesh, axis: str = "data"):
    """Returns f(queries (Q, 2), keyframes (K, 2)) → (Q, K) squared
    distances, with Q and K both sharded over ``axis``.

    Q and K must be divisible by the axis size (pad with +inf rows).
    """
    D = mesh.shape[axis]

    def step(q_block, kf_block):
        kb = kf_block.shape[0]
        K = kb * D
        me = jax.lax.axis_index(axis)
        out = jnp.full((q_block.shape[0], K), jnp.inf, q_block.dtype)
        block = kf_block
        perm = [(i, (i + 1) % D) for i in range(D)]
        for s in range(D):
            # the block currently held originated on device (me - s) mod D
            src = (me - s) % D
            d2 = (
                (q_block[:, None, 0] - block[None, :, 0]) ** 2
                + (q_block[:, None, 1] - block[None, :, 1]) ** 2
            )
            out = jax.lax.dynamic_update_slice(
                out, d2, (0, src * kb)
            )
            if s + 1 < D:
                block = jax.lax.ppermute(block, axis, perm)
        return out

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
        )
    )


def loop_candidates(
    d2: np.ndarray, max_distance: float, min_chain: int,
    exclude: set[int] | None = None,
) -> list[list[int]]:
    """Host-side chain extraction from one query row of the distance matrix
    — the consecutive-run logic of FindPossibleLoopClosure
    (Mapper.cpp:1350-1391): runs of keyframes within ``max_distance``,
    broken by excluded (near-linked) ids, kept if ≥ min_chain long."""
    exclude = exclude or set()
    chains = []
    chain: list[int] = []
    for i, v in enumerate(d2):
        if v < max_distance**2 + 1e-6:
            if i in exclude:
                chain = []
            else:
                chain.append(i)
        else:
            if len(chain) >= min_chain:
                chains.append(chain)
            chain = []
    if len(chain) >= min_chain:
        chains.append(chain)
    return chains
