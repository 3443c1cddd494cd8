"""Device-mesh helpers for the distributed paths.

The reference is single-process (SURVEY §2.5); all multi-chip structure is
new here. One 1-D mesh axis ``data`` carries both forms of parallelism this
workload has:

  * scan-batch data parallelism — matching B scan pairs is embarrassingly
    parallel, so the batch axis is sharded and no collectives are needed;
  * graph parallelism — pose-graph edges are sharded, and the normal
    equations / CG matvec partial sums ride a ``psum`` (the NCCL/MPI slot,
    but as XLA collectives over ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree with leading batch axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicated(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
