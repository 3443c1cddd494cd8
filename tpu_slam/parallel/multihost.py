"""Multi-host runtime entry (the jax.distributed slot).

The reference is single-process; BASELINE.json's scale-out axis (1 chip →
1 host → N hosts) enters through `jax.distributed`: every host runs the same
program, `initialize()` joins the cluster, and the global mesh spans all
processes' devices. The sharded programs in this package (batched matching,
edge-sharded LM, stripe-sharded maps, keyframe ring-pass) are written
against a named mesh and run unchanged on a multi-host mesh — XLA routes
psum/ppermute over ICI within a slice and DCN across hosts.

Only one real chip exists in this environment; multi-host behavior is
validated by the virtual-mesh equivalence tests (tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper; no-op for a single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "data") -> Mesh:
    """One 1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def is_coordinator() -> bool:
    return jax.process_index() == 0
