"""Test harness config: run on a virtual 8-device CPU mesh.

The reference has no tests (SURVEY §4); this suite formalizes its bag-replay
validation as simulator-replay + golden/unit tests. Multi-chip sharding is
validated on 8 virtual CPU devices via xla_force_host_platform_device_count —
the local-multiprocess analogue of a multi-host run.
"""

import os

# Force CPU: the session env sets JAX_PLATFORMS=axon (one real TPU chip via a
# tunnel); unit tests must run on the virtual CPU mesh, the real chip is for
# bench.py only. NOTE: a sitecustomize pre-imports jax, so env vars are too
# late — use jax.config before the backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
