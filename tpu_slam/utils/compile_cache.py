"""Persistent XLA compilation cache for remote-device (tunnel) runs.

Over a remote device link a fresh XLA compile costs seconds-to-minutes,
and SLAM missions re-create identical executables every run (the shape
ladders in models/karto/pipeline.py and solver/pose_graph.py are
deliberately short for the same reason). Benchmarks and the driver bench
call :func:`enable` before first device use; it is NOT enabled package-
wide because CPU test runs would then trade compile time for noisy AOT
machine-feature warnings on load.
"""

import os


def enable(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``path``.

    No-op if TPU_SLAM_NO_COMPILE_CACHE is set or jax is unavailable.
    Harmless where the backend cannot serialize executables — JAX falls
    back to a plain recompile.
    """
    if os.environ.get("TPU_SLAM_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            path
            or os.environ.get(
                "TPU_SLAM_COMPILE_CACHE",
                os.path.expanduser("~/.cache/tpu_slam_xla"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # never let cache plumbing break a bench
        pass
