"""Benchmark entry: batched PL-ICP scan matching throughput on one chip.

Metric: scans matched per second (PL-ICP laser odometry workload, lesson3).
Baseline: the reference's PL-ICP odometry runs 4.2–8.1 ms/frame on the
author's CPU (`6.基于PL-ICP的激光雷达里程计.md:302-308`, see BASELINE.md)
→ ~163 scans/s. BASELINE.json targets ≥10× per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan
    from tpu_slam.parallel.distributed_step import make_batched_matcher

    cfg = default_config()  # 360 beams, 10 PL-ICP rounds — reference workload
    B = 512

    # build B realistic scan pairs from the simulator
    traj = sim.circle_trajectory(B + 1, radius=1.6, angular_rate=0.6)
    world = sim.office_world(seed=11, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=4)
    scans = make_scan(seq.ranges, cfg.scan)
    pts = np.where(
        np.asarray(scans.valid)[..., None], np.asarray(scans.points()), 0.0
    ).astype(np.float32)
    valid = np.asarray(scans.valid)

    src = jnp.asarray(pts[1:])
    srcv = jnp.asarray(valid[1:])
    tgt = jnp.asarray(pts[:-1])
    tgtv = jnp.asarray(valid[:-1])
    guesses = jnp.zeros((B, 3), jnp.float32)

    match = make_batched_matcher(cfg)

    # warmup / compile. NOTE: block_until_ready is unreliable through the
    # axon tunnel — a device-to-host value fetch is the only sound barrier.
    res = match(src, srcv, tgt, tgtv, guesses)
    _ = np.asarray(res.pose)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        res = match(src, srcv, tgt, tgtv, guesses)
    _ = np.asarray(res.pose)
    dt = time.perf_counter() - t0

    scans_per_sec = B * iters / dt
    baseline_cpu = 1000.0 / 6.15  # ≈163 scans/s (4.2–8.1 ms midpoint)
    print(
        json.dumps(
            {
                "metric": "plicp_scan_match_throughput",
                "value": round(scans_per_sec, 1),
                "unit": "scans/sec/chip",
                "vs_baseline": round(scans_per_sec / baseline_cpu, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
