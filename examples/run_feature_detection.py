"""Corner-feature detection (the lesson1 workload): LIO-SAM curvature
over the valid-compacted beam sequence, 6 sectors, <=20 corners each
(feature_detection.cc:77-179). Batched over the whole sequence: one
device program extracts corners for every scan at once."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan
    from tpu_slam.ops.features import extract_corner_features

    cfg = default_config()
    traj = sim.circle_trajectory(120, radius=1.6, angular_rate=0.5)
    world = sim.office_world(seed=9, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.003, seed=2)
    scans = make_scan(seq.ranges, cfg.scan)

    fn = jax.jit(lambda s: extract_corner_features(s, cfg.features))
    mask = np.asarray(fn(scans))  # compile + barrier
    t0 = time.perf_counter()
    mask = np.asarray(fn(scans))
    dt = time.perf_counter() - t0

    T = scans.ranges.shape[0]
    per_scan = mask.sum(axis=-1)
    print(
        f"{T} scans featurized in {dt * 1e3:.1f} ms "
        f"({dt / T * 1e6:.0f} us/scan)"
    )
    print(
        f"corners/scan: mean {per_scan.mean():.1f} "
        f"min {per_scan.min()} max {per_scan.max()}"
    )
    assert per_scan.mean() > 4  # office corners are detected


if __name__ == "__main__":
    main()
