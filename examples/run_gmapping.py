"""GMapping-style occupancy map building (the lesson4 gmapping workload):
hit/visit counters per cell, occupied iff hits/visits > 0.25
(gmapping.cc:146-158). The reference needs 0.39-0.41 s per scan on a
1600x1600 grid; here each scan is two scatter-adds."""

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

    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan
    from tpu_slam.models.gmapping import GMapping

    cfg = default_config()
    traj = sim.loop_trajectory(arm=9.0, width=2.6, speed=0.9)
    world = sim.corridor_loop_world(arm=9.0, width=2.6)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=6)
    scans = make_scan(seq.ranges, cfg.scan)

    gm = GMapping(cfg)
    t0 = time.perf_counter()
    gm.run(scans, seq.gt_poses.astype(np.float32))
    m = gm.to_ros_map()
    m = np.asarray(m)
    dt = time.perf_counter() - t0

    T = scans.ranges.shape[0]
    occ, free, unk = (m == 100).sum(), (m == 0).sum(), (m == -1).sum()
    print(
        f"{T} scans -> {m.shape} map in {dt:.2f}s "
        f"({dt / T * 1e3:.2f} ms/scan; reference: 390-410 ms/scan)"
    )
    print(f"cells: {occ} occupied / {free} free / {unk} unknown")
    assert occ > 200 and free > 10_000


if __name__ == "__main__":
    main()
