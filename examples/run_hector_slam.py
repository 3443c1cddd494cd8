"""Hector SLAM end-to-end (the lesson4 full-SLAM workload): multi-resolution
scan-to-map GN matching + log-odds mapping, with an ASCII map render."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp

    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan
    from tpu_slam.models.hector_slam import HectorSLAM
    from tpu_slam.utils.evaluation import ate_rmse

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        hector=dataclasses.replace(cfg.hector, map_size=512,
                                   map_multi_res_levels=3),
    )
    traj = sim.circle_trajectory(args.scans, radius=1.5, angular_rate=0.6)
    world = sim.office_world(seed=31, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=3)
    scans = make_scan(seq.ranges, cfg.scan, stamp=seq.stamps.astype(np.float32))

    slam = HectorSLAM(cfg)
    slam.last_pose = jnp.asarray(seq.gt_poses[0], jnp.float32)
    t0 = time.perf_counter()
    est = slam.run(scans)
    dt = time.perf_counter() - t0
    print(
        f"{args.scans} scans in {dt:.2f}s "
        f"({1000 * dt / args.scans:.2f} ms/scan incl. map updates)"
    )
    print(f"ATE RMSE (map frame): {ate_rmse(est, seq.gt_poses, align=False):.4f} m")

    m = slam.to_ros_map()
    occ, free, unk = (m == 100).sum(), (m == 0).sum(), (m == -1).sum()
    print(f"map: {occ} occupied / {free} free / {unk} unknown cells")
    # ASCII render (downsampled)
    step = max(1, m.shape[0] // 48)
    lut = {100: "#", 0: ".", -1: " "}
    sub = m[::step, ::step]
    print("\n".join("".join(lut[v] for v in row) for row in sub[::2]))


if __name__ == "__main__":
    main()
