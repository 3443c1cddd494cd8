"""PL-ICP laser odometry end-to-end (the lesson3 workload).

Replays a simulated office sequence (or a rosbag with --bag) through the
keyframe PL-ICP odometry and reports ATE/RPE + timing.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bag", help="rosbag with a laser_scan topic")
    ap.add_argument("--topic", default="laser_scan")
    ap.add_argument("--scans", type=int, default=200)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan
    from tpu_slam.models.plicp_odometry import PLICPOdometry
    from tpu_slam.utils.evaluation import ate_rmse, rpe_rmse
    from tpu_slam.utils.profiling import StageTimer

    cfg = default_config()
    gt = None
    if args.bag:
        from tpu_slam.data.rosbag import parse_messages

        ranges, stamps = [], []
        for msg, parsed in parse_messages(args.bag, topics={args.topic}):
            ranges.append(parsed["ranges"])
            stamps.append(parsed["stamp"])
        ranges = np.asarray(ranges)
        stamps = np.asarray(stamps) - stamps[0]
        scans = make_scan(ranges, cfg.scan, stamp=stamps.astype(np.float32))
        print(f"loaded {len(stamps)} scans from {args.bag}")
    else:
        traj = sim.circle_trajectory(args.scans, radius=1.6, angular_rate=0.6)
        world = sim.office_world(seed=21, clear_path=traj)
        seq = sim.simulate_sequence(
            world, traj, cfg.scan, noise_std=0.004, seed=4
        )
        scans = make_scan(
            seq.ranges, cfg.scan, stamp=seq.stamps.astype(np.float32)
        )
        gt = seq.gt_poses

    odom = PLICPOdometry(cfg)
    t0 = time.perf_counter()
    est = odom.run(scans)
    dt = time.perf_counter() - t0
    n = scans.ranges.shape[0]
    print(f"processed {n} scans in {dt:.2f}s ({1000 * dt / n:.2f} ms/scan)")
    if gt is not None:
        print(f"ATE RMSE: {ate_rmse(est, gt):.4f} m")
        print(f"RPE RMSE: {rpe_rmse(est, gt):.4f} m")
    print(f"final pose: {est[-1].round(3)}")


if __name__ == "__main__":
    main()
