"""Karto pose-graph SLAM end-to-end (the lesson6 workload): drifting
odometry around a corridor loop, correlative front-end, loop closure,
distributed-ready LM back-end, map regeneration from corrected scans."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import dataclasses
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument(
        "--async-backend", action="store_true",
        help="dispatch loop-closure solves asynchronously (pipeline "
        "parallelism); the front-end keeps matching while the device "
        "optimizes",
    )
    ap.add_argument("--checkpoint", help="save mapper state here when done")
    ap.add_argument(
        "--save-map",
        help="write <base>.pgm + <base>.yaml (ROS map_server format)",
    )
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tpu_slam import geometry as geo
    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan
    from tpu_slam.models.karto.pipeline import KartoSLAM
    from tpu_slam.models.karto.occupancy import karto_map
    from tpu_slam.utils.evaluation import ate_rmse
    from tpu_slam.utils.events import logging_listener

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        scan=dataclasses.replace(
            cfg.scan, num_beams=180, range_max=6.0, range_threshold=5.0
        ),
        correlative=dataclasses.replace(
            cfg.correlative, correlation_search_space_resolution=0.02
        ),
        loop=dataclasses.replace(
            cfg.loop, loop_search_space_dimension=4.0,
            loop_search_maximum_distance=3.0,
            loop_match_minimum_chain_size=5,
        ),
        karto=dataclasses.replace(
            cfg.karto, do_loop_closing=not args.no_loop,
            async_loop_closure=args.async_backend,
        ),
    )

    traj = sim.loop_trajectory(arm=9.0, width=2.6, speed=0.9)
    world = sim.corridor_loop_world(arm=9.0, width=2.6)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=8)
    # drifting wheel odometry
    rng = np.random.default_rng(3)
    odom = [seq.gt_poses[0].copy()]
    for i in range(1, len(seq.gt_poses)):
        d = np.array(
            geo.relative(
                jnp.asarray(seq.gt_poses[i - 1]), jnp.asarray(seq.gt_poses[i])
            )
        )
        d[:2] += rng.normal(0, 0.02, 2)
        d[2] += rng.normal(0, 0.004)
        odom.append(
            np.asarray(geo.compose(jnp.asarray(odom[-1]), jnp.asarray(d)))
        )
    odom = np.asarray(odom)
    scans = make_scan(seq.ranges, cfg.scan, stamp=seq.stamps.astype(np.float32))

    slam = KartoSLAM(cfg)
    t0 = time.perf_counter()
    accepted = slam.run(scans, odom)
    dt = time.perf_counter() - t0
    est = slam.trajectory()
    gt = seq.gt_poses[accepted]
    print(
        f"{len(accepted)} scans accepted of {len(traj)} in {dt:.1f}s; "
        f"{slam.loop_closures} loop closures, {slam.solver.num_edges} edges"
    )
    print(f"ATE raw odometry: {ate_rmse(odom[accepted], gt):.4f} m")
    print(f"ATE karto SLAM:   {ate_rmse(est, gt):.4f} m")

    m, gcfg = karto_map(slam, resolution=0.1)
    print(
        f"map {m.shape}: {(m == 100).sum()} occ / {(m == 0).sum()} free"
    )
    if args.save_map:
        from tpu_slam.models.karto.occupancy import karto_graph_png
        from tpu_slam.utils.map_io import save_map

        paths = save_map(args.save_map, np.asarray(m), gcfg)
        print(f"map saved: {paths[0]} + {paths[1]}")
        gpath = karto_graph_png(
            slam, args.save_map + "_graph.png", ros_map=m, grid=gcfg
        )
        print(f"pose graph saved: {gpath}")
    for ev in slam.events.history[-3:]:
        print(f"  event [{ev.kind}] {ev.message}")
    print("stage timing (host wall incl. device sync):")
    print("  " + slam.timer.report().replace("\n", "\n  "))

    if args.checkpoint:
        from tpu_slam.utils.checkpoint import save_karto

        save_karto(slam, args.checkpoint)
        print(f"checkpoint saved to {args.checkpoint}")


if __name__ == "__main__":
    main()
