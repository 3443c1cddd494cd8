"""Benchmark entry — covers all three BASELINE.json metrics on one chip.

Primary metric: scans matched per second (PL-ICP laser odometry workload,
lesson3). Baseline: the reference's PL-ICP odometry runs 4.2–8.1 ms/frame
on the author's CPU (`6.基于PL-ICP的激光雷达里程计.md:302-308`, see
BASELINE.md) → ~163 scans/s. BASELINE.json targets ≥10× per chip.

The ``extra`` dict carries the other two BASELINE metrics:
  * pose_graph_solve_ms — full LM run (doSPA(40) analogue) on a 1024-node
    mission-shaped graph, device-resident while_loop.
  * karto_scans_per_sec — whole-mission offline Karto pipeline (matching +
    loop closure + solves), end-to-end wall over the scan count.
  * karto_ate_m — ATE RMSE of that mission vs ground truth (the "ATE vs
    reference" proxy the driver can track round-over-round; golden-parity
    vs the actual reference C++ is asserted in tests/test_golden_*.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import time

import numpy as np


def bench_plicp():
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
    return B * iters / dt


def bench_solver_ms(n=1024):
    """Full LM run on a mission-shaped graph: noisy odometry chain + loop
    closures every 50 nodes (the doSPA(40) workload, spa2d.cpp:425-609)."""
    from tpu_slam import geometry_np as gnp
    from tpu_slam.config import SolverConfig
    from tpu_slam.solver.pose_graph import PoseGraphSolver

    rng = np.random.default_rng(17)
    th = np.linspace(0, 4 * np.pi, n)
    gt = np.stack([10 * np.cos(th), 10 * np.sin(th), th + np.pi / 2], -1)
    gt[:, 2] = np.arctan2(np.sin(gt[:, 2]), np.cos(gt[:, 2]))
    edges = []
    rels = gnp.relative(gt[:-1], gt[1:])
    for i in range(n - 1):
        edges.append((i, i + 1, rels[i] + rng.normal(0, 0.005, 3)))
    period = n // 2
    lrels = gnp.relative(gt[:-period], gt[period:])
    for i in range(0, n - period, 50):
        edges.append((i, i + period, lrels[i]))
    init = [gt[0]]
    for i in range(n - 1):  # drifted odometry chain as the initial guess
        init.append(gnp.compose(init[-1], edges[i][2]))
    init = np.asarray(init)
    info = np.diag([1e4, 1e4, 4e4])

    def build():
        s = PoseGraphSolver(SolverConfig())
        for i in range(n):
            s.add_node(i, init[i])
        for i, j, m in edges:
            s.add_constraint(i, j, m, information=info)
        return s

    build().compute()  # compile
    best = np.inf
    for _ in range(3):
        s = build()
        t0 = time.perf_counter()
        s.compute()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def bench_karto():
    """Whole-mission Karto: the 3-lap corridor loop through the offline
    pipeline (batched matching, loop closure, LM solves). Returns
    (scans_per_sec, ate_m)."""
    import dataclasses

    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan
    from tpu_slam.models.offline import offline_slam
    from tpu_slam.utils.evaluation import ate_rmse

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        scan=dataclasses.replace(
            cfg.scan, num_beams=360, range_max=12.0, range_threshold=10.0
        ),
    )
    laps = 3
    traj = np.concatenate(
        [sim.loop_trajectory(arm=9.0, width=2.6, speed=0.9)] * laps
    )
    world = sim.corridor_loop_world(arm=9.0, width=2.6)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=8)
    rng = np.random.default_rng(3)
    drift = np.cumsum(rng.normal(0, [0.02, 0.02, 0.004], (len(traj), 3)), 0)
    odom = seq.gt_poses + drift
    scans = make_scan(seq.ranges, cfg.scan, stamp=seq.stamps.astype(np.float32))

    res = offline_slam(scans, cfg, odom=odom)  # warm (compiles)
    # median-of-3 with the spread recorded: tunnel dispatch throughput
    # fluctuates run-to-run (round-3 isolated runs of this mission spanned
    # 528-1030 scans/s); a one-sided best-of-N would drift the
    # round-over-round comparison
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = offline_slam(scans, cfg, odom=odom)
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))
    spread = (len(traj) / max(dts), len(traj) / min(dts))
    ate = float(ate_rmse(res.poses, seq.gt_poses))
    return len(traj) / dt, ate, spread


def main():
    from tpu_slam.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    scans_per_sec = bench_plicp()
    baseline_cpu = 1000.0 / 6.15  # ≈163 scans/s (4.2–8.1 ms midpoint)

    extra = {}
    try:
        extra["pose_graph_solve_ms"] = round(bench_solver_ms(), 1)
    except Exception as e:  # never let an extra break the primary metric
        extra["pose_graph_solve_ms_error"] = repr(e)[:120]
    try:
        ksps, ate, spread = bench_karto()
        extra["karto_scans_per_sec"] = round(ksps, 1)  # median of 3
        extra["karto_scans_per_sec_min"] = round(spread[0], 1)
        extra["karto_scans_per_sec_max"] = round(spread[1], 1)
        extra["karto_ate_m"] = round(ate, 4)
    except Exception as e:
        extra["karto_error"] = repr(e)[:120]

    print(
        json.dumps(
            {
                "metric": "plicp_scan_match_throughput",
                "value": round(scans_per_sec, 1),
                "unit": "scans/sec/chip",
                "vs_baseline": round(scans_per_sec / baseline_cpu, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
