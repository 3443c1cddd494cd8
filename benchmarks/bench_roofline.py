"""MFU / roofline accounting for the three hot Pallas kernels (VERDICT 7).

For each kernel: device-only time (amortized over a queued dispatch train,
minus the measured dispatch floor — wall-clock through the tunnel is NOT
device time), analytic MXU FLOPs from the kernel's actual matmul shapes,
HBM bytes from the array traffic, and % of the chip's MEASURED matmul /
copy roofline (calibrated in-process, so the numbers don't depend on
assumed peak specs).

FLOP models (from the kernel sources; shapes are static):
  * plicp_fused (matmul variant, ops/pallas/plicp_fused.py:296-321):
    per ACTIVE pair-round one (2,N)ᵀ(2,M) cross-term contraction
    (4·N·M FLOPs) + one (9,M)@(M,N) gather matmul (18·N·M) → 22·N·M f32;
    upper bound assumes all `max_iterations` rounds stay active.
  * hector_fused (ops/pallas/hector_fused.py:165-171): per GN iteration
    two (Np,Wy)@(Wy,Wx) one-hot row matmuls → 4·Np·Wy·Wx f32 per iter,
    summed over the pyramid's per-level iteration counts.
  * correlative_response (ops/pallas/correlative_response.py): per
    (angle, beam group of B) one block-diag (B·n_yp,B·s_y)@(B·s_y,s_x)
    + one (B·n_yp,s_x)@(s_x,B·n_xp) selection matmul — B² FLOP growth
    traded for B× fewer serial matmul issues (the measured bound).

    python benchmarks/bench_roofline.py          # TPU (the only sane target)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed_train(fn, args_list, fetch, iters):
    """Queue `iters` dispatches, one fetch barrier; returns wall/iter."""
    r = fn(*args_list[0])
    _ = np.asarray(fetch(r))  # compile + barrier
    t0 = time.perf_counter()
    for i in range(iters):
        r = fn(*args_list[i % len(args_list)])
    _ = np.asarray(fetch(r))
    return (time.perf_counter() - t0) / iters


K_INPROG = 8  # in-program repeats per dispatch


def timed_inprog(fn_i, args, fetch, iters, floor=0.0):
    """Device time per call with the repeat loop INSIDE one XLA program.

    The axon tunnel's ability to pipeline queued dispatches fluctuates
    between sessions (measured 86 vs 227 TF/s for the same matmul train
    minutes apart) — per-dispatch relay cost then pollutes kernel timings.
    `fn_i(i, *args)` must perturb one input with the iteration index so the
    loop body isn't hoisted as loop-invariant; the wrapper runs K_INPROG
    calls per dispatch and charges (wall − floor)/K to the kernel.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def rep(*a):
        def body(i, carry):
            out = fn_i(i, *a)
            return carry + fetch(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, K_INPROG, body, jnp.float32(0.0))

    wall = timed_train(rep, [args], lambda r: r, iters)
    return max(wall - floor, 0.0) / K_INPROG


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from tpu_slam.utils.compile_cache import enable

        enable()  # persistent XLA cache: tunnel compiles are slow

    import jax
    import jax.numpy as jnp

    from tpu_slam.config import default_config
    from tpu_slam.data import simulator as sim
    from tpu_slam.data.scan import make_scan

    # ---- calibration -----------------------------------------------------
    # dispatch floor: an empty-ish program through the same dispatch path
    tiny = jax.jit(lambda x: x + 1.0)
    floor = timed_train(tiny, [(jnp.zeros((8, 128)),)], lambda r: r[0, 0],
                        args.iters)

    def matmul_peak(dtype):
        k = 4096
        a = jnp.ones((k, k), dtype)
        b = jnp.ones((k, k), dtype)
        t = timed_inprog(
            lambda i, a, b: ((a + i * jnp.asarray(1e-30, dtype)) @ b).sum(),
            (a, b), lambda r: r, args.iters, floor,
        )
        return 2 * k**3 / t / 1e12  # TFLOP/s

    tf_f32 = matmul_peak(jnp.float32)
    tf_bf16 = matmul_peak(jnp.bfloat16)
    big = jnp.zeros((64, 1024, 1024), jnp.float32)  # 256 MB
    t = timed_inprog(
        lambda i, x: (x + (1.0 + 1e-30 * i)).sum(),
        (big,), lambda r: r, args.iters, floor,
    )
    gbs = 2 * big.size * 4 / t / 1e9  # read + write (sum ~free vs copy)
    print(f"calibrated: dispatch_floor={floor * 1e3:.2f} ms  "
          f"matmul f32={tf_f32:.1f} TF/s bf16={tf_bf16:.1f} TF/s  "
          f"hbm={gbs:.0f} GB/s", file=sys.stderr)

    rows = []

    def report(name, dev_ms, flops, fbytes, peak_tf, bound):
        tf = flops / (dev_ms * 1e-3) / 1e12
        gb = fbytes / (dev_ms * 1e-3) / 1e9
        rows.append(
            f"| {name} | {dev_ms:.2f} | {flops / 1e9:.1f} | "
            f"{fbytes / 1e6:.0f} | {100 * tf / peak_tf:.1f}% | "
            f"{100 * gb / gbs:.1f}% | {bound} |"
        )

    cfg = default_config()

    # ---- plicp_fused -----------------------------------------------------
    from tpu_slam.parallel.distributed_step import make_batched_matcher

    B = 512
    traj = sim.circle_trajectory(B + 1, radius=1.6, angular_rate=0.6)
    world = sim.office_world(seed=11, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=4)
    scans = make_scan(seq.ranges, cfg.scan)
    pts = np.where(
        np.asarray(scans.valid)[..., None], np.asarray(scans.points()), 0.0
    ).astype(np.float32)
    valid = np.asarray(scans.valid)
    match = make_batched_matcher(cfg)
    margs = (
        jnp.asarray(pts[1:]), jnp.asarray(valid[1:]),
        jnp.asarray(pts[:-1]), jnp.asarray(valid[:-1]),
        jnp.zeros((B, 3), jnp.float32),
    )
    wall = timed_inprog(
        lambda i, s_, sv, t_, tv, g: match(
            s_, sv, t_, tv, g + i * jnp.float32(1e-30)
        ),
        margs, lambda r: r.pose[0, 0], args.iters, floor,
    )
    dev_ms = max(wall, 1e-6) * 1e3
    N = M = -(-cfg.scan.num_beams // 128) * 128  # lane padding
    flops = 22 * N * M * cfg.plicp.max_iterations * B  # f32, upper bound
    fbytes = B * (2 * N * 3 + 2 * M * 3) * 4  # coords+valid in, pose out ~0
    report("plicp_fused (B=512)", dev_ms, flops, fbytes, tf_f32,
           "MXU one-hot gathers; rounds exit early on convergence")

    # ---- hector_fused ----------------------------------------------------
    from tpu_slam.models.hector_slam import HectorSLAM, build_pyramid_cfgs
    from tpu_slam.ops.pallas.hector_fused import _level_window
    from tpu_slam.data.scan import index_scan

    slam = HectorSLAM(cfg)
    traj = sim.circle_trajectory(4, radius=1.5)
    world = sim.office_world(seed=3, clear_path=traj)
    seq = sim.simulate_sequence(world, traj, cfg.scan, noise_std=0.004, seed=1)
    hscans = make_scan(seq.ranges, cfg.scan)
    s0 = index_scan(hscans, 0)
    slam.update_only(s0, jnp.asarray(seq.gt_poses[0], jnp.float32))
    s1 = index_scan(hscans, 1)
    hpts = jnp.where(
        s1.valid[..., None] & jnp.isfinite(s1.points()), s1.points(), 0.0
    )
    hvalid = s1.valid & jnp.all(jnp.isfinite(s1.points()), axis=-1)
    hargs = (slam.grids, jnp.asarray(seq.gt_poses[1], jnp.float32),
             hpts, hvalid)
    wall = timed_inprog(
        lambda i, g, p, pts_, v: slam._match_fn(
            g, p + i * jnp.float32(1e-30), pts_, v
        ),
        hargs, lambda r: r[0][0], args.iters, floor,
    )
    dev_ms = max(wall, 1e-6) * 1e3
    Np = -(-cfg.scan.num_beams // 128) * 128
    gcfgs = build_pyramid_cfgs(cfg)
    flops = 0
    fbytes = 0
    for lvl, g in enumerate(gcfgs):
        win = _level_window(g.size_y, g.size_x, float(g.resolution),
                            float(cfg.scan.range_max))
        Wy, Wx = win if win is not None else (g.size_y, g.size_x)
        iters = 1 + (cfg.hector.iterations_fine if lvl == 0
                     else cfg.hector.iterations_coarse)
        flops += iters * 4 * Np * Wy * Wx  # two (Np,Wy)@(Wy,Wx) per iter
        fbytes += g.size_y * g.size_x * 4  # grid streamed to VMEM once
    report("hector_fused (pyramid)", dev_ms, flops, fbytes, tf_f32,
           "one-hot row gathers on MXU; grids VMEM-resident per launch")

    # ---- correlative_response (front-end geometry) -----------------------
    from tpu_slam.ops.pallas.correlative_response import (
        _round_up, responses_sliced_pallas,
    )

    c = cfg.correlative
    res = c.correlation_search_space_resolution
    n_xy = int(round(c.correlation_search_space_dimension / res)) + 1
    stride = 2
    A = 21
    n_grid = 2445  # front-end correlation grid edge (range 12 m @ 0.01)
    rng = np.random.default_rng(0)
    grid = jnp.asarray(
        rng.integers(0, 100, (n_grid, n_grid)), jnp.int32
    )
    npts = cfg.scan.num_beams
    pts_cells = jnp.asarray(
        rng.uniform(-1000, 1000, (npts, 2)), jnp.float32
    )
    bvalid = jnp.ones((npts,), bool)
    angles = jnp.asarray(np.linspace(-0.35, 0.35, A), jnp.float32)
    cand0 = jnp.asarray([n_grid // 2, n_grid // 2], jnp.int32)
    f = jax.jit(
        lambda g, p, v, a: responses_sliced_pallas(
            g, p, v, a, cand0, n_xy, n_xy, stride
        )
    )
    wall = timed_inprog(
        lambda i, g, p, v, a: f(g, p + i * jnp.float32(1e-30), v, a),
        (grid, pts_cells, bvalid, angles),
        lambda r: r[0, 0], args.iters, floor,
    )
    dev_ms = max(wall, 1e-6) * 1e3
    span = (n_xy - 1) * stride + 1
    s_y = _round_up(span + 32, 8)
    s_x = _round_up(span + 128, 128)
    n_yp = _round_up(n_xy, 8)
    n_xp = _round_up(n_xy, 128)
    # block-diag beam groups (B beams per matmul pair): per group
    # (B·n_yp, B·s_y)@(B·s_y, s_x) + (B·n_yp, s_x)@(s_x, B·n_xp)
    from tpu_slam.ops.pallas.correlative_response import BEAMS_PER_GROUP

    Bg = BEAMS_PER_GROUP if (n_yp <= 32 and n_xp <= 128) else 1
    npts_p = -(-npts // Bg) * Bg
    flops = (
        A * (npts_p // Bg) * 2 * Bg * n_yp * s_x * (Bg * s_y + Bg * n_xp)
    )
    fbytes = n_grid * n_grid * 1  # int8 grid crosses HBM once per call
    report(f"correlative_response ({n_xy}x{n_xy}x{A})", dev_ms, flops,
           fbytes, tf_bf16,
           f"bf16 selection matmuls, {Bg} beams block-diag per issue; "
           "grid VMEM-resident across all angles")

    print("| kernel | device ms | GFLOP | MB | %matmul-roof | %HBM-roof "
          "| bound |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
