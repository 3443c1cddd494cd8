"""The ENTIRE doSPA LM loop as ONE Pallas TPU kernel.

Round-3 measurement: through this execution path every XLA-level
while_loop iteration costs ~20-30 µs, so the device LM (≤40 LM iterations
× ≤100 CG iterations + normal equations + cost, each a separate XLA op
chain) was latency-bound at ~350 ms on the 1024-node graph while the
reference's CPU sparse path ran in ~45 ms. Inside a Pallas kernel a loop
step costs nanoseconds-to-microseconds, so this kernel runs the WHOLE
solve — normal equations (transposed edges-along-lanes formulas), block-
Jacobi preconditioned CG, graph cost, and the λ accept/reject loop with
the doSPA schedule (spa2d.cpp:425-609) — in one launch with the graph
VMEM-resident.

Gather/scatter are one-hot matmuls against GiT/GjT (E, M): column maps
built in-kernel from the edge indices (one iota compare each). They are
O(M·E) VMEM, which caps this kernel at mission-scale graphs
(M·E ≤ 3.2e6 — every indoor mission incl. late online graphs, and the
1024-node benchmark);
larger graphs fall back to the XLA paths, and the sharded mesh program is
unchanged. Selection matmuls of f32 against a 0/1 one-hot are exact (the
same contract the plicp/correlative kernels rely on); accumulation orders
differ from the XLA path in low f32 bits only.

Semantics pinned by tests/test_pose_graph.py::test_fused_lm_matches_xla
(interpret mode) and the golden doSPA-parity suite running through
PoseGraphSolver.compute().
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: the combined (E, M) endpoint map costs 4·M·E bytes of
# scratch (gi and gj share one buffer, decoded per chunk) and the
# chunk-streamed kernel needs ~1.5 MB of stack on top — 3.2e6 elements
# ≈ 12.8 MB scratch fits the 16 MB scoped limit
MAX_ONEHOT_ELEMS = 3_200_000


def _norm_angle(th):
    two_pi = 6.283185307179586
    return th - two_pi * jnp.floor((th + 3.141592653589793) / two_pi)


def _rsum(x):
    """(k, N) → (1, 1) staged reduction (lane axis first)."""
    return jnp.sum(jnp.sum(x, axis=1, keepdims=True), axis=0, keepdims=True)


def _make_kernel(M: int, E: int, iters: int, cg_iters: int,
                 cg_tol: float, sq_min_delta: float):
    def kernel(
        pT_ref,      # (8, M) rows 0..2 = x/y/θ
        eidx_ref,    # (E, 8) cols: 0=ei, 1=ej (f32 ids)
        meansT_ref,  # (8, E) rows 0..2
        W6_ref,      # (8, E) rows 0..5 (mask-weighted info upper triangle)
        fm_ref,      # (8, M) row 0: free mask (0 = gauge-fixed/unused)
        lam_ref,     # (1, 1) initial lambda
        out_ref,     # (8, M) corrected poses (rows 0..2)
        stats_ref,   # (1, 128) [cost0, cost, good, iters]
        gc_ref,            # scratch (E, M) combined endpoint map:
        #                     (col==ei) + 2·(col==ej) ∈ {0,1,2,3} — one
        #                     buffer instead of two halves the VMEM cost;
        #                     each chunk use decodes gi/gj with two cheap
        #                     VPU passes
        ga_ref, gb_ref,    # (8, E) gather outputs (reused per call)
        sc_ref,            # (16, E) scatter staging
    ):
        dt = jnp.float32
        # build the one-hots in row chunks INSIDE fori_loop — a full-size
        # (E, M) iota+compare puts ~10 MB of values on the scoped-VMEM
        # stack, and unrolled python chunk loops do NOT reuse stack slots
        CHB = 128
        colsB = jax.lax.broadcasted_iota(jnp.int32, (CHB, M), 1)

        def build_chunk(k, _):
            r0 = pl.multiple_of(k * CHB, CHB)
            gc_ref[pl.ds(r0, CHB), :] = (
                (colsB == eidx_ref[pl.ds(r0, CHB), 0:1].astype(jnp.int32)
                 ).astype(dt)
                + 2.0 * (
                    colsB == eidx_ref[pl.ds(r0, CHB), 1:2].astype(jnp.int32)
                ).astype(dt)
            )
            return 0

        jax.lax.fori_loop(0, E // CHB, build_chunk, 0)

        meansT = meansT_ref[0:3, :]
        W6 = [W6_ref[k : k + 1, :] for k in range(6)]  # (1, E) rows
        fm = fm_ref[0:1, :]  # (1, M)
        p0 = pT_ref[0:3, :]  # (3, M)

        # the (E, M) one-hot is ~4.7 MB as a VALUE — loading it whole (or
        # in an UNROLLED chunk loop, which doesn't reuse stack slots) blows
        # the 16 MB scoped-VMEM stack. Chunks stream inside fori_loop with
        # scratch staging.
        CH = 128
        n_ch = E // CH

        def _decode(gc, which):
            # gc ∈ {0,1,2,3} = gi + 2·gj → gi = gc − 2·⌊gc/2⌋, gj = ⌊gc/2⌋
            gj = jnp.floor(gc * 0.5)
            return gc - 2.0 * gj if which == 0 else gj

        def gath(xT, precise=True):  # (3, M) → (3, E)×2 at endpoints
            # HIGHEST: the MXU's single-pass bf16 rounding of the f32
            # operand is NOT exact even against a 0/1 one-hot (+3.6% on
            # the initial graph cost); DEFAULT anywhere in the solve
            # (gathers, matvec, or assembly scatters) measurably degrades
            # the reached optimum (mission ATE 0.0145-0.0152 vs 0.0102 m)
            # — exact selection everywhere costs 2x kernel time and is
            # still ~4x the XLA program.
            prec = (jax.lax.Precision.HIGHEST if precise
                    else jax.lax.Precision.DEFAULT)

            def chunk(k, _):
                c0 = pl.multiple_of(k * CH, CH)
                gc = gc_ref[pl.ds(c0, CH), :]
                ga_ref[0:3, pl.ds(c0, CH)] = jax.lax.dot_general(
                    xT, _decode(gc, 0),
                    (((1,), (1,)), ((), ())), preferred_element_type=dt,
                    precision=prec,
                )
                gb_ref[0:3, pl.ds(c0, CH)] = jax.lax.dot_general(
                    xT, _decode(gc, 1),
                    (((1,), (1,)), ((), ())), preferred_element_type=dt,
                    precision=prec,
                )
                return 0

            jax.lax.fori_loop(0, n_ch, chunk, 0)
            return ga_ref[0:3, :], gb_ref[0:3, :]

        def scat(rows, which):  # (k, E) → (k, M) summed at endpoints
            kr = rows.shape[0]
            sc_ref[0:kr, :] = rows

            def chunk(k, acc):
                c0 = pl.multiple_of(k * CH, CH)
                # HIGHEST here too: DEFAULT-precision H/b assembly and
                # matvec scatters converge the LM to a measurably worse
                # optimum (mission ATE 0.0152 vs 0.0102 m) — selection
                # exactness matters on BOTH sides of the one-hot
                return acc + jax.lax.dot_general(
                    sc_ref[0:kr, pl.ds(c0, CH)],
                    _decode(gc_ref[pl.ds(c0, CH), :], which),
                    (((1,), (0,)), ((), ())), preferred_element_type=dt,
                    precision=jax.lax.Precision.HIGHEST,
                )

            return jax.lax.fori_loop(
                0, n_ch, chunk, jnp.zeros((kr, M), dt)
            )

        def edge_terms(pT):
            pi, pj = gath(pT)  # (3, E)
            c = jnp.cos(pi[2:3, :])
            s = jnp.sin(pi[2:3, :])
            dx = pj[0:1, :] - pi[0:1, :]
            dy = pj[1:2, :] - pi[1:2, :]
            r0 = c * dx + s * dy - meansT[0:1, :]
            r1 = -s * dx + c * dy - meansT[1:2, :]
            rt = pj[2:3, :] - pi[2:3, :] - meansT[2:3, :]
            r2 = _norm_angle(rt)
            drx = -s * dx + c * dy
            dry = -c * dx - s * dy
            return c, s, drx, dry, r0, r1, r2

        def cost_of(pT):
            _c, _s, _dx, _dy, r0, r1, r2 = edge_terms(pT)
            q = (
                W6[0] * r0 * r0 + 2 * W6[1] * r0 * r1
                + 2 * W6[2] * r0 * r2 + W6[3] * r1 * r1
                + 2 * W6[4] * r1 * r2 + W6[5] * r2 * r2
            )
            return _rsum(q)  # (1, 1)

        def normal_eq(pT):
            c, s, drx, dry, r0, r1, r2 = edge_terms(pT)
            z = jnp.zeros_like(c)
            o = jnp.ones_like(c)

            def JtW(j0, j1, j2):
                return (
                    j0 * W6[0] + j1 * W6[1] + j2 * W6[2],
                    j0 * W6[1] + j1 * W6[3] + j2 * W6[4],
                    j0 * W6[2] + j1 * W6[4] + j2 * W6[5],
                )

            JiW = [JtW(-c, s, z), JtW(-s, -c, z), JtW(drx, dry, -o)]
            JjW = [JtW(c, -s, z), JtW(s, c, z), JtW(z, z, o)]
            Jic = [(-c, s, z), (-s, -c, z), (drx, dry, -o)]
            Jjc = [(c, -s, z), (s, c, z), (z, z, o)]

            def block(JW, Jc):
                return jnp.concatenate(
                    [
                        JW[a][0] * Jc[b][0] + JW[a][1] * Jc[b][1]
                        + JW[a][2] * Jc[b][2]
                        for a in range(3)
                        for b in range(3)
                    ],
                    axis=0,
                )  # (9, E)

            Hii9 = block(JiW, Jic)
            Hjj9 = block(JjW, Jjc)
            Hij9 = block(JiW, Jjc)
            bi3 = jnp.concatenate(
                [JiW[a][0] * r0 + JiW[a][1] * r1 + JiW[a][2] * r2
                 for a in range(3)], axis=0,
            )
            bj3 = jnp.concatenate(
                [JjW[a][0] * r0 + JjW[a][1] * r1 + JjW[a][2] * r2
                 for a in range(3)], axis=0,
            )
            Hd9 = scat(Hii9, 0) + scat(Hjj9, 1)  # (9, M)
            b3 = scat(bi3, 0) + scat(bj3, 1)  # (3, M)
            return Hd9, Hij9, b3

        def solve(pT, lam):
            """Block-Jacobi PCG for H δ = −b (cg_solve semantics)."""
            Hd9, Hij9, b3 = normal_eq(pT)
            H9 = [Hij9[k : k + 1, :] for k in range(9)]  # (1, E) rows
            fm0 = fm
            one_m = 1.0 - fm0
            jit = jnp.float32(1e-12)
            d00 = ((Hd9[0:1] + jit) * (1.0 + lam)) * fm0 + one_m
            d11 = ((Hd9[4:5] + jit) * (1.0 + lam)) * fm0 + one_m
            d22 = ((Hd9[8:9] + jit) * (1.0 + lam)) * fm0 + one_m
            d01 = Hd9[1:2] * fm0
            d02 = Hd9[2:3] * fm0
            d12 = Hd9[5:6] * fm0
            # block-Jacobi inverse (3×3 cofactors), (1, M) rows
            c00 = d11 * d22 - d12 * d12
            c01 = d02 * d12 - d01 * d22
            c02 = d01 * d12 - d02 * d11
            det = d00 * c00 + d01 * c01 + d02 * c02
            inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
            c11 = d00 * d22 - d02 * d02
            c12 = d02 * d01 - d00 * d12
            c22 = d00 * d11 - d01 * d01
            m00, m01, m02 = c00 * inv_det, c01 * inv_det, c02 * inv_det
            m11, m12, m22 = c11 * inv_det, c12 * inv_det, c22 * inv_det

            def precond(r):
                return jnp.concatenate(
                    [
                        m00 * r[0:1] + m01 * r[1:2] + m02 * r[2:3],
                        m01 * r[0:1] + m11 * r[1:2] + m12 * r[2:3],
                        m02 * r[0:1] + m12 * r[1:2] + m22 * r[2:3],
                    ],
                    axis=0,
                )

            def mv(x):
                x = x * fm0
                xi, xj = gath(x, precise=True)
                u = jnp.concatenate(
                    [
                        H9[0] * xj[0:1] + H9[1] * xj[1:2] + H9[2] * xj[2:3],
                        H9[3] * xj[0:1] + H9[4] * xj[1:2] + H9[5] * xj[2:3],
                        H9[6] * xj[0:1] + H9[7] * xj[1:2] + H9[8] * xj[2:3],
                    ],
                    axis=0,
                )
                v = jnp.concatenate(
                    [
                        H9[0] * xi[0:1] + H9[3] * xi[1:2] + H9[6] * xi[2:3],
                        H9[1] * xi[0:1] + H9[4] * xi[1:2] + H9[7] * xi[2:3],
                        H9[2] * xi[0:1] + H9[5] * xi[1:2] + H9[8] * xi[2:3],
                    ],
                    axis=0,
                )
                y_off = scat(u, 0) + scat(v, 1)
                yd = jnp.concatenate(
                    [
                        d00 * x[0:1] + d01 * x[1:2] + d02 * x[2:3],
                        d01 * x[0:1] + d11 * x[1:2] + d12 * x[2:3],
                        d02 * x[0:1] + d12 * x[1:2] + d22 * x[2:3],
                    ],
                    axis=0,
                )
                y = yd + y_off
                return y * fm0 + x * (1.0 - fm0)

            bb = -b3 * fm0
            stop2 = jnp.float32(cg_tol) * _rsum(bb * bb)  # (1,1)
            r_ = bb  # x0 = 0 → r = b
            z_ = precond(r_)

            def cg_body(it, carry):
                x, r, z, p, rz = carry
                live = (_rsum(r * r) > stop2).astype(dt)  # (1,1)
                Ap = mv(p)
                pAp = _rsum(p * Ap)
                alpha = rz / jnp.where(pAp != 0.0, pAp, 1.0)
                x = x + live * alpha * p
                r = r - live * alpha * Ap
                z_new = precond(r)
                z = live * z_new + (1.0 - live) * z
                rz_new = _rsum(r * z)
                beta = rz_new / jnp.where(rz != 0.0, rz, 1.0)
                p = live * (z + beta * p) + (1.0 - live) * p
                rz = live * rz_new + (1.0 - live) * rz
                return (x, r, z, p, rz)

            x, *_ = jax.lax.fori_loop(
                0, cg_iters, cg_body,
                (jnp.zeros_like(bb), r_, z_, z_, _rsum(r_ * z_)),
            )
            return x

        cost0 = cost_of(p0)  # (1, 1)
        one = jnp.ones((1, 1), dt)

        def lm_body(carry):
            pT, lam, laminc, cost, it, good, _done = carry
            delta = solve(pT, lam[0, 0])
            sq = _rsum(delta * delta)
            converged = (sq < sq_min_delta).astype(dt)  # (1,1)
            cand = pT + delta
            cand = jnp.concatenate(
                [cand[0:2, :], _norm_angle(cand[2:3, :])], axis=0
            )
            new_cost = cost_of(cand)
            accept = ((new_cost < cost).astype(dt)) * (1.0 - converged)
            pT = accept * cand + (1.0 - accept) * pT
            cost = accept * new_cost + (1.0 - accept) * cost
            lam = accept * lam * 0.5 + (1.0 - accept) * lam * laminc
            laminc = accept * laminc + (1.0 - accept) * laminc * 2.0
            return (pT, lam, laminc, cost, it + one, good + accept,
                    converged)

        def lm_cond(carry):
            _p, _l, _li, _c, it, _g, done = carry
            return (it[0, 0] < iters) & (done[0, 0] < 0.5)

        zero = jnp.zeros((1, 1), dt)
        pT, _lam, _li, cost, it, good, _d = jax.lax.while_loop(
            lm_cond, lm_body,
            (p0, lam_ref[...] * one, 2.0 * one, cost0, zero, zero, zero),
        )
        out_ref[0:3, :] = pT
        out_ref[4:8, :] = jnp.zeros((4, M), dt)
        # scalar stores to VMEM aren't allowed — build the stats row by
        # lane selection; it ALSO lands in out row 3 so callers can fetch
        # poses + stats with ONE device→host transfer (a fetch costs a
        # full tunnel round trip)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        srow = (
            jnp.where(lane == 0, cost0, 0.0)
            + jnp.where(lane == 1, cost, 0.0)
            + jnp.where(lane == 2, good, 0.0)
            + jnp.where(lane == 3, it, 0.0)
        )
        stats_ref[...] = srow
        laneM = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        out_ref[3:4, :] = (
            jnp.where(laneM == 0, cost0, 0.0)
            + jnp.where(laneM == 1, cost, 0.0)
            + jnp.where(laneM == 2, good, 0.0)
            + jnp.where(laneM == 3, it, 0.0)
        )

    return kernel


def fused_lm_applicable(M: int, E: int, dtype) -> bool:
    return dtype == jnp.float32 and M * E <= MAX_ONEHOT_ELEMS


@functools.partial(
    jax.jit,
    static_argnames=("iters", "cg_iters", "cg_tol", "sq_min_delta",
                     "interpret"),
)
def fused_lm_solve(
    poses,      # (M, 3) f32
    ei, ej,     # (E,) int32
    means,      # (E, 3)
    infos,      # (E, 3, 3)
    mask,       # (E,) bool
    free_mask,  # (M,) bool
    lam0,       # scalar
    iters: int,
    cg_iters: int,
    cg_tol: float,
    sq_min_delta: float,
    interpret: bool = False,
):
    """Returns (poses (M,3), cost0, cost, iterations, good) — the
    _lm_loop_program contract, computed in one kernel launch."""
    M0, _ = poses.shape
    E0 = ei.shape[0]
    M = -(-M0 // 128) * 128
    E = -(-E0 // 128) * 128
    dt = jnp.float32

    def pad2(x, rows, cols):
        out = jnp.zeros((rows, cols), dt)
        return jax.lax.dynamic_update_slice(out, x.astype(dt), (0, 0))

    pT = pad2(poses.T, 8, M)
    # (E, 8) edge index table; padded edges point at the last node slot —
    # their W6 rows are zero so they contribute nothing anywhere
    eidx = jnp.full((E, 8), float(M - 1), dt)
    eidx = eidx.at[:E0, 0].set(ei.astype(dt))
    eidx = eidx.at[:E0, 1].set(ej.astype(dt))
    meansT = pad2(means.T, 8, E)
    w = mask.astype(dt)
    W6 = pad2(
        jnp.stack([infos[:, 0, 0], infos[:, 0, 1], infos[:, 0, 2],
                   infos[:, 1, 1], infos[:, 1, 2], infos[:, 2, 2]]) * w,
        8, E,
    )
    fm = pad2(free_mask.astype(dt)[None, :], 8, M)
    lam = jnp.full((1, 1), lam0, dt)

    out, stats = pl.pallas_call(
        _make_kernel(M, E, iters, cg_iters, float(cg_tol),
                     float(sq_min_delta)),
        out_shape=[
            jax.ShapeDtypeStruct((8, M), dt),
            jax.ShapeDtypeStruct((1, 128), dt),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[
            pltpu.VMEM((E, M), dt),
            pltpu.VMEM((8, E), dt),
            pltpu.VMEM((8, E), dt),
            pltpu.VMEM((16, E), dt),
        ],
        interpret=interpret,
    )(pT, eidx, meansT, W6, fm, lam)
    # out is the PACKED result: rows 0-2 = posesᵀ, row 3 lanes 0-3 =
    # (cost0, cost, good, iters) — fetchable in one transfer
    return (
        out[0:3, :M0].T,
        stats[0, 0], stats[0, 1], stats[0, 3], stats[0, 2],
        out,
    )
