"""HBM-streamed block cyclic-reduction LM — the beyond-VMEM direct solver.

The single-launch kernel (solver/pallas_cr_lm.py) keeps the WHOLE banded
system in VMEM: exact and fastest below ~3.3e6 slots (W·K ≤ ~0.5M nodes of
state), but at 16,384 nodes (W=6, K=4096) its scratch is 61.7 MB and the
heavily-unrolled Mosaic program takes >30 min to compile — the round-4
verdict's last "reference CPU wins" cell (CSparse does 16k in 1.36 s,
csparse.cpp via spa2d.cpp:505).

This module runs the SAME factorization (block cyclic reduction of the
RCM/supernode block-tridiagonal system — Cholesky under a nested-dissection
ordering, exact) as a PIPELINE of small lane-chunked Pallas kernels with
the level state living in HBM:

  * one level = eliminate the ODD supernodes, update the EVEN ones, then
    COMPACT survivors to contiguous lanes (jnp strided slices between
    kernels). Compaction keeps every level's neighbor stride at ±1 lane,
    so each kernel is 100% lane-local: odd elimination needs only its own
    lane's blocks; the even update reads its odd neighbors' elimination
    products through XLA pre-shifted inputs. No in-kernel cross-lane
    communication → kernels chunk freely over lanes and compile in
    seconds at ANY K.
  * assembly (graph → D/B/BT/r at the current poses, with damping and
    gauge rows) and the LM cost are the monolith kernel's math re-chunked:
    the a-major flat pose layout (lane f = a·K + k) reshaped to
    (rows, W, K) turns band-offset gathers into static sublane concats of
    the chunk and its XLA-pre-rolled k±1 neighbors.
  * the LM accept/reject loop (doSPA schedule, spa2d.cpp:425-609) is a
    device-resident lax.while_loop around the whole level pipeline — one
    launch train per solve, no host round trips.

Shares the host side (RCM ordering, supernode layout, slot packing) with
the monolith path: solver/banded.py. Numerics are the monolith's: f32
direct factorization — exact solve class, no CG iteration loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_slam.solver.banded import NBANKS, SLOT_ROWS


def _norm_angle(th):
    two_pi = 6.283185307179586
    return th - two_pi * jnp.floor((th + 3.141592653589793) / two_pi)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


CH = 6  # output-row chunk for streamed block matmuls (monolith's CH)


# --------------------------------------------------------------------------
# shared per-edge math (monolith edge_terms, re-chunked)
# --------------------------------------------------------------------------

def _edge_terms(slot_rows, p_lo, p_hi):
    """Residual/trig/Jacobian rows for one (bank, d) slot bank.

    slot_rows: list of 10 (1, W, C) rows [m0 m1 m2 W6[0..5] flip];
    p_lo/p_hi: (3, W, C) poses of the LOW/HIGH endpoint at each lane.
    Returns (W6, flip, c, s, drx, dry, r0, r1, r2) — all (1, W, C)."""
    m0, m1, m2 = slot_rows[0], slot_rows[1], slot_rows[2]
    W6 = slot_rows[3:9]
    flip = slot_rows[9]
    pa = p_lo + flip * (p_hi - p_lo)
    pb = p_hi + flip * (p_lo - p_hi)
    c = jnp.cos(pa[2:3])
    s = jnp.sin(pa[2:3])
    dx = pb[0:1] - pa[0:1]
    dy = pb[1:2] - pa[1:2]
    r0 = c * dx + s * dy - m0
    r1 = -s * dx + c * dy - m1
    r2 = _norm_angle(pb[2:3] - pa[2:3] - m2)
    drx = -s * dx + c * dy
    dry = -c * dx - s * dy
    return W6, flip, c, s, drx, dry, r0, r1, r2


def _jacobian_cols(flip, c, s, drx, dry):
    """JL/JH columns (low/high node Jacobians) as in the monolith."""
    z = jnp.zeros_like(c)
    g = 1.0 - 2.0 * flip
    gc_, gs_ = g * c, g * s
    u1, v1 = (1.0 - flip) * drx, (1.0 - flip) * dry
    u2, v2 = flip * drx, flip * dry
    JLc = [(-gc_, gs_, z), (-gs_, -gc_, z), (u1, v1, -g)]
    JHc = [(gc_, -gs_, z), (gs_, gc_, z), (u2, v2, g)]
    return JLc, JHc


def _JtW(col, W6):
    j0, j1, j2 = col
    return (
        j0 * W6[0] + j1 * W6[1] + j2 * W6[2],
        j0 * W6[1] + j1 * W6[3] + j2 * W6[4],
        j0 * W6[2] + j1 * W6[4] + j2 * W6[5],
    )


def _block9(JW, Jc):
    """(JᵀΩ)J as 9 stacked rows (9, W, C)."""
    return jnp.concatenate(
        [
            JW[a][0] * Jc[b][0] + JW[a][1] * Jc[b][1] + JW[a][2] * Jc[b][2]
            for a in range(3)
            for b in range(3)
        ],
        axis=0,
    )


def _gather_up(v, v_next, d):
    """(rows, W, C) value at band offset a → value at a+d (k+1 wrap via
    the pre-rolled neighbor chunk)."""
    if d == 0:
        return v
    W = v.shape[1]
    if d == W:  # Mosaic rejects zero-size slices
        return v_next
    return jnp.concatenate([v[:, d:, :], v_next[:, :d, :]], axis=1)


# --------------------------------------------------------------------------
# kernel: assembly (slots + poses → D/B/BT/r) with damping + gauge
# --------------------------------------------------------------------------

def _make_assemble_kernel(W: int, C: int):
    n = 3 * W
    SP = _pad8(n)

    def gather_down(v, v_prev, d):
        if d == 0:
            return v
        if d == W:  # Mosaic rejects zero-size slices
            return v_prev
        return jnp.concatenate(
            [v_prev[:, W - d:, :], v[:, : W - d, :]], axis=1
        )

    def kernel(
        pT_ref, pTn_ref, pTp_ref,        # (8, W, C) poses: self, k+1, k−1
        sl_ref, slp_ref,                 # (SR, W, C) slots: self, k−1
        lam_ref,                         # (1, 1)
        D_ref, B_ref, BT_ref, r_ref,     # out (n, SP, C), (SP, C)
    ):
        dt = pT_ref.dtype
        lam = lam_ref[0, 0]
        pT3 = pT_ref[0:3]
        pT3n = pTn_ref[0:3]
        pT3p = pTp_ref[0:3]
        D_ref[...] = jnp.zeros_like(D_ref)
        B_ref[...] = jnp.zeros_like(B_ref)
        BT_ref[...] = jnp.zeros_like(BT_ref)
        Hd9 = jnp.zeros((9, W, C), dt)
        b3 = jnp.zeros((3, W, C), dt)

        def slot_rows(src, bank, d):
            base = (bank * W + (d - 1)) * SLOT_ROWS
            return [src[base + i: base + i + 1] for i in range(SLOT_ROWS)]

        sl = sl_ref[...]
        slp = slp_ref[...]
        for bank in range(NBANKS):
            for d in range(1, W + 1):
                # LOW-side pass: this lane is the edge's low endpoint
                rows = slot_rows(sl, bank, d)
                hi = _gather_up(pT3, pT3n, d)
                W6, flip, c, s, drx, dry, r0, r1, r2 = _edge_terms(
                    rows, pT3, hi)
                JLc, JHc = _jacobian_cols(flip, c, s, drx, dry)
                JLW = [_JtW(cl, W6) for cl in JLc]
                HLL9 = _block9(JLW, JLc)
                HLH9 = _block9(JLW, JHc)
                bL3 = jnp.concatenate(
                    [JLW[a][0] * r0 + JLW[a][1] * r1 + JLW[a][2] * r2
                     for a in range(3)], axis=0)
                Hd9 = Hd9 + HLL9
                b3 = b3 + bL3

                # HIGH-side pass: this lane is the edge's high endpoint —
                # recomputed from down-gathered low-side inputs so every
                # write stays lane-local (no cross-chunk scatter)
                rows_d = [
                    gather_down(rw, slot_rows(slp, bank, d)[i], d)
                    for i, rw in enumerate(rows)
                ]
                lo_d = gather_down(pT3, pT3p, d)
                W6h, fliph, ch, sh, drxh, dryh, h0, h1, h2 = _edge_terms(
                    rows_d, lo_d, pT3)
                JLch, JHch = _jacobian_cols(fliph, ch, sh, drxh, dryh)
                JHWh = [_JtW(cl, W6h) for cl in JHch]
                HHH9 = _block9(JHWh, JHch)
                bH3 = jnp.concatenate(
                    [JHWh[a][0] * h0 + JHWh[a][1] * h1 + JHWh[a][2] * h2
                     for a in range(3)], axis=0)
                Hd9 = Hd9 + HHH9
                b3 = b3 + bH3

                # off-diagonal block (a, a+d): D if intra-supernode else B
                for a in range(W):
                    b_off = a + d
                    for u in range(3):
                        for v in range(3):
                            val = HLH9[3 * u + v:3 * u + v + 1, a, :]
                            if b_off < W:
                                i1, j1 = 3 * a + u, 3 * b_off + v
                                D_ref[pl.ds(i1, 1), j1:j1 + 1, :] += (
                                    val[None])
                                D_ref[pl.ds(j1, 1), i1:i1 + 1, :] += (
                                    val[None])
                            else:
                                b2 = b_off - W
                                i1, j1 = 3 * a + u, 3 * b2 + v
                                B_ref[pl.ds(i1, 1), j1:j1 + 1, :] += (
                                    val[None])
                                BT_ref[pl.ds(j1, 1), i1:i1 + 1, :] += (
                                    val[None])

        # diagonal blocks + damping (setupSys: jitter, *(1+lambda))
        one_lam = 1.0 + lam
        for a in range(W):
            for u in range(3):
                for v in range(3):
                    val = Hd9[3 * u + v:3 * u + v + 1, a, :]
                    if u == v:
                        val = (val + 1e-12) * one_lam
                    D_ref[pl.ds(3 * a + u, 1),
                          3 * a + v:3 * a + v + 1, :] += val[None]

        # gauge + padding: zero rows/cols of non-free, identity diag
        fm = pT_ref[3:4]  # (1, W, C)
        fmS = jnp.concatenate(
            [fm[:, a, :] for a in range(W) for _ in range(3)]
            + ([jnp.zeros((SP - n, C), dt)] if SP > n else []),
            axis=0)  # (SP, C)
        fm_n = pTn_ref[3:4]
        fmS_next = jnp.concatenate(
            [fm_n[:, a, :] for a in range(W) for _ in range(3)]
            + ([jnp.zeros((SP - n, C), dt)] if SP > n else []),
            axis=0)

        def row_of(ref, j):
            v = ref[pl.ds(j, 1)]
            return v.reshape(v.shape[1], v.shape[2])

        for i in range(n):
            fi = fmS[i:i + 1, :]
            fin = fmS_next[i:i + 1, :]
            di = row_of(D_ref, i) * fi * fmS
            D_ref[pl.ds(i, 1)] = di[None]
            D_ref[pl.ds(i, 1), i:i + 1, :] += (1.0 - fi)[None]
            B_ref[pl.ds(i, 1)] = (row_of(B_ref, i) * fi * fmS_next)[None]
            BT_ref[pl.ds(i, 1)] = (row_of(BT_ref, i) * fin * fmS)[None]
            r_ref[i:i + 1, :] = -b3[i % 3:i % 3 + 1, i // 3, :] * fi
        if SP > n:
            r_ref[n:SP, :] = jnp.zeros((SP - n, C), dt)

    return kernel


def _make_cost_kernel(W: int, C: int):
    def kernel(pT_ref, pTn_ref, sl_ref, out_ref):
        pT3 = pT_ref[0:3]
        pT3n = pTn_ref[0:3]
        acc = jnp.zeros((1, C), pT_ref.dtype)

        def slot_rows(src, bank, d):
            base = (bank * W + (d - 1)) * SLOT_ROWS
            return [src[base + i: base + i + 1] for i in range(SLOT_ROWS)]

        sl = sl_ref[...]
        for bank in range(NBANKS):
            for d in range(1, W + 1):
                rows = slot_rows(sl, bank, d)
                hi = _gather_up(pT3, pT3n, d)
                W6, _f, _c, _s, _dx, _dy, r0, r1, r2 = _edge_terms(
                    rows, pT3, hi)
                q = (
                    W6[0] * r0 * r0 + 2 * W6[1] * r0 * r1
                    + 2 * W6[2] * r0 * r2 + W6[3] * r1 * r1
                    + 2 * W6[4] * r1 * r2 + W6[5] * r2 * r2
                )  # (1, W, C)
                acc = acc + jnp.sum(q, axis=1)
        out_ref[...] = acc

    return kernel


# --------------------------------------------------------------------------
# kernels: per-level block algebra (all lane-local)
# --------------------------------------------------------------------------

def _row_of(ref, j):
    v = ref[pl.ds(j, 1)]
    return v.reshape(v.shape[1], v.shape[2])


def _make_elim_kernel(n: int, C: int):
    """Per lane: U = chol(D); [X1|X2|Xr] = D⁻¹ [BLTᵀ-slot | B | r]."""
    SP = _pad8(n)
    XCP = _pad8(2 * n + 1)

    def kernel(D_ref, BLT_ref, B_ref, r_ref,
               X1_ref, X2_ref, Xr_ref, U_ref, Y_ref):
        dt = D_ref.dtype
        iota_sp = jax.lax.broadcasted_iota(jnp.int32, (SP, 1), 0)
        i3l = jax.lax.broadcasted_iota(jnp.int32, (n, SP, 1), 0)
        i3s = jax.lax.broadcasted_iota(jnp.int32, (n, SP, 1), 1)
        iYl = jax.lax.broadcasted_iota(jnp.int32, (n, XCP, 1), 0)

        def extract(row, p):
            return jnp.sum(
                jnp.where(iota_sp == p, row, 0.0), axis=0, keepdims=True)

        def lead_extract(row):
            rows = [
                jnp.sum(jnp.where(iota_sp == i, row, 0.0), axis=0,
                        keepdims=True)
                for i in range(n)
            ]
            return jnp.concatenate(rows, axis=0)[:, None, :]

        U_ref[...] = D_ref[...]
        Y_ref[...] = jnp.zeros_like(Y_ref)  # pad cols must not carry junk

        def chol_body(p, _):
            up = _row_of(U_ref, p)
            piv = extract(up, p)
            inv_s = jax.lax.rsqrt(jnp.maximum(piv, 1e-30))
            up_s = up * inv_s
            U_ref[pl.ds(p, 1)] = up_s[None]
            upl = lead_extract(up_s)
            upd = upl * up_s[None, :, :]
            m = (i3l > p) & (i3s > p)
            U_ref[...] = U_ref[...] - jnp.where(m, upd, 0.0)
            return 0

        jax.lax.fori_loop(0, n, chol_body, 0)

        # multi-RHS [BLT | B | r]
        for i in range(n):
            Y_ref[pl.ds(i, 1), 0:n, :] = _row_of(BLT_ref, i)[0:n, :][None]
            Y_ref[pl.ds(i, 1), n:2 * n, :] = _row_of(B_ref, i)[0:n, :][None]
            Y_ref[pl.ds(i, 1), 2 * n:2 * n + 1, :] = (
                r_ref[i:i + 1, :][None])

        def fwd(p, _):
            up = _row_of(U_ref, p)
            piv = extract(up, p)
            invp = 1.0 / jnp.maximum(piv, 1e-30)
            yp = _row_of(Y_ref, p) * invp
            Y_ref[pl.ds(p, 1)] = yp[None]
            upl = lead_extract(up)
            m = iYl > p
            Y_ref[...] = Y_ref[...] - jnp.where(
                m, upl * yp[None, :, :], 0.0)
            return 0

        jax.lax.fori_loop(0, n, fwd, 0)

        def bwd(q, _):
            p = n - 1 - q
            up = _row_of(U_ref, p)
            piv = extract(up, p)
            invp = 1.0 / jnp.maximum(piv, 1e-30)
            xp = _row_of(Y_ref, p) * invp
            Y_ref[pl.ds(p, 1)] = xp[None]
            rows = [
                jnp.sum(jnp.where(iota_sp == p, _row_of(U_ref, i), 0.0),
                        axis=0, keepdims=True)
                for i in range(n)
            ]
            colp = jnp.concatenate(rows, axis=0)[:, None, :]
            m = iYl < p
            Y_ref[...] = Y_ref[...] - jnp.where(
                m, colp * xp[None, :, :], 0.0)
            return 0

        jax.lax.fori_loop(0, n, bwd, 0)

        zpad = jnp.zeros((1, SP - n, C), dt) if SP > n else None
        for i in range(n):
            yi = _row_of(Y_ref, i)
            x1 = yi[0:n, :][None]
            x2 = yi[n:2 * n, :][None]
            if zpad is not None:
                x1 = jnp.concatenate([x1, zpad], axis=1)
                x2 = jnp.concatenate([x2, zpad], axis=1)
            X1_ref[pl.ds(i, 1)] = x1
            X2_ref[pl.ds(i, 1)] = x2
            Xr_ref[i:i + 1, :] = yi[2 * n:2 * n + 1, :]
        if SP > n:
            Xr_ref[n:SP, :] = jnp.zeros((SP - n, C), dt)

    return kernel


def _make_update_kernel(n: int, C: int):
    """Even-lane update: D' = D − Bₑ X1 − Bₑ₋₁ᵀ X2ˡ;  B' = −Bₑ X2;
    r' = r − Bₑ Xr − Bₑ₋₁ᵀ Xrˡ. All products via P-row streaming
    (C[i,m] = Σⱼ P[j,i]·Q[j,m]): P = BTe for Bₑ·(…), P = Bl for Bₑ₋₁ᵀ·(…)."""
    SP = _pad8(n)

    def kernel(D_ref, BTe_ref, Bl_ref, r_ref,
               X1_ref, X2_ref, Xr_ref, X2l_ref, Xrl_ref,
               Do_ref, Bo_ref, ro_ref):
        dt = D_ref.dtype
        iota_sp = jax.lax.broadcasted_iota(jnp.int32, (SP, 1), 0)

        def extract(row, p):
            return jnp.sum(
                jnp.where(iota_sp == p, row, 0.0), axis=0, keepdims=True)

        def mm_into(p_ref, q_ref, out_ref, base_ref, sign):
            """out = base + sign · Σⱼ p_row(j) ⊗ q_row(j), streamed in CH
            output-row chunks."""
            for g in range(-(-n // CH)):
                h0 = g * CH
                h1 = min(h0 + CH, n)

                def body(j, acc):
                    pj = _row_of(p_ref, j)[h0:h1, :]
                    qj = _row_of(q_ref, j)
                    return acc + pj[:, None, :] * qj[None, :, :]

                Cg = jax.lax.fori_loop(
                    0, n, body, jnp.zeros((h1 - h0, SP, C), dt))
                cur = base_ref[pl.ds(h0, h1 - h0)]
                out_ref[pl.ds(h0, h1 - h0)] = cur + sign * Cg

        # D' = D − Bₑ X1 − Bₑ₋₁ᵀ X2l (two P-row streamed products)
        mm_into(BTe_ref, X1_ref, Do_ref, D_ref, -1.0)
        mm_into(Bl_ref, X2l_ref, Do_ref, Do_ref, -1.0)
        # B' = −BTe-stream X2   (write into zeroed base)
        for g in range(-(-n // CH)):
            h0 = g * CH
            h1 = min(h0 + CH, n)

            def body(j, acc):
                pj = _row_of(BTe_ref, j)[h0:h1, :]
                qj = _row_of(X2_ref, j)
                return acc + pj[:, None, :] * qj[None, :, :]

            Cg = jax.lax.fori_loop(
                0, n, body, jnp.zeros((h1 - h0, SP, C), dt))
            Bo_ref[pl.ds(h0, h1 - h0)] = -Cg

        # r' = r − Σⱼ BTe[j]·Xr[j] − Σⱼ Bl[j]·Xrl[j]
        acc = jnp.zeros((SP, C), dt)
        for j in range(n):
            acc = acc + _row_of(BTe_ref, j) * extract(Xr_ref[...], j)
            acc = acc + _row_of(Bl_ref, j) * extract(Xrl_ref[...], j)
        ro_ref[...] = r_ref[...] - acc

    return kernel


def _make_backsub_kernel(n: int, C: int):
    """x_odd = Xr − X1·xˡ − X2·xʳ (per-lane matvecs by sublane reduce)."""
    SP = _pad8(n)

    def kernel(X1_ref, X2_ref, Xr_ref, xl_ref, xr_ref, x_ref):
        dt = X1_ref.dtype
        xl = xl_ref[...]
        xr = xr_ref[...]
        for i in range(n):
            v1 = jnp.sum(_row_of(X1_ref, i) * xl, axis=0, keepdims=True)
            v2 = jnp.sum(_row_of(X2_ref, i) * xr, axis=0, keepdims=True)
            x_ref[i:i + 1, :] = Xr_ref[i:i + 1, :] - v1 - v2
        if SP > n:
            x_ref[n:SP, :] = jnp.zeros((SP - n, C), dt)

    return kernel


# --------------------------------------------------------------------------
# XLA orchestration
# --------------------------------------------------------------------------

def _chunked_call(kernel, block_rows_list, out_rows_list, K, C,
                  interpret, scratch=None, dtype=jnp.float32):
    """pallas_call helper: every operand is (rows, ..., K) chunked on the
    last (lane) dim into C-wide blocks."""

    def spec(shape_rows):
        nd = len(shape_rows)
        blk = tuple(shape_rows) + (C,)
        idx = (lambda b: (0, b)) if nd == 1 else (lambda b: (0, 0, b))
        return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(K // C,),
        in_specs=[spec(r) for r in block_rows_list],
        out_specs=[spec(r) for r in out_rows_list],
        out_shape=[
            jax.ShapeDtypeStruct(tuple(r) + (K,), dtype)
            for r in out_rows_list
        ],
        scratch_shapes=scratch or [],
        interpret=interpret,
    )


def _shift_right(x):
    """Lane shift by +1 with zero fill (left-neighbor alignment)."""
    z = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    return jnp.concatenate([z, x[..., :-1]], axis=-1)


def _shift_left(x):
    z = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    return jnp.concatenate([x[..., 1:], z], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("W", "K", "iters", "sq_min_delta", "interpret"),
)
def streamed_cr_lm(
    pT8,        # (8, W*K) rows 0..2 poses flat (a-major), row 3 free mask
    slots,      # (NBANKS*W*SLOT_ROWS, W*K)
    lam0,
    W: int, K: int, iters: int, sq_min_delta: float,
    interpret: bool = False,
):
    """Same contract as pallas_cr_lm.fused_cr_lm — packed (8, W*K) result:
    rows 0..2 solved posesT (flat layout), row 3 lanes 0..3 =
    (cost0, cost, good, iters)."""
    n = 3 * W
    SP = _pad8(n)
    XC = 2 * n + 1
    XCP = _pad8(XC)
    dt = jnp.float32
    SR = NBANKS * W * SLOT_ROWS
    CA = min(K, 512)          # assembly/cost chunk (lanes = supernodes)
    levels = K.bit_length() - 1

    slotsR = slots.reshape(SR, W, K)
    slotsRp = jnp.roll(slotsR, 1, axis=2)
    fm_flat = pT8[3:4]  # (1, WK)

    def reshape_pT(pT3):
        pTR = jnp.concatenate([pT3, fm_flat], axis=0).reshape(4, W, K)
        return pTR

    def assemble(pT3, lam):
        pTR = reshape_pT(pT3)
        pTRn = jnp.roll(pTR, -1, axis=2)
        pTRp = jnp.roll(pTR, 1, axis=2)
        lam_arr = jnp.full((1, 1), lam, dt)
        kern = _make_assemble_kernel(W, CA)

        def spec3(rows, cols):
            return pl.BlockSpec(
                (rows, cols, CA), lambda b: (0, 0, b),
                memory_space=pltpu.VMEM)

        D, B, BT, r = pl.pallas_call(
            kern,
            grid=(K // CA,),
            in_specs=[
                spec3(4, W), spec3(4, W), spec3(4, W),
                spec3(SR, W), spec3(SR, W),
                pl.BlockSpec((1, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                spec3(n, SP), spec3(n, SP), spec3(n, SP),
                pl.BlockSpec((SP, CA), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, SP, K), dt),
                jax.ShapeDtypeStruct((n, SP, K), dt),
                jax.ShapeDtypeStruct((n, SP, K), dt),
                jax.ShapeDtypeStruct((SP, K), dt),
            ],
            interpret=interpret,
        )(pTR, pTRn, pTRp, slotsR, slotsRp, lam_arr)
        return D, B, BT, r

    def cost_of(pT3):
        pTR = reshape_pT(pT3)
        pTRn = jnp.roll(pTR, -1, axis=2)
        kern = _make_cost_kernel(W, CA)

        def spec3(rows, cols):
            return pl.BlockSpec(
                (rows, cols, CA), lambda b: (0, 0, b),
                memory_space=pltpu.VMEM)

        parts = pl.pallas_call(
            kern,
            grid=(K // CA,),
            in_specs=[spec3(4, W), spec3(4, W), spec3(SR, W)],
            out_specs=pl.BlockSpec((1, CA), lambda b: (0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, K), dt),
            interpret=interpret,
        )(pTR, pTRn, slotsR)
        return jnp.sum(parts)

    def elim(Do, BLTo, Bo, ro):
        Ko = Do.shape[-1]
        C = min(Ko, 256)
        kern = _make_elim_kernel(n, C)
        X1, X2, Xr = _chunked_call(
            kern,
            [(n, SP), (n, SP), (n, SP), (SP,)],
            [(n, SP), (n, SP), (SP,)],
            Ko, C, interpret,
            scratch=[
                pltpu.VMEM((n, SP, C), dt),
                pltpu.VMEM((n, XCP, C), dt),
            ],
        )(Do, BLTo, Bo, ro)
        return X1, X2, Xr

    def update(De, BTe, Bl, re, X1, X2, Xr, X2l, Xrl):
        Ke = De.shape[-1]
        C = min(Ke, 256)
        kern = _make_update_kernel(n, C)
        Dn, Bn, rn = _chunked_call(
            kern,
            [(n, SP), (n, SP), (n, SP), (SP,),
             (n, SP), (n, SP), (SP,), (n, SP), (SP,)],
            [(n, SP), (n, SP), (SP,)],
            Ke, C, interpret,
        )(De, BTe, Bl, re, X1, X2, Xr, X2l, Xrl)
        return Dn, Bn, rn

    def backsub(X1, X2, Xr, xl, xr):
        Ko = X1.shape[-1]
        C = min(Ko, 256)
        kern = _make_backsub_kernel(n, C)
        (x,) = _chunked_call(
            kern,
            [(n, SP), (n, SP), (SP,), (SP,), (SP,)],
            [(SP,)],
            Ko, C, interpret,
        )(X1, X2, Xr, xl, xr)
        return x

    def block_T(Bn):
        """(n, SP, Kc) block transpose of the leading n×n block."""
        t = jnp.swapaxes(Bn[:, 0:n, :], 0, 1)  # (n, n, Kc)
        if SP > n:
            t = jnp.concatenate(
                [t, jnp.zeros((n, SP - n, t.shape[-1]), dt)], axis=1)
        return t

    def cr_solve(D, B, BT, r):
        stores = []
        for _ in range(levels):
            Do = D[..., 1::2]
            Bo = B[..., 1::2]
            ro = r[..., 1::2]
            BLTo = BT[..., 0::2]
            X1, X2, Xr = elim(Do, BLTo, Bo, ro)
            De = D[..., 0::2]
            Be = B[..., 0::2]
            BTe = BT[..., 0::2]
            re = r[..., 0::2]
            Bl = _shift_right(B[..., 1::2])
            X2l = _shift_right(X2)
            Xrl = _shift_right(Xr)
            Dn, Bn, rn = update(De, BTe, Bl, re, X1, X2, Xr, X2l, Xrl)
            Bn = Bn.at[..., -1].set(0.0)  # no coupling past the last lane
            stores.append((X1, X2, Xr))
            D, B, BT, r = Dn, Bn, block_T(Bn), rn
        # top lane: x = D⁻¹ r (reuse elim with zero couplings)
        z = jnp.zeros_like(D)
        _x1, _x2, x = elim(D, z, z, r)
        for X1, X2, Xr in reversed(stores):
            xl = x
            xr = _shift_left(x)
            xo = backsub(X1, X2, Xr, xl, xr)
            Kc2 = x.shape[-1] * 2
            x = jnp.stack([x, xo], axis=-1).reshape(SP, Kc2)
        return x

    def delta_flat(x):
        # (SP, K) supernode rows → (3, WK) a-major flat
        rows = []
        for u in range(3):
            rows.append(jnp.concatenate(
                [x[3 * a + u:3 * a + u + 1, :] for a in range(W)],
                axis=-1))
        return jnp.concatenate(rows, axis=0)

    p0 = pT8[0:3]
    cost0 = cost_of(p0)

    def lm_body(carry):
        pT3, lam, laminc, cost, it, good, _done = carry
        D, B, BT, r = assemble(pT3, lam)
        x = cr_solve(D, B, BT, r)
        delta = delta_flat(x) * fm_flat
        sq = jnp.sum(delta * delta)
        converged = (sq < sq_min_delta).astype(dt)
        cand = pT3 + delta
        cand = jnp.concatenate(
            [cand[0:2, :], _norm_angle(cand[2:3, :])], axis=0)
        new_cost = cost_of(cand)
        accept = ((new_cost < cost).astype(dt)) * (1.0 - converged)
        pT3 = accept * cand + (1.0 - accept) * pT3
        cost = accept * new_cost + (1.0 - accept) * cost
        lam = accept * lam * 0.5 + (1.0 - accept) * lam * laminc
        laminc = accept * laminc + (1.0 - accept) * laminc * 2.0
        return (pT3, lam, laminc, cost, it + 1.0, good + accept, converged)

    def lm_cond(carry):
        _p, _l, _li, _c, it, _g, done = carry
        return (it < iters) & (done < 0.5)

    pT3, _lam, _li, cost, it, good, _d = jax.lax.while_loop(
        lm_cond, lm_body,
        (p0, jnp.asarray(lam0, dt), jnp.asarray(2.0, dt), cost0,
         jnp.asarray(0.0, dt), jnp.asarray(0.0, dt), jnp.asarray(0.0, dt)),
    )
    WK = W * K
    laneW = jax.lax.broadcasted_iota(jnp.int32, (1, WK), 1)
    stats = (
        jnp.where(laneW == 0, cost0, 0.0)
        + jnp.where(laneW == 1, cost, 0.0)
        + jnp.where(laneW == 2, good, 0.0)
        + jnp.where(laneW == 3, it, 0.0)
    )
    return jnp.concatenate(
        [pT3, stats, jnp.zeros((4, WK), dt)], axis=0)


def streamed_applicable(W: int, K: int) -> bool:
    """The streamed path accepts any pow2 K ≥ 128 the monolith rejects."""
    return (K & (K - 1)) == 0 and K >= 128
