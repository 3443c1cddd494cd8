"""The ENTIRE doSPA LM loop with a DIRECT factorization, as ONE Pallas
TPU kernel.

The reference back-end solves its normal equations with a direct sparse
Cholesky (`spa2d.cpp:505` csp.doChol -> `csparse.cpp` cs_cholsol). The
fused CG kernel (solver/pallas_lm.py) beat the XLA-loop latency wall but
still lost to the reference CPU on its home turf (small near-chain
graphs), fell off its O(M*E) one-hot VMEM cap above ~1.6k nodes, and its
f32 CG under-converged at 4k+ (round-3 BENCHMARKS). This kernel replaces
the inner CG with an EXACT solve:

  * Host side (solver/banded.py): an RCM ordering folds the graph into a
    block-banded matrix, W consecutive nodes -> one supernode, so the
    system is block TRIDIAGONAL in (3W x 3W) blocks. Measured W=6 for
    the ring benchmark at 1024..16384 nodes, W=4 for karto missions.
  * Assembly: the "offset-major" flat layout (lane f = a*K + k for chain
    position p = k*W + a) turns every band-edge gather/scatter into two
    static lane rolls and supernode block extraction into static slices.
    NO one-hot maps -> no M*E VMEM cap. Edge slots are dense per
    (bank, offset) rows; duplicate node-pair constraints use bank 1.
  * Solve: block CYCLIC REDUCTION - log2(K) odd-even elimination levels,
    each data-parallel across all supernodes (lanes). This is Cholesky
    under a nested-dissection ordering: exact, zero fill beyond the
    tracked blocks, stable for the SPD damped system. Each supernode is
    eliminated at exactly one level, so ONE shared store holds its
    X = D^-1 [B_prev^T | B_own | r] for the back-substitution sweep.
  * Block algebra runs in a 3D (block-row, block-col, supernode-lane)
    layout: matmuls stream contraction-leading rows (C += P[j] outer
    Q[j]), Cholesky / triangular solves extract pivot rows/columns by
    masked sublane reductions, neighbor access is a dynamic lane roll by
    the level stride. The Cholesky runs IN PLACE on D masked to the
    lanes being eliminated, so no separate factor buffer is needed.

Numerics: the f32 direct LM was prototyped against f64 on the 16384-node
ring benchmark and reaches the same optimum (final f64-evaluated cost
3.6e-4 vs f64's 6.3e-3) - the exact factorization removes the f32-CG
conjugacy-loss cliff entirely. The kernel is golden-tested in interpret
mode against solver/banded.py's numpy oracle and the XLA dense path.
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


def _rsum(x):
    return jnp.sum(jnp.sum(x, axis=1, keepdims=True), axis=0, keepdims=True)


def _make_kernel(W: int, K: int, iters: int, sq_min_delta: float):
    n = 3 * W
    SP = -(-n // 8) * 8          # sublane-padded block width
    XC = 2 * n + 1               # X columns: [B_prev^T | B_own | r]
    WK = W * K
    levels = K.bit_length() - 1  # K is a power of two
    dt = jnp.float32
    CH = 6                       # output-row chunk for streamed matmuls

    def kernel(
        pT_ref,      # (8, WK) rows 0..2 poses (flat layout), row 3 free
        slots_ref,   # (NBANKS*W*SLOT_ROWS, WK)
        lam_ref,     # (1, 1)
        out_ref,     # (8, WK) rows 0..2 poses, row 3 stats lanes 0..3
        D_ref,       # (n, SP, K) diag blocks / in-place chol at masked
        B_ref,       # (n, SP, K) coupling block(k, k + level stride)
        BT_ref,      # (n, SP, K) its transpose (kept in sync)
        Y_ref,       # (n, XC, K) multi-RHS tri-solve workspace / staging
        X1_ref,      # (n, n, K) stored D^-1 B_prev^T per eliminated node
        X2_ref,      # (n, n, K) stored D^-1 B_own
        Xr_ref,      # (SP, K)   stored D^-1 r
        r_ref,       # (SP, K)
        x_ref,       # (SP, K)
    ):
        iota_wk = jax.lax.broadcasted_iota(jnp.int32, (1, WK), 1)
        iota_sp = jax.lax.broadcasted_iota(jnp.int32, (SP, 1), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        i3l = jax.lax.broadcasted_iota(jnp.int32, (n, SP, 1), 0)
        i3s = jax.lax.broadcasted_iota(jnp.int32, (n, SP, 1), 1)
        iYl = jax.lax.broadcasted_iota(jnp.int32, (n, XC, 1), 0)
        fm_flat = pT_ref[3:4, :]                   # (1, WK)
        fm_rows = [fm_flat[:, a * K:(a + 1) * K] for a in range(W)]

        def gather_hi(v3, d):
            """v3 (rows, WK) at lane f=aK+k -> value at chain pos p+d."""
            c_in = d * K          # in-supernode region source offset
            c_wr = d * K - W * K + 1  # wrap into supernode k+1
            ra = pltpu.roll(v3, (-c_in) % WK, 1)
            rb = pltpu.roll(v3, (-c_wr) % WK, 1)
            return jnp.where(iota_wk < (W - d) * K, ra, rb)

        def scatter_hi(v3, d):
            """adjoint of gather_hi: rows computed at the LOW lane land
            at the HIGH node's lane (zeros elsewhere)."""
            c_in = d * K
            c_wr = d * K - W * K + 1
            ra = pltpu.roll(v3, c_in % WK, 1)
            rb = pltpu.roll(v3, c_wr % WK, 1)
            return (
                jnp.where(iota_wk >= d * K, ra, 0.0)
                + jnp.where(iota_wk < d * K, rb, 0.0)
            )

        def edge_terms(pT3, bank, d):
            base = (bank * W + (d - 1)) * SLOT_ROWS
            m0 = slots_ref[base:base + 1, :]
            m1 = slots_ref[base + 1:base + 2, :]
            m2 = slots_ref[base + 2:base + 3, :]
            W6 = [slots_ref[base + 3 + i:base + 4 + i, :] for i in range(6)]
            flip = slots_ref[base + 9:base + 10, :]
            hi = gather_hi(pT3, d)
            pa = pT3 + flip * (hi - pT3)
            pb = hi + flip * (pT3 - hi)
            c = jnp.cos(pa[2:3, :])
            s = jnp.sin(pa[2:3, :])
            dx = pb[0:1, :] - pa[0:1, :]
            dy = pb[1:2, :] - pa[1:2, :]
            r0 = c * dx + s * dy - m0
            r1 = -s * dx + c * dy - m1
            r2 = _norm_angle(pb[2:3, :] - pa[2:3, :] - m2)
            drx = -s * dx + c * dy
            dry = -c * dx - s * dy
            return W6, flip, c, s, drx, dry, r0, r1, r2

        def cost_of(pT3):
            acc = jnp.zeros((1, 1), dt)
            for bank in range(NBANKS):
                for d in range(1, W + 1):
                    W6, _f, _c, _s, _dx, _dy, r0, r1, r2 = edge_terms(
                        pT3, bank, d)
                    q = (
                        W6[0] * r0 * r0 + 2 * W6[1] * r0 * r1
                        + 2 * W6[2] * r0 * r2 + W6[3] * r1 * r1
                        + 2 * W6[4] * r1 * r2 + W6[5] * r2 * r2
                    )
                    acc = acc + _rsum(q)
            return acc  # (1, 1)

        def assemble(pT3, lam):
            """Build D/B/BT/r from the graph at pT3 with damping lam."""
            D_ref[...] = jnp.zeros((n, SP, K), dt)
            B_ref[...] = jnp.zeros((n, SP, K), dt)
            BT_ref[...] = jnp.zeros((n, SP, K), dt)
            Hd9 = jnp.zeros((9, WK), dt)
            b3 = jnp.zeros((3, WK), dt)
            for bank in range(NBANKS):
                for d in range(1, W + 1):
                    W6, flip, c, s, drx, dry, r0, r1, r2 = edge_terms(
                        pT3, bank, d)
                    z = jnp.zeros_like(c)
                    # JL/JH = Jacobian wrt the LOW/HIGH node; with
                    # g = 1-2*flip they are sign/zero selections of the
                    # standard Ja/Jb forms (edge_jacobians semantics)
                    g = 1.0 - 2.0 * flip
                    gc_, gs_ = g * c, g * s
                    u1, v1 = (1.0 - flip) * drx, (1.0 - flip) * dry
                    u2, v2 = flip * drx, flip * dry
                    JLc = [(-gc_, gs_, z), (-gs_, -gc_, z), (u1, v1, -g)]
                    JHc = [(gc_, -gs_, z), (gs_, gc_, z), (u2, v2, g)]

                    def JtW(col):
                        j0, j1, j2 = col
                        return (
                            j0 * W6[0] + j1 * W6[1] + j2 * W6[2],
                            j0 * W6[1] + j1 * W6[3] + j2 * W6[4],
                            j0 * W6[2] + j1 * W6[4] + j2 * W6[5],
                        )

                    JLW = [JtW(cl) for cl in JLc]
                    JHW = [JtW(cl) for cl in JHc]

                    def block(JW, Jc):
                        return jnp.concatenate(
                            [
                                JW[a][0] * Jc[b][0] + JW[a][1] * Jc[b][1]
                                + JW[a][2] * Jc[b][2]
                                for a in range(3)
                                for b in range(3)
                            ],
                            axis=0,
                        )  # (9, WK)

                    HLL9 = block(JLW, JLc)
                    HHH9 = block(JHW, JHc)
                    HLH9 = block(JLW, JHc)
                    bL3 = jnp.concatenate(
                        [JLW[a][0] * r0 + JLW[a][1] * r1 + JLW[a][2] * r2
                         for a in range(3)], axis=0)
                    bH3 = jnp.concatenate(
                        [JHW[a][0] * r0 + JHW[a][1] * r1 + JHW[a][2] * r2
                         for a in range(3)], axis=0)
                    Hd9 = Hd9 + HLL9 + scatter_hi(HHH9, d)
                    b3 = b3 + bL3 + scatter_hi(bH3, d)
                    # off-diagonal block (a, a+d), per supernode offset a
                    for a in range(W):
                        lo_sl = slice(a * K, (a + 1) * K)
                        b_off = a + d
                        for u in range(3):
                            for v in range(3):
                                val = HLH9[3 * u + v:3 * u + v + 1, lo_sl]
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
                lo_sl = slice(a * K, (a + 1) * K)
                for u in range(3):
                    for v in range(3):
                        val = Hd9[3 * u + v:3 * u + v + 1, lo_sl]
                        if u == v:
                            val = (val + 1e-12) * one_lam
                        D_ref[pl.ds(3 * a + u, 1),
                              3 * a + v:3 * a + v + 1, :] += val[None]
            # gauge + padding: zero rows/cols of non-free, identity diag
            fmS = jnp.concatenate(
                [fm_rows[a] for a in range(W) for _ in range(3)]
                + ([jnp.zeros((SP - n, K), dt)] if SP > n else []),
                axis=0)  # (SP, K)
            fmS_next = pltpu.roll(fmS, K - 1, 1)  # next supernode's fm
            for i in range(n):
                fi = fmS[i:i + 1, :]  # (1, K), offset-0 layout
                fin = fmS_next[i:i + 1, :]
                di = row_of(D_ref, i) * fi * fmS
                D_ref[pl.ds(i, 1)] = di[None]
                D_ref[pl.ds(i, 1), i:i + 1, :] += (1.0 - fi)[None]
                B_ref[pl.ds(i, 1)] = (
                    row_of(B_ref, i) * fi * fmS_next)[None]
                BT_ref[pl.ds(i, 1)] = (
                    row_of(BT_ref, i) * fin * fmS)[None]
                r_ref[i:i + 1, :] = -b3[i % 3:i % 3 + 1,
                                        (i // 3) * K:(i // 3 + 1) * K] * fi
            if SP > n:
                r_ref[n:SP, :] = jnp.zeros((SP - n, K), dt)

        # --- block-algebra helpers (all lanes compute; masks gate writes)
        def row_of(ref, j):
            v = ref[pl.ds(j, 1)]  # (1, cols, K)
            return v.reshape(v.shape[1], v.shape[2])

        def extract(row, p):
            """(SP, K) row -> its entry at sublane p, as (1, K)."""
            return jnp.sum(
                jnp.where(iota_sp == p, row, 0.0), axis=0, keepdims=True)

        def lead_extract(row):
            """(SP, K) -> (n, 1, K): sublane-indexed -> leading-indexed."""
            rows = [
                jnp.sum(jnp.where(iota_sp == i, row, 0.0), axis=0,
                        keepdims=True)
                for i in range(n)
            ]
            return jnp.concatenate(rows, axis=0)[:, None, :]

        def chol_masked(wm):
            """In-place Cholesky of D at lanes where wm (1, K) is 1: D's
            rows become the upper factor U there; other lanes keep D."""

            def body(p, _):
                up = row_of(D_ref, p)
                piv = extract(up, p)
                inv_s = jax.lax.rsqrt(jnp.maximum(piv, 1e-30))
                up_s = up * inv_s
                D_ref[pl.ds(p, 1)] = jnp.where(wm > 0.5, up_s, up)[None]
                upl = lead_extract(up_s)
                upd = upl * up_s[None, :, :]
                m = (i3l > p) & (i3s > p) & (wm[None, :, :] > 0.5)
                D_ref[...] = D_ref[...] - jnp.where(m, upd, 0.0)
                return 0

            jax.lax.fori_loop(0, n, body, 0)

        def trisolve_masked(wm):
            """Y <- D^-1 Y at masked lanes, via the in-place factor rows
            held in D there (U^T forward then U backward)."""

            def fwd(p, _):
                up = row_of(D_ref, p)
                piv = extract(up, p)
                invp = 1.0 / jnp.maximum(piv, 1e-30)
                yp0 = row_of(Y_ref, p)
                yp = yp0 * invp
                Y_ref[pl.ds(p, 1)] = jnp.where(wm > 0.5, yp, yp0)[None]
                upl = lead_extract(up)
                m = (iYl > p) & (wm[None, :, :] > 0.5)
                Y_ref[...] = Y_ref[...] - jnp.where(
                    m, upl * yp[None, :, :], 0.0)
                return 0

            jax.lax.fori_loop(0, n, fwd, 0)

            def bwd(q, _):
                p = n - 1 - q
                up = row_of(D_ref, p)
                piv = extract(up, p)
                invp = 1.0 / jnp.maximum(piv, 1e-30)
                xp0 = row_of(Y_ref, p)
                xp = xp0 * invp
                Y_ref[pl.ds(p, 1)] = jnp.where(wm > 0.5, xp, xp0)[None]
                rows = [
                    jnp.sum(jnp.where(iota_sp == p, row_of(D_ref, i), 0.0),
                            axis=0, keepdims=True)
                    for i in range(n)
                ]
                colp = jnp.concatenate(rows, axis=0)[:, None, :]
                m = (iYl < p) & (wm[None, :, :] > 0.5)
                Y_ref[...] = Y_ref[...] - jnp.where(
                    m, colp * xp[None, :, :], 0.0)
                return 0

            jax.lax.fori_loop(0, n, bwd, 0)

        def mm(p_row, q_row, update):
            """C[i, m] = sum_j p_row(j)[i] * q_row(j)[m], streamed in
            chunks of CH output rows; update(h0, h1, Cg) consumes them."""
            for g in range(-(-n // CH)):
                h0 = g * CH
                h1 = min(h0 + CH, n)

                def body(j, acc):
                    pj = p_row(j)[h0:h1, :]
                    qj = q_row(j)
                    return acc + pj[:, None, :] * qj[None, :, :]

                Cg = jax.lax.fori_loop(
                    0, n, body, jnp.zeros((h1 - h0, n, K), dt))
                update(h0, h1, Cg)

        def xr_rows():
            return jnp.concatenate(
                [row_of(Y_ref, i)[2 * n:2 * n + 1, :] for i in range(n)],
                axis=0)  # (n, K)

        def cr_factor_solve():
            """x_ref <- H^-1 r by block cyclic reduction."""

            def level(el, _):
                h = jnp.int32(1) << el
                odd = jnp.bitwise_and(kk, 2 * h - 1) == h
                oddm = odd.astype(dt)
                even = jnp.bitwise_and(kk, 2 * h - 1) == 0
                evenm = even.astype(dt)
                rightm = (even & (kk >= 2 * h)).astype(dt)

                chol_masked(oddm)
                # RHS [B_prev^T | B_own | r] at every lane (odd ones real)
                for i in range(n):
                    bt_prev = pltpu.roll(row_of(BT_ref, i), h, 1)
                    Y_ref[pl.ds(i, 1), 0:n, :] = bt_prev[0:n, :][None]
                    Y_ref[pl.ds(i, 1), n:2 * n, :] = (
                        row_of(B_ref, i)[0:n, :][None])
                    Y_ref[pl.ds(i, 1), 2 * n:2 * n + 1, :] = (
                        r_ref[i:i + 1, :][None])
                trisolve_masked(oddm)
                # store X once per eliminated supernode (for back-sub)
                for i in range(n):
                    yi = row_of(Y_ref, i)
                    X1_ref[pl.ds(i, 1)] = jnp.where(
                        odd, yi[0:n, :], row_of(X1_ref, i))[None]
                    X2_ref[pl.ds(i, 1)] = jnp.where(
                        odd, yi[n:2 * n, :], row_of(X2_ref, i))[None]
                xr = xr_rows()
                Xr_ref[0:n, :] = jnp.where(
                    jnp.broadcast_to(odd, (n, K)), xr, Xr_ref[0:n, :])

                # neighbor-lane readers for the CURRENT level's X
                def x1_left(j):
                    return pltpu.roll(row_of(Y_ref, j), K - h, 1)[0:n, :]

                def x2_left(j):
                    return pltpu.roll(
                        row_of(Y_ref, j), K - h, 1)[n:2 * n, :]

                def x2_right(j):
                    return pltpu.roll(row_of(Y_ref, j), h, 1)[n:2 * n, :]

                # rhs updates first (matvecs; read B/BT + Y's r column)
                xr_l = pltpu.roll(xr, K - h, 1)
                xr_r = pltpu.roll(xr, h, 1)
                accl = jnp.zeros((SP, K), dt)
                accr = jnp.zeros((SP, K), dt)
                for j in range(n):
                    accl = accl + row_of(BT_ref, j) * xr_l[j:j + 1, :]
                    accr = accr + pltpu.roll(
                        row_of(B_ref, j), h, 1) * xr_r[j:j + 1, :]
                r_ref[...] = r_ref[...] - evenm * accl - rightm * accr

                # D_e -= B_e X1_{e+h}  (left even update)
                def upd_d(h0, h1, Cg):
                    cur = D_ref[pl.ds(h0, h1 - h0), 0:n, :]
                    D_ref[pl.ds(h0, h1 - h0), 0:n, :] = (
                        cur - evenm[None] * Cg)

                mm(lambda j: row_of(BT_ref, j), x1_left, upd_d)

                # D_g -= B_{g-h}^T X2_{g-h}  (right even update)
                def upd_d_r(h0, h1, Cg):
                    cur = D_ref[pl.ds(h0, h1 - h0), 0:n, :]
                    D_ref[pl.ds(h0, h1 - h0), 0:n, :] = (
                        cur - rightm[None] * Cg)

                mm(lambda j: pltpu.roll(row_of(B_ref, j), h, 1), x2_right,
                   upd_d_r)

                # stage OLD BT rows into Y's X1 region (no longer needed)
                # - both coupling products must read the PRE-update BT
                for i in range(n):
                    Y_ref[pl.ds(i, 1), 0:n, :] = (
                        row_of(BT_ref, i)[0:n, :][None])

                def bt_old(j):
                    return row_of(Y_ref, j)[0:n, :]

                # B'_e = -B_e X2_{e+h}
                def upd_b(h0, h1, Cg):
                    cur = B_ref[pl.ds(h0, h1 - h0), 0:n, :]
                    B_ref[pl.ds(h0, h1 - h0), 0:n, :] = (
                        (1.0 - evenm[None]) * cur
                        - evenm[None] * Cg)

                mm(bt_old, x2_left, upd_b)

                # BT'_e = -X2_{e+h}^T B_e^T
                def upd_bt(h0, h1, Cg):
                    cur = BT_ref[pl.ds(h0, h1 - h0), 0:n, :]
                    BT_ref[pl.ds(h0, h1 - h0), 0:n, :] = (
                        (1.0 - evenm[None]) * cur
                        - evenm[None] * Cg)

                mm(x2_left, bt_old, upd_bt)
                return 0

            jax.lax.fori_loop(0, levels, level, 0)

            # top supernode (lane 0): x_0 = D_0^-1 r_0
            lane0 = kk == 0
            lane0m = lane0.astype(dt)
            chol_masked(lane0m)
            for i in range(n):
                Y_ref[pl.ds(i, 1), 0:1, :] = r_ref[i:i + 1, :][None]
                Y_ref[pl.ds(i, 1), 1:XC, :] = jnp.zeros(
                    (1, XC - 1, K), dt)
            trisolve_masked(lane0m)
            x0 = jnp.concatenate(
                [row_of(Y_ref, i)[0:1, :] for i in range(n)], axis=0)
            x_ref[0:n, :] = jnp.where(
                jnp.broadcast_to(lane0, (n, K)), x0, 0.0)
            if SP > n:
                x_ref[n:SP, :] = jnp.zeros((SP - n, K), dt)

            # back-substitution, top level down
            def back(q, _):
                el = levels - 1 - q
                h = jnp.int32(1) << el
                odd = jnp.bitwise_and(kk, 2 * h - 1) == h
                xl = pltpu.roll(x_ref[...], h, 1)
                xr_ = pltpu.roll(x_ref[...], K - h, 1)
                for i in range(n):
                    v1 = jnp.sum(row_of(X1_ref, i) * xl[0:n, :], axis=0,
                                 keepdims=True)
                    v2 = jnp.sum(row_of(X2_ref, i) * xr_[0:n, :], axis=0,
                                 keepdims=True)
                    xi = Xr_ref[i:i + 1, :] - v1 - v2
                    x_ref[i:i + 1, :] = jnp.where(
                        odd, xi, x_ref[i:i + 1, :])
                return 0

            jax.lax.fori_loop(0, levels, back, 0)

        def delta_flat():
            rows = []
            for u in range(3):
                rows.append(jnp.concatenate(
                    [x_ref[3 * a + u:3 * a + u + 1, :] for a in range(W)],
                    axis=-1))
            return jnp.concatenate(rows, axis=0)  # (3, WK)

        # --- LM loop (doSPA schedule, spa2d.cpp:425-609) ---------------
        p0 = pT_ref[0:3, :]
        cost0 = cost_of(p0)
        one = jnp.ones((1, 1), dt)
        zero = jnp.zeros((1, 1), dt)

        def lm_body(carry):
            pT3, lam, laminc, cost, it, good, _done = carry
            assemble(pT3, lam[0, 0])
            cr_factor_solve()
            delta = delta_flat() * fm_flat
            sq = _rsum(delta * delta)
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
            return (pT3, lam, laminc, cost, it + one, good + accept,
                    converged)

        def lm_cond(carry):
            _p, _l, _li, _c, it, _g, done = carry
            return (it[0, 0] < iters) & (done[0, 0] < 0.5)

        pT3, _lam, _li, cost, it, good, _d = jax.lax.while_loop(
            lm_cond, lm_body,
            (p0, lam_ref[...] * one, 2.0 * one, cost0, zero, zero, zero),
        )
        out_ref[0:3, :] = pT3
        out_ref[4:8, :] = jnp.zeros((4, WK), dt)
        laneW = jax.lax.broadcasted_iota(jnp.int32, (1, WK), 1)
        out_ref[3:4, :] = (
            jnp.where(laneW == 0, cost0, 0.0)
            + jnp.where(laneW == 1, cost, 0.0)
            + jnp.where(laneW == 2, good, 0.0)
            + jnp.where(laneW == 3, it, 0.0)
        )

    return kernel


def cr_vmem_bytes(W: int, K: int) -> int:
    n = 3 * W
    SP = -(-n // 8) * 8
    XCP = -(-(2 * n + 1) // 8) * 8
    WK = W * K
    b = 3 * n * SP * K          # D, B, BT
    b += n * XCP * K            # Y
    b += 2 * n * SP * K        # X1, X2 (padded)
    b += 3 * SP * K             # Xr, r, x
    b += (NBANKS * W * SLOT_ROWS + 16) * WK  # slots + poses + out
    return 4 * b


def cr_lm_applicable(W: int, K: int) -> bool:
    """In-VMEM monolith eligibility. K is capped at 512 on top of the
    VMEM gate: the kernel's unrolled Mosaic program compiles in ~10 s at
    K=256 but >30 min at K=2048 (round-5 probe — lane-register count
    scales the instruction stream ~K/128), so larger lane counts go to
    the HBM-streamed pipeline (solver/cr_stream.py) even when they would
    fit VMEM."""
    return (K & (K - 1)) == 0 and 128 <= K <= 512 and cr_vmem_bytes(
        W, K) <= 13_500_000


@functools.partial(
    jax.jit,
    static_argnames=("W", "K", "iters", "sq_min_delta", "interpret"),
)
def fused_cr_lm(
    pT8,        # (8, W*K) rows 0..2 poses flat, row 3 free mask
    slots,      # (NBANKS*W*SLOT_ROWS, W*K)
    lam0,
    W: int, K: int, iters: int, sq_min_delta: float,
    interpret: bool = False,
):
    """Run the direct-LM kernel. Returns the packed (8, W*K) result:
    rows 0..2 = solved posesT in flat layout, row 3 lanes 0..3 =
    (cost0, cost, good, iters) - ONE device->host transfer."""
    n = 3 * W
    SP = -(-n // 8) * 8
    XC = 2 * n + 1
    lam = jnp.full((1, 1), lam0, jnp.float32)
    return pl.pallas_call(
        _make_kernel(W, K, iters, float(sq_min_delta)),
        out_shape=jax.ShapeDtypeStruct((8, W * K), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, SP, K), jnp.float32),   # D
            pltpu.VMEM((n, SP, K), jnp.float32),   # B
            pltpu.VMEM((n, SP, K), jnp.float32),   # BT
            pltpu.VMEM((n, XC, K), jnp.float32),   # Y
            pltpu.VMEM((n, n, K), jnp.float32),    # X1
            pltpu.VMEM((n, n, K), jnp.float32),    # X2
            pltpu.VMEM((SP, K), jnp.float32),      # Xr
            pltpu.VMEM((SP, K), jnp.float32),      # r
            pltpu.VMEM((SP, K), jnp.float32),      # x
        ],
        compiler_params=pltpu.CompilerParams(
            # the default 16 MiB scoped-VMEM budget rejects K>=512: the
            # unrolled assembly passes don't reuse stack slots (round-3
            # lesson). v5e accepts a higher cap; measured working below.
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
        interpret=interpret,
    )(pT8, slots, lam)
