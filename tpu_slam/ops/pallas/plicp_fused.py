"""Fully-fused PL-ICP matcher: the whole ICP loop in ONE Pallas kernel.

Two correspondence strategies share the same round tail (_round_tail) and
produce bit-identical results: a per-pair MXU cross-term/one-hot-gather
kernel (best at large batches) and a broadcast-NN VPU kernel (best at the
small batches of the real-time odometry path). See plicp_match_fused.

The XLA path (ops/plicp.py) runs ~10 rounds of {NN, adjacent-point gather,
quantile sort, GN solve} as separate HBM-bound ops — measured ~170 ms per
512-pair batch on v5e, dominated by (B, N) gathers and sorts. This kernel
keeps each scan pair entirely in VMEM across ALL rounds and eliminates
every gather and sort:

  * correspondences: squared distances are expanded as
    |w|² + |t|² − 2·w·t (exactly like the XLA path's
    ops/matching.pairwise_sqdist) so the dominant cross term is ONE
    (2, C)ᵀ(2, M) MXU contraction per pair — and since |w|² is constant
    per source row, the argmin only scans s = |t|² − 2·w·t, leaving the
    VPU just one subtract + min + index pass over the (C, M) tile;
    "gather tgt[j1]" becomes a TRANSPOSED one-hot (sublane iota == argmin)
    fed to ONE (9, M) @ (M, C) MXU matmul per pair, fetching the nearest
    point, its two beam neighbors (pre-shifted target arrays), and their
    validities at once — bit-exact (each one-hot column selects a single
    f32 value);
  * CSM outlier trimming: the two masked quantiles (outliers_maxPerc /
    adaptive_order, plicp_odometry.cc:139-156) are found by a fixed-depth
    binary search over the residual value range (vectorized counts) instead
    of a sort;
  * Gauss-Newton: the 3×3 normal equations are solved in closed form
    (cofactor expansion) — no linalg call;
  * the full ``max_iterations``-round loop is a `lax.fori_loop` inside the
    kernel, so one launch performs the complete match for a block of pairs.

Semantics match ops/plicp.py (same fixed point, same guards); tests compare
the two paths. Reference semantics: CSM `sm_icp` as configured by
lesson3/src/plicp_odometry.cc:69-186.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_slam.config import PLICPConfig

BIG = 1e12
PAIRS_PER_PROGRAM = 16  # v5e sweet spot: P=16 beats 8/32 (latency-bound VPU ops amortize over sublanes)
QUANTILE_ITERS = 22  # binary-search depth: |err| resolved to ~max/4e6


def _norm_angle(th):
    """Branchless wrap to (−π, π] — Mosaic has no atan2."""
    two_pi = 6.283185307179586
    return th - two_pi * jnp.floor((th + 3.141592653589793) / two_pi)


def _masked_quantile_search(err, gate_f, q):
    """Value of the floor(q·(cnt−1))-th smallest gated |err| via binary
    search on the value axis. err, gate_f: (P, N)."""
    cnt = jnp.sum(gate_f, axis=1, keepdims=True)  # (P,1)
    kth = jnp.floor(q * jnp.maximum(cnt - 1.0, 0.0))  # (P,1) rank (0-based)
    hi0 = jnp.max(jnp.where(gate_f > 0, err, 0.0), axis=1, keepdims=True)
    lo0 = jnp.zeros_like(hi0)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        c = jnp.sum(gate_f * (err <= mid), axis=1, keepdims=True)
        take_lo = c >= kth + 1.0  # enough elements ≤ mid
        hi = jnp.where(take_lo, mid, hi)
        lo = jnp.where(take_lo, lo, mid)
        return lo, hi

    # statically unrolled: the loop state is two (P,1) scalars, and Mosaic
    # loop-trip overhead at this size rivals the iteration's own work
    lo, hi = jax.lax.fori_loop(
        0, QUANTILE_ITERS, body, (lo0, hi0), unroll=True
    )
    return hi  # (P,1) upper bound ≈ kth value


def _solve3(h00, h01, h02, h11, h12, h22, b0, b1, b2):
    """Closed-form symmetric 3×3 solve via cofactors; (P,1) scalars."""
    c00 = h11 * h22 - h12 * h12
    c01 = h02 * h12 - h01 * h22
    c02 = h01 * h12 - h02 * h11
    det = h00 * c00 + h01 * c01 + h02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    ok = jnp.abs(det) > 1e-20
    c11 = h00 * h22 - h02 * h02
    c12 = h02 * h01 - h00 * h12
    c22 = h00 * h11 - h01 * h01
    d0 = (c00 * b0 + c01 * b1 + c02 * b2) * inv_det
    d1 = (c01 * b0 + c11 * b1 + c12 * b2) * inv_det
    d2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv_det
    z = jnp.zeros_like(d0)
    return (
        jnp.where(ok, d0, z), jnp.where(ok, d1, z), jnp.where(ok, d2, z),
    )


def _round_tail(
    cfg, sx, sy, sv, px, py, pth, wx, wy,
    q1x, q1y, q1v, ax, ay, av, bx, by, bv, dmin, max_d2,
    conv_in,
):
    """Shared per-round tail of the fused PL-ICP kernels: second-point
    selection (better adjacent beam), point-to-line residuals, CSM outlier
    trimming, two frozen-correspondence GN steps, stats and PER-PAIR
    epsilon convergence. Used by both correspondence kernels so their
    semantics match exactly.

    conv_in (P, 1) bool: pairs that already hit their epsilons — their
    pose and stats FREEZE, exactly CSM's per-call `sm_icp` termination
    (each scan pair stops at its own epsilon instead of riding along with
    the rest of the batch).

    Inputs are (P, N) tiles; returns (px2, py2, pth2, mean_err, n_inl,
    h_flat (P, 6), conv_out (P, 1) bool).
    """
    dtype = sx.dtype

    # second point: better of the two adjacent beams (csm icp_corr)
    da = (wx - ax) ** 2 + (wy - ay) ** 2 + (1.0 - av) * BIG
    db = (wx - bx) ** 2 + (wy - by) ** 2 + (1.0 - bv) * BIG
    use_a = da <= db
    q2x = jnp.where(use_a, ax, bx)
    q2y = jnp.where(use_a, ay, by)
    q2v = jnp.where(use_a, av, bv)

    tgx = q2x - q1x
    tgy = q2y - q1y
    tlen = jnp.sqrt(tgx * tgx + tgy * tgy)
    ok_len = tlen > 1e-9
    inv_l = 1.0 / jnp.maximum(tlen, 1e-9)
    nx_ = -tgy * inv_l
    ny_ = tgx * inv_l
    resid = nx_ * (wx - q1x) + ny_ * (wy - q1y)

    gate = (
        sv * q1v * q2v
        * (dmin < max_d2).astype(dtype)
        * ok_len.astype(dtype)
    )
    err = jnp.abs(resid)
    thr_perc = _masked_quantile_search(err, gate, cfg.outliers_maxPerc)
    thr_adap = cfg.outliers_adaptive_mult * _masked_quantile_search(
        err, gate, cfg.outliers_adaptive_order
    )
    thr = jnp.minimum(thr_perc, jnp.maximum(thr_adap, 1e-6))
    w = gate * (err <= thr + 1e-12).astype(dtype)  # (P,N)

    # pose-independent pieces of the GN normal equations: h00/h01/h11 and
    # the inlier count depend only on (w, n) — shared by BOTH inner steps
    wn = w
    wnx = wn * nx_
    h00 = jnp.sum(wnx * nx_, axis=1, keepdims=True)
    h01 = jnp.sum(wnx * ny_, axis=1, keepdims=True)
    h11 = jnp.sum(wn * ny_ * ny_, axis=1, keepdims=True)
    wsum = jnp.sum(wn, axis=1, keepdims=True)
    nok = (wsum >= 3.0).astype(dtype)

    def gn(px, py, wx, wy, r):
        # J = [n_x, n_y, nᵀ·perp(R p)] with rp = world − t; r is the
        # point-to-line residual at (wx, wy) (resid for the first step)
        rpx = wx - px
        rpy = wy - py
        jth = nx_ * (-rpy) + ny_ * rpx
        wjth = wn * jth
        h02 = jnp.sum(wnx * jth, axis=1, keepdims=True)
        h12 = jnp.sum(wn * ny_ * jth, axis=1, keepdims=True)
        h22 = jnp.sum(wjth * jth, axis=1, keepdims=True)
        b0 = -jnp.sum(wnx * r, axis=1, keepdims=True)
        b1 = -jnp.sum(wn * ny_ * r, axis=1, keepdims=True)
        b2 = -jnp.sum(wjth * r, axis=1, keepdims=True)
        d0, d1, d2_ = _solve3(
            h00 + 1e-9, h01, h02, h11 + 1e-9, h12, h22 + 1e-9,
            b0, b1, b2,
        )
        fin = (
            jnp.isfinite(d0) & jnp.isfinite(d1) & jnp.isfinite(d2_)
        ).astype(dtype)
        g = nok * fin
        return d0 * g, d1 * g, d2_ * g, (
            h00, h01, h02, h11, h12, h22
        )

    # two inner GN steps with frozen correspondences (ops/plicp.py);
    # the first step's residual is exactly `resid` from the trim stage
    d0, d1, dth = gn(px, py, wx, wy, resid)[:3]
    px1, py1 = px + d0, py + d1
    pth1 = _norm_angle(pth + dth)
    c1, s1 = jnp.cos(pth1), jnp.sin(pth1)
    wx1 = c1 * sx - s1 * sy + px1
    wy1 = s1 * sx + c1 * sy + py1
    r1 = nx_ * (wx1 - q1x) + ny_ * (wy1 - q1y)
    e0, e1, eth, hs = gn(px1, py1, wx1, wy1, r1)
    px2, py2 = px1 + e0, py1 + e1
    pth2 = _norm_angle(pth1 + eth)

    n_inl = wsum
    mean_err = jnp.sum(w * err, axis=1, keepdims=True) / jnp.maximum(
        wsum, 1.0
    )
    h_flat = jnp.concatenate(hs, axis=1)  # (P,6)
    # CSM termination (sm_icp epsilon_xy/epsilon_theta), per pair: a pair
    # whose full-round step is under the epsilons is converged and frozen.
    # Padded pairs have no valid beams → zero steps → converged.
    step_x = jnp.abs(d0 + e0)
    step_y = jnp.abs(d1 + e1)
    step_t = jnp.abs(dth + eth)
    conv_out = conv_in | (
        (step_x < cfg.epsilon_xy)
        & (step_y < cfg.epsilon_xy)
        & (step_t < cfg.epsilon_theta)
    )  # (P,1)
    # freeze converged pairs (inputs px/py/pth/stats carried from last round)
    px2 = jnp.where(conv_in, px, px2)
    py2 = jnp.where(conv_in, py, py2)
    pth2 = jnp.where(conv_in, pth, pth2)
    return px2, py2, pth2, mean_err, n_inl, h_flat, conv_out


def _split3(x):
    """Exact 3-term bf16 decomposition of f32: x = hi + mid + lo.

    Dekker-style: each residual subtraction is error-free (the parts share
    the leading bits), and the last residual has ≤8 significant bits left,
    so lo captures it exactly. Products of any part with a 0/1 one-hot are
    exact on the MXU (bf16×bf16 accumulated in f32), which makes split
    matmuls bit-exact gathers — the round-4 "split-bf16" headroom note."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(x.dtype)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, mid, lo


def _make_kernel(cfg: PLICPConfig, n: int, m: int, chunk: int):
    max_d2 = cfg.max_correspondence_dist**2
    n_rounds = cfg.max_iterations
    n_chunks = n // chunk

    def kernel(
        sx_ref, sy_ref, sv_ref,          # (P, N) src coords + valid
        tx_ref, ty_ref, tv_ref,          # (P, M) tgt coords + valid
        pxr, pyr, pvr,                   # (P, M) tgt shifted +1 (prev beam)
        nxr, nyr, nvr,                   # (P, M) tgt shifted −1 (next beam)
        init_ref,                        # (P, 3)
        pose_ref, stats_ref, H_ref,      # out: (P,3), (P,4), (P,9)
        wx_s, wy_s, dmin_s, gath_s,      # (P,N)×3, (P,9,N)
        rows27_s, t12_s, a12_s, tn_s,    # bf16 (P,27,M), (P,12,M), (P,12,N); (P,M)
    ):
        sx = sx_ref[...]
        sy = sy_ref[...]
        sv = sv_ref[...]
        P = sx.shape[0]
        C = chunk
        cols2d = jax.lax.broadcasted_iota(jnp.int32, (C, m), 1)
        # The 9 gather sources, each split into exact bf16 triples and
        # stacked on sublanes (rows k / 9+k / 18+k = hi / mid / lo of
        # source k). ONE default-precision (27, M) @ (M, C) one-hot matmul
        # per pair then gathers everything bit-exactly: 27 rows cost the
        # MXU the same as 9 (≤128 sublanes per pass), so this replaces the
        # round-4 six-pass HIGHEST gather at one-sixth the MXU passes —
        # the throughput the correctness fix gave back.
        tx = tx_ref[...]
        ty = ty_ref[...]
        txh, txm, txl = _split3(tx)
        tyh, tym, tyl = _split3(ty)
        sources = (
            (txh, txm, txl), (tyh, tym, tyl), _split3(tv_ref[...]),
            _split3(pxr[...]), _split3(pyr[...]), _split3(pvr[...]),
            _split3(nxr[...]), _split3(nyr[...]), _split3(nvr[...]),
        )
        for k, (h, mm, ll) in enumerate(sources):
            rows27_s[:, k, :] = h
            rows27_s[:, 9 + k, :] = mm
            rows27_s[:, 18 + k, :] = ll
        # Cross term w·t as ONE default-precision pass: the six significant
        # split combos (hi·hi, hi·mid, mid·hi, hi·lo, lo·hi, mid·mid —
        # exactly the passes HIGHEST performs) stacked along the CONTRACTION
        # dim per coordinate (K=12 costs the MXU the same as K=2). Dropped
        # combos are ≤2⁻²⁷ relative — below the f32 rounding of the result.
        # The ranking coordinates are CENTERED on the per-pair target
        # centroid first: distances are translation-invariant, and the
        # expanded form's cancellation noise scales with |t|² — centering
        # cuts it ~25× at outdoor magnitudes (|t|≈50 m → spread ≈10 m), so
        # argmin tie flips vs the exact-d2 XLA path need ties ~25× closer.
        # ONLY the s-ranking sees centered values; the gather rows, the
        # exact dmin gate, and the GN tail all use original coordinates.
        tv = tv_ref[...]
        tvsum = jnp.maximum(jnp.sum(tv, axis=1, keepdims=True), 1.0)
        cx = jnp.sum(tx * tv, axis=1, keepdims=True) / tvsum  # (P,1)
        cy = jnp.sum(ty * tv, axis=1, keepdims=True) / tvsum
        tcx = (tx - cx) * tv  # invalid beams pinned to the centroid → 0
        tcy = (ty - cy) * tv
        tcxh, tcxm, tcxl = _split3(tcx)
        tcyh, tcym, tcyl = _split3(tcy)
        for r, v in enumerate((tcxh, tcxm, tcxh, tcxl, tcxh, tcxm)):
            t12_s[:, r, :] = v
        for r, v in enumerate((tcyh, tcym, tcyh, tcyl, tcyh, tcym)):
            t12_s[:, 6 + r, :] = v
        # centered target squared norms + validity mask, constant across
        # rounds: d2 = |wc|² + |tc|² − 2·wc·tc — |wc|² is constant per
        # source row, so the argmin over M only needs s = |tc|² − 2·wc·tc
        tn_s[...] = tcx * tcx + tcy * tcy + (1.0 - tv) * BIG
        miota = jax.lax.broadcasted_iota(jnp.int32, (m, C), 0)

        def round_body(carry):
            i, px, py, pth, pe, pni, ph, conv = carry
            c, s = jnp.cos(pth), jnp.sin(pth)  # (P,1)
            wx = c * sx - s * sy + px  # (P,N) world src
            wy = s * sx + c * sy + py
            wx_s[...] = wx
            wy_s[...] = wy
            # centered world-side split stack for the cross term, all pairs
            # at once (frozen pairs recompute identical values — their pose
            # is frozen — so the skip below stays consistent)
            wxh, wxm, wxl = _split3(wx - cx)
            wyh, wym, wyl = _split3(wy - cy)
            for r, v in enumerate((wxh, wxh, wxm, wxh, wxl, wxm)):
                a12_s[:, r, :] = v
            for r, v in enumerate((wyh, wyh, wym, wyh, wyl, wym)):
                a12_s[:, 6 + r, :] = v

            # chunk loop over source beams: only per-pair (C, M) tiles are
            # live; a real fori_loop (not unrolled) so Mosaic reuses the
            # tile buffers across chunks. Values round-trip through VMEM
            # scratch because Mosaic only supports dynamic slicing on refs.
            # For typical scans (N ≤ 512) there is exactly ONE chunk — the
            # loop disappears and the whole round is straight-line code.
            def corr_chunk(ci, _):
                off = pl.multiple_of(ci * C, C)
                wxc = wx_s[:, pl.ds(off, C)]
                wyc = wy_s[:, pl.ds(off, C)]
                for p in range(P):
                    # a converged pair's pose is frozen → its NN/gather
                    # results are already in scratch from its last active
                    # round; skip BOTH matmuls (the round's dominant cost)
                    @pl.when(conv[p, 0] < 0.5)
                    def _():
                        # s ranks identically to d2 per source row; one
                        # K=12 default pass (see t12_s comment above)
                        cross = jax.lax.dot_general(
                            a12_s[p, :, pl.ds(off, C)], t12_s[p],
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=sx.dtype,
                        )  # (C, M)
                        s_ = tn_s[p][None, :] - 2.0 * cross
                        sminc = jnp.min(s_, axis=1)  # (C,)
                        idx = jnp.min(
                            jnp.where(
                                s_ <= sminc[:, None], cols2d, jnp.int32(m)
                            ),
                            axis=1,
                        )  # (C,)
                        # all 9 gathers as ONE bit-exact MXU matmul: the
                        # one-hot is built TRANSPOSED (sublane iota ==
                        # argmin broadcast) so (27, M) @ (M, C) lands
                        # directly in gath layout; hi+mid+lo recombination
                        # is error-free (each partial sum is exactly
                        # representable by construction of the split).
                        onehotT = (miota == idx[None, :]).astype(
                            jnp.bfloat16
                        )
                        o27 = jnp.dot(
                            rows27_s[p], onehotT,
                            preferred_element_type=sx.dtype,
                        )  # (27, C)
                        g = (o27[0:9] + o27[9:18]) + o27[18:27]
                        gath_s[p, :, pl.ds(off, C)] = g
                        # the dmin<max_d2 inlier gate recomputed EXACTLY on
                        # the VPU from the gathered NN point — the gate no
                        # longer depends on matmul precision at all (the
                        # round-4 outdoor failure was this gate flipping)
                        dmin_s[p, pl.ds(off, C)] = (
                            (wxc[p] - g[0]) ** 2
                            + (wyc[p] - g[1]) ** 2
                            + (1.0 - g[2]) * BIG
                        )
                return 0

            if n_chunks == 1:  # typical scans: no loop machinery at all
                corr_chunk(0, 0)
            else:
                jax.lax.fori_loop(0, n_chunks, corr_chunk, 0)

            wx = wx_s[...]
            wy = wy_s[...]
            dmin = dmin_s[...]
            q1x = gath_s[:, 0, :]
            q1y = gath_s[:, 1, :]
            q1v = gath_s[:, 2, :]
            ax = gath_s[:, 3, :]
            ay = gath_s[:, 4, :]
            av = gath_s[:, 5, :]
            bx = gath_s[:, 6, :]
            by = gath_s[:, 7, :]
            bv = gath_s[:, 8, :]

            conv_b = conv > 0.5
            px2, py2, pth2, mean_err, n_inl, h_flat, conv_out = _round_tail(
                cfg, sx, sy, sv, px, py, pth, wx, wy,
                q1x, q1y, q1v, ax, ay, av, bx, by, bv, dmin, max_d2,
                conv_b,
            )
            # freeze converged pairs' stats alongside their pose
            mean_err = jnp.where(conv_b, pe, mean_err)
            n_inl = jnp.where(conv_b, pni, n_inl)
            h_flat = jnp.where(conv_b, ph, h_flat)
            return (i + 1, px2, py2, pth2, mean_err, n_inl, h_flat,
                    conv_out.astype(sx.dtype))

        zero1 = jnp.zeros((P, 1), sx.dtype)
        carry0 = (
            jnp.int32(0),
            init_ref[:, 0:1], init_ref[:, 1:2], init_ref[:, 2:3],
            zero1, zero1, jnp.zeros((P, 6), sx.dtype),
            jnp.zeros((P, 1), sx.dtype),  # conv flags as float: Mosaic
            # cannot squeeze scalar bools for the per-pair pl.when predicate
        )
        _, px, py, pth, err, ninl, hs, cv = jax.lax.while_loop(
            lambda cr: (cr[0] < n_rounds) & (jnp.min(cr[-1]) < 0.5),
            round_body, carry0,
        )
        pose_ref[:, 0:1] = px
        pose_ref[:, 1:2] = py
        pose_ref[:, 2:3] = pth
        stats_ref[:, 0:1] = err
        stats_ref[:, 1:2] = ninl
        stats_ref[:, 2:3] = cv
        stats_ref[:, 3:4] = jnp.zeros((P, 1), sx.dtype)
        # symmetric H packed (upper triangle + mirrored)
        H_ref[:, 0:1] = hs[:, 0:1]
        H_ref[:, 1:2] = hs[:, 1:2]
        H_ref[:, 2:3] = hs[:, 2:3]
        H_ref[:, 3:4] = hs[:, 1:2]
        H_ref[:, 4:5] = hs[:, 3:4]
        H_ref[:, 5:6] = hs[:, 4:5]
        H_ref[:, 6:7] = hs[:, 2:3]
        H_ref[:, 7:8] = hs[:, 4:5]
        H_ref[:, 8:9] = hs[:, 5:6]

    return kernel


def _make_kernel_bcast(cfg: PLICPConfig, n: int, m: int, chunk: int):
    """Broadcast-NN variant: squared distances computed directly as a
    (P, C, M) elementwise broadcast on the VPU instead of per-pair MXU
    cross-term matmuls. Exact same correspondence semantics as the matmul
    kernel (same tie-break, same beam-edge invalidation) but with NO
    sequential python loop over pairs — all P pairs advance in lockstep
    through pure vector code, which wins when the per-pair matmuls are
    launch-latency-bound rather than FLOP-bound.

    Neighbor (j1±1) fetches fall out for free: the one-hot at idx∓1 selects
    the adjacent target beam, and idx−1 < 0 / idx+1 ≥ M produce an all-zero
    one-hot → validity 0, which is exactly the shifted-array edge
    invalidation of the matmul kernel (prev_v[:,0]=0 / next_v[:,M−1]=0).
    """
    max_d2 = cfg.max_correspondence_dist**2
    n_rounds = cfg.max_iterations
    n_chunks = n // chunk

    def kernel(
        sx_ref, sy_ref, sv_ref,          # (P, N) src coords + valid
        tx_ref, ty_ref, tv_ref,          # (P, M) tgt coords + valid
        init_ref,                        # (P, 3)
        pose_ref, stats_ref, H_ref,      # out: (P,3), (P,4), (P,9)
        wx_s, wy_s, dmin_s, gath_s,      # (P,N)×3, (P,9,N)
    ):
        sx = sx_ref[...]
        sy = sy_ref[...]
        sv = sv_ref[...]
        P = sx.shape[0]
        C = chunk
        txb = tx_ref[...][:, None, :]  # (P,1,M)
        tyb = ty_ref[...][:, None, :]
        tvb = tv_ref[...][:, None, :]
        pen = (1.0 - tvb) * BIG
        kiota = jax.lax.broadcasted_iota(jnp.int32, (P, C, m), 2)

        def round_body(carry):
            i, px, py, pth, pe, pni, ph, conv = carry
            c, s = jnp.cos(pth), jnp.sin(pth)  # (P,1)
            wx_s[...] = c * sx - s * sy + px  # (P,N) world src
            wy_s[...] = s * sx + c * sy + py

            def corr_chunk(ci, _):
                off = pl.multiple_of(ci * C, C)
                wxc = wx_s[:, pl.ds(off, C)][:, :, None]  # (P,C,1)
                wyc = wy_s[:, pl.ds(off, C)][:, :, None]
                dx = wxc - txb
                dy = wyc - tyb
                d2 = dx * dx + dy * dy + pen  # (P,C,M)
                dmin = jnp.min(d2, axis=2)  # (P,C)
                idx = jnp.min(
                    jnp.where(d2 <= dmin[:, :, None], kiota, jnp.int32(m)),
                    axis=2,
                )  # (P,C) first index attaining the min
                i3 = idx[:, :, None]

                def sel(row, ohx):  # (P,1,M), (P,C,M) → (P,C)
                    return jnp.sum(jnp.where(ohx, row, 0.0), axis=2)

                dmin_s[:, pl.ds(off, C)] = dmin
                oh = kiota == i3
                gath_s[:, 0, pl.ds(off, C)] = sel(txb, oh)
                gath_s[:, 1, pl.ds(off, C)] = sel(tyb, oh)
                gath_s[:, 2, pl.ds(off, C)] = sel(tvb, oh)
                ohm = kiota == i3 - 1
                gath_s[:, 3, pl.ds(off, C)] = sel(txb, ohm)
                gath_s[:, 4, pl.ds(off, C)] = sel(tyb, ohm)
                gath_s[:, 5, pl.ds(off, C)] = sel(tvb, ohm)
                ohp = kiota == i3 + 1
                gath_s[:, 6, pl.ds(off, C)] = sel(txb, ohp)
                gath_s[:, 7, pl.ds(off, C)] = sel(tyb, ohp)
                gath_s[:, 8, pl.ds(off, C)] = sel(tvb, ohp)
                return 0

            if n_chunks == 1:  # typical scans: no loop machinery at all
                corr_chunk(0, 0)
            else:
                jax.lax.fori_loop(0, n_chunks, corr_chunk, 0)

            conv_b = conv > 0.5
            px2, py2, pth2, mean_err, n_inl, h_flat, conv_out = _round_tail(
                cfg, sx, sy, sv, px, py, pth, wx_s[...], wy_s[...],
                gath_s[:, 0, :], gath_s[:, 1, :], gath_s[:, 2, :],
                gath_s[:, 3, :], gath_s[:, 4, :], gath_s[:, 5, :],
                gath_s[:, 6, :], gath_s[:, 7, :], gath_s[:, 8, :],
                dmin_s[...], max_d2,
                conv_b,
            )
            # freeze converged pairs' stats alongside their pose (their
            # recomputed correspondences are identical — pose frozen — so
            # results stay bit-identical to the skipping matmul kernel)
            mean_err = jnp.where(conv_b, pe, mean_err)
            n_inl = jnp.where(conv_b, pni, n_inl)
            h_flat = jnp.where(conv_b, ph, h_flat)
            return (i + 1, px2, py2, pth2, mean_err, n_inl, h_flat,
                    conv_out.astype(sx.dtype))

        zero1 = jnp.zeros((P, 1), sx.dtype)
        carry0 = (
            jnp.int32(0),
            init_ref[:, 0:1], init_ref[:, 1:2], init_ref[:, 2:3],
            zero1, zero1, jnp.zeros((P, 6), sx.dtype),
            jnp.zeros((P, 1), sx.dtype),  # conv flags as float: Mosaic
            # cannot squeeze scalar bools for the per-pair pl.when predicate
        )
        _, px, py, pth, err, ninl, hs, cv = jax.lax.while_loop(
            lambda cr: (cr[0] < n_rounds) & (jnp.min(cr[-1]) < 0.5),
            round_body, carry0,
        )
        pose_ref[:, 0:1] = px
        pose_ref[:, 1:2] = py
        pose_ref[:, 2:3] = pth
        stats_ref[:, 0:1] = err
        stats_ref[:, 1:2] = ninl
        stats_ref[:, 2:3] = cv
        stats_ref[:, 3:4] = jnp.zeros((P, 1), sx.dtype)
        # symmetric H packed (upper triangle + mirrored)
        H_ref[:, 0:1] = hs[:, 0:1]
        H_ref[:, 1:2] = hs[:, 1:2]
        H_ref[:, 2:3] = hs[:, 2:3]
        H_ref[:, 3:4] = hs[:, 1:2]
        H_ref[:, 4:5] = hs[:, 3:4]
        H_ref[:, 5:6] = hs[:, 4:5]
        H_ref[:, 6:7] = hs[:, 2:3]
        H_ref[:, 7:8] = hs[:, 4:5]
        H_ref[:, 8:9] = hs[:, 5:6]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "corr")
)
def plicp_match_fused(
    src_pts: jax.Array,  # (B, N, 2)
    src_valid: jax.Array,  # (B, N)
    tgt_pts: jax.Array,  # (B, M, 2)
    tgt_valid: jax.Array,  # (B, M)
    cfg: PLICPConfig,
    init_pose: jax.Array | None = None,
    interpret: bool = False,
    corr: str = "auto",
):
    """Drop-in batched equivalent of ops/plicp.plicp_match (point-to-line
    config). Returns the same PLICPResult fields, including per-pair
    converged flags (CSM per-call termination: each pair freezes at its own
    epsilon and skips its correspondence matmuls thereafter).

    corr: correspondence strategy — "matmul" (per-pair MXU cross-term +
    one-hot gather matmuls) or "bcast" (direct (P,C,M) VPU broadcast
    distances, no per-pair loop). Both are exact full-NN with bit-identical
    results; "auto" picks by batch size (measured on v5e: bcast wins ≤16
    pairs where the matmul path is launch-latency-bound — 1.7 vs 2.2 ms at
    B=8 — and matmul wins at large batches where the MXU's free 9-way
    gather reduction dominates — 12 vs 19 ms at B=512)."""
    from tpu_slam.ops.plicp import PLICPResult

    B, N, _ = src_pts.shape
    M = tgt_pts.shape[1]
    dtype = src_pts.dtype
    if corr == "auto":
        corr = "bcast" if B <= 16 else "matmul"
    if init_pose is None:
        init_pose = jnp.zeros((B, 3), dtype)

    # sanitize exactly like the XLA path
    src_pts = jnp.where(
        src_valid[..., None] & jnp.isfinite(src_pts), src_pts, 0.0
    )
    tgt_pts = jnp.where(
        tgt_valid[..., None] & jnp.isfinite(tgt_pts), tgt_pts, 0.0
    )
    tgt_valid = tgt_valid & jnp.all(jnp.isfinite(tgt_pts), axis=-1)

    # pad the beam axes to a multiple of the kernel chunk (invalid beams).
    # M-padding keeps the bf16 split scratches lane-aligned (Mosaic rejects
    # unaligned bf16 lane extents); pad beams are invalid, so they lose the
    # NN by the BIG penalty and give the same validity-0 neighbor edge
    # semantics as the shifted-array clamp.
    npad = (-N) % 128
    if npad:
        src_pts = jnp.concatenate(
            [src_pts, jnp.zeros((B, npad, 2), dtype)], 1
        )
        src_valid = jnp.concatenate(
            [src_valid, jnp.zeros((B, npad), bool)], 1
        )
        N = N + npad
    mpad = (-M) % 128
    if mpad:
        tgt_pts = jnp.concatenate(
            [tgt_pts, jnp.zeros((B, mpad, 2), dtype)], 1
        )
        tgt_valid = jnp.concatenate(
            [tgt_valid, jnp.zeros((B, mpad), bool)], 1
        )
        M = M + mpad

    # small batches (single-pair odometry steps) stay at the minimum f32
    # sublane tile of 8 to avoid padding work; large batches amortize the
    # latency-bound (P, N) ops over 16 sublanes (measured +11% on v5e)
    P = PAIRS_PER_PROGRAM if B >= PAIRS_PER_PROGRAM else 8
    pad = (-B) % P
    if pad:
        z2 = jnp.zeros((pad, N, 2), dtype)
        src_pts = jnp.concatenate([src_pts, z2], 0)
        src_valid = jnp.concatenate([src_valid, jnp.zeros((pad, N), bool)], 0)
        tgt_pts = jnp.concatenate([tgt_pts, jnp.zeros((pad, M, 2), dtype)], 0)
        tgt_valid = jnp.concatenate(
            [tgt_valid, jnp.zeros((pad, M), bool)], 0
        )
        init_pose = jnp.concatenate([init_pose, jnp.zeros((pad, 3), dtype)], 0)
    Bp = B + pad

    tvf = tgt_valid.astype(dtype)
    spec2 = lambda cols: pl.BlockSpec(
        (P, cols), lambda b: (b, 0), memory_space=pltpu.VMEM
    )

    if corr == "bcast":
        # chunk the source-beam axis so the live (P, C, M) distance tile
        # stays well inside VMEM; neighbors come from one-hot idx±1 selects
        # so no shifted target arrays are needed.
        chunk = 128 if M <= 512 else 64
        kern = _make_kernel_bcast(cfg, N, M, chunk=chunk)
        pose, stats, Hf = pl.pallas_call(
            kern,
            grid=(Bp // P,),
            in_specs=[
                spec2(N), spec2(N), spec2(N),
                spec2(M), spec2(M), spec2(M),
                spec2(3),
            ],
            out_specs=[spec2(3), spec2(4), spec2(9)],
            out_shape=[
                jax.ShapeDtypeStruct((Bp, 3), dtype),
                jax.ShapeDtypeStruct((Bp, 4), dtype),
                jax.ShapeDtypeStruct((Bp, 9), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((P, N), dtype),
                pltpu.VMEM((P, N), dtype),
                pltpu.VMEM((P, N), dtype),
                pltpu.VMEM((P, 9, N), dtype),
            ],
            interpret=interpret,
        )(
            src_pts[..., 0], src_pts[..., 1], src_valid.astype(dtype),
            tgt_pts[..., 0], tgt_pts[..., 1], tvf,
            init_pose,
        )
        pose = pose[:B]
        H = Hf[:B].reshape(B, 3, 3)
        cov = cfg.sigma**2 * jnp.linalg.inv(
            H + 1e-6 * jnp.eye(3, dtype=dtype)
        )
        return PLICPResult(
            pose=pose,
            error=stats[:B, 0],
            num_inliers=stats[:B, 1].astype(jnp.int32),
            covariance=cov,
            converged=stats[:B, 2] > 0.5,
        )

    # beam-adjacent shifted targets (j1±1 candidates), edges invalidated —
    # matches second_point_on_segment's clamp+distance semantics
    def shift(a, by):
        return jnp.roll(a, by, axis=1)

    prev_x = shift(tgt_pts[..., 0], 1)
    prev_y = shift(tgt_pts[..., 1], 1)
    prev_v = shift(tvf, 1).at[:, 0].set(0.0)
    next_x = shift(tgt_pts[..., 0], -1)
    next_y = shift(tgt_pts[..., 1], -1)
    next_v = shift(tvf, -1).at[:, M - 1].set(0.0)

    # one chunk for typical scan sizes (N ≤ 512 post-padding): measured
    # 41.9k vs 39.2k scans/s on v5e vs 128-chunking (no loop, fewer
    # dynamic-slice round-trips); fall back to 128 for very long scans to
    # bound the live (C, M) tiles.
    chunk = N if N <= 512 else 128
    kern = _make_kernel(cfg, N, M, chunk=chunk)
    pose, stats, Hf = pl.pallas_call(
        kern,
        grid=(Bp // P,),
        in_specs=[
            spec2(N), spec2(N), spec2(N),
            spec2(M), spec2(M), spec2(M),
            spec2(M), spec2(M), spec2(M),
            spec2(M), spec2(M), spec2(M),
            spec2(3),
        ],
        out_specs=[spec2(3), spec2(4), spec2(9)],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 3), dtype),
            jax.ShapeDtypeStruct((Bp, 4), dtype),
            jax.ShapeDtypeStruct((Bp, 9), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, N), dtype),
            pltpu.VMEM((P, N), dtype),
            pltpu.VMEM((P, N), dtype),
            pltpu.VMEM((P, 9, N), dtype),
            pltpu.VMEM((P, 27, M), jnp.bfloat16),
            pltpu.VMEM((P, 12, M), jnp.bfloat16),
            pltpu.VMEM((P, 12, N), jnp.bfloat16),
            pltpu.VMEM((P, M), dtype),
        ],
        interpret=interpret,
    )(
        src_pts[..., 0], src_pts[..., 1], src_valid.astype(dtype),
        tgt_pts[..., 0], tgt_pts[..., 1], tvf,
        prev_x, prev_y, prev_v,
        next_x, next_y, next_v,
        init_pose,
    )
    pose = pose[:B]
    H = Hf[:B].reshape(B, 3, 3)
    cov = cfg.sigma**2 * jnp.linalg.inv(
        H + 1e-6 * jnp.eye(3, dtype=dtype)
    )
    return PLICPResult(
        pose=pose,
        error=stats[:B, 0],
        num_inliers=stats[:B, 1].astype(jnp.int32),
        covariance=cov,
        converged=stats[:B, 2] > 0.5,
    )
