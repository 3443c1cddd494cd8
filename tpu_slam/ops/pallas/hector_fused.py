"""Fully-fused Hector multi-resolution GN match: ONE Pallas kernel.

The XLA path (ops/hector.py match_multires) executes ~12 sequential GN
iterations of small ops (rotate 360 points, 4 bilinear gathers, 3x3
assembly/solve) — measured 3.4 ms on v5e, dominated by intra-program
launch/HBM overhead of dozens of tiny kernels. Here the whole pyramid match
(coarse→fine, every iteration) runs in one launch with all three grids
resident in VMEM (4+1+0.25 MB):

  * the per-beam bilinear 4-neighbor fetch becomes two one-hot row matmuls
    on the MXU (rows y0/y0+1 of the grid for all beams at once) + masked
    lane reductions for the x0/x0+1 columns — zero gathers;
  * H/dTr accumulation, the cofactor 3x3 solve, and the ±0.2 rad clamp
    (ScanMatcher.h:107-139) are VPU scalar math in the loop carry;
  * level changes are static (python loop): pose rescaled between
    resolutions exactly like MapRepMultiMap::matchData (MapRepMultiMap.h:
    144-167).

Semantics mirror ops/hector.py bit-for-bit in structure (same cell-center
query, same bounds test, same iteration counts 1+N per level); tests compare
the two paths on identical inputs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_slam.config import GridConfig, HectorConfig

BEAM_PAD = 128  # beam axis padded to lane multiples


def _norm_angle(th):
    two_pi = 6.283185307179586
    return th - two_pi * jnp.floor((th + 3.141592653589793) / two_pi)


def _solve3(h00, h01, h02, h11, h12, h22, b0, b1, b2):
    """Symmetric 3x3 solve by cofactors; (1,1) scalars."""
    c00 = h11 * h22 - h12 * h12
    c01 = h02 * h12 - h01 * h22
    c02 = h01 * h12 - h02 * h11
    det = h00 * c00 + h01 * c01 + h02 * c02
    inv = 1.0 / jnp.where(det != 0.0, det, 1.0)
    c11 = h00 * h22 - h02 * h02
    c12 = h01 * h02 - h00 * h12
    c22 = h00 * h11 - h01 * h01
    d0 = (c00 * b0 + c01 * b1 + c02 * b2) * inv
    d1 = (c01 * b0 + c11 * b1 + c12 * b2) * inv
    d2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv
    ok = (det != 0.0).astype(h00.dtype)
    return d0 * ok, d1 * ok, d2 * ok


def _make_kernel(
    levels, iters_fine, iters_coarse, max_rot_step, n_beams, windows
):
    """levels: list of (size_x, size_y, resolution, origin_x, origin_y),
    index 0 = finest (matching runs len-1 → 0). windows: per-level
    (Wy, Wx) VMEM working window, or None for the full grid — all beams
    lie within ``range_max`` of the pose, so a pose-centered window
    bounds the one-hot gather matmuls by the SCAN extent instead of the
    map extent (the reference touches only the cells a beam hits too —
    the full-grid matmul was pure MXU waste)."""
    L = len(levels)

    def kernel(*refs):
        grid_refs = refs[:L]
        px_ref, py_ref, w_ref, pose0_ref = refs[L : L + 4]
        pose_ref, H_ref = refs[L + 4 :]

        lx = px_ref[:]  # (Np, 1) laser-frame meters
        ly = py_ref[:]
        w = w_ref[:]
        # world pose scalars as (1, 1)
        pwx = pose0_ref[0:1, 0:1]
        pwy = pose0_ref[0:1, 1:2]
        pth = pose0_ref[0:1, 2:3]
        Hacc = (pwx * 0.0,) * 6  # (h00,h01,h02,h11,h12,h22)

        for lvl in range(L - 1, -1, -1):
            size_x, size_y, res, ox, oy = levels[lvl]
            iters = (iters_fine if lvl == 0 else iters_coarse) + 1
            inv_res = 1.0 / res
            ptsx = lx * inv_res  # (Np, 1) map units
            ptsy = ly * inv_res
            pmx = (pwx - ox) * inv_res
            pmy = (pwy - oy) * inv_res

            if windows[lvl] is not None:
                # pose-centered working window, fixed across this level's
                # iterations (DRIFT_MARGIN covers the GN pose motion)
                Wy, Wx = windows[lvl]
                # tile-aligned base (Mosaic-safe dynamic slice); the window
                # width carries the alignment slack, so coverage of
                # pose ± (range + DRIFT_MARGIN) survives the align-down
                yb = jnp.clip(
                    jnp.floor(pmy[0, 0]).astype(jnp.int32) - Wy // 2,
                    0, size_y - Wy,
                ) // 8 * 8
                if Wx < size_x:
                    xb = jnp.clip(
                        jnp.floor(pmx[0, 0]).astype(jnp.int32) - Wx // 2,
                        0, size_x - Wx,
                    ) // 128 * 128
                    grid = grid_refs[lvl][pl.ds(yb, Wy), pl.ds(xb, Wx)]
                else:
                    # rows-only window: lane dim stays full + statically
                    # indexed (no lane-dim dynamic slice)
                    xb = jnp.int32(0)
                    grid = grid_refs[lvl][pl.ds(yb, Wy), :]
            else:
                Wy, Wx = size_y, size_x
                yb = jnp.int32(0)
                xb = jnp.int32(0)
                grid = grid_refs[lvl][:]  # (size_y, size_x) occupancy prob

            iota_y = jax.lax.broadcasted_iota(
                jnp.int32, (n_beams, Wy), 1
            )
            iota_x = jax.lax.broadcasted_iota(
                jnp.int32, (n_beams, Wx), 1
            )

            def body(_, carry):
                pmx, pmy, pth, *_h = carry
                c = jnp.cos(pth)
                s = jnp.sin(pth)
                wx = c * ptsx - s * ptsy + pmx  # (Np, 1)
                wy = s * ptsx + c * ptsy + pmy
                xq = wx - 0.5  # cell-center query (ops/hector.py:77-82)
                yq = wy - 0.5
                inb = (
                    (xq >= 0.0) & (yq >= 0.0)
                    & (xq < size_x - 1) & (yq < size_y - 1)
                ).astype(wx.dtype)
                x0 = jnp.clip(
                    jnp.floor(xq).astype(jnp.int32), 0, size_x - 2
                )
                y0 = jnp.clip(
                    jnp.floor(yq).astype(jnp.int32), 0, size_y - 2
                )
                fx = xq - x0.astype(wx.dtype)
                fy = yq - y0.astype(wx.dtype)
                # window-relative cell indices; a beam outside the working
                # window (possible only if GN diverged past DRIFT_MARGIN)
                # gets an all-zero one-hot + inb gate = the same zero
                # contribution as an out-of-map beam
                y0 = y0 - yb
                x0 = x0 - xb
                if windows[lvl] is not None:
                    inb = inb * (
                        (x0 >= 0) & (x0 + 1 <= Wx - 1)
                        & (y0 >= 0) & (y0 + 1 <= Wy - 1)
                    ).astype(wx.dtype)

                # rows y0 / y0+1 for every beam: one-hot matmuls (MXU)
                ohy0 = (iota_y == y0).astype(wx.dtype)  # (Np, Wy)
                ohy1 = (iota_y == y0 + 1).astype(wx.dtype)
                R0 = jnp.dot(
                    ohy0, grid, preferred_element_type=wx.dtype
                )  # (Np, size_x)
                R1 = jnp.dot(ohy1, grid, preferred_element_type=wx.dtype)
                # columns x0 / x0+1: masked lane reductions (VPU)
                ohx0 = (iota_x == x0).astype(wx.dtype)
                ohx1 = (iota_x == x0 + 1).astype(wx.dtype)
                p00 = jnp.sum(R0 * ohx0, axis=1, keepdims=True)
                p10 = jnp.sum(R0 * ohx1, axis=1, keepdims=True)
                p01 = jnp.sum(R1 * ohx0, axis=1, keepdims=True)
                p11 = jnp.sum(R1 * ohx1, axis=1, keepdims=True)

                xi = 1.0 - fx
                yi = 1.0 - fy
                val = (p00 * xi + p10 * fx) * yi + (p01 * xi + p11 * fx) * fy
                dx = -((p00 - p10) * yi + (p01 - p11) * fy)
                dy = -((p00 - p01) * xi + (p10 - p11) * fx)
                g = inb * w  # bounds + validity gate
                val = val * inb
                dx = dx * inb
                dy = dy * inb

                rot = (
                    (-s * ptsx - c * ptsy) * dx
                    + (c * ptsx - s * ptsy) * dy
                )
                jx = dx * w
                jy = dy * w
                jt = rot * w
                r = 1.0 - val
                h00 = jnp.sum(jx * jx)[None, None]
                h01 = jnp.sum(jx * jy)[None, None]
                h02 = jnp.sum(jx * jt)[None, None]
                h11 = jnp.sum(jy * jy)[None, None]
                h12 = jnp.sum(jy * jt)[None, None]
                h22 = jnp.sum(jt * jt)[None, None]
                b0 = jnp.sum(jx * r)[None, None]
                b1 = jnp.sum(jy * r)[None, None]
                b2 = jnp.sum(jt * r)[None, None]

                d0, d1, d2 = _solve3(
                    h00 + 1e-9, h01, h02, h11 + 1e-9, h12, h22 + 1e-9,
                    b0, b1, b2,
                )
                fin = (
                    jnp.isfinite(d0) & jnp.isfinite(d1) & jnp.isfinite(d2)
                ).astype(wx.dtype)
                ok = ((h00 != 0.0) & (h11 != 0.0)).astype(wx.dtype) * fin
                d2 = jnp.clip(d2, -max_rot_step, max_rot_step)
                return (
                    pmx + d0 * ok, pmy + d1 * ok, pth + d2 * ok,
                    h00, h01, h02, h11, h12, h22,
                )

            z = pmx * 0.0
            pmx, pmy, pth, *Hacc = jax.lax.fori_loop(
                0, iters, body, (pmx, pmy, pth, z, z, z, z, z, z)
            )
            pth = _norm_angle(pth)
            pwx = pmx * res + ox
            pwy = pmy * res + oy

        pose_ref[0:1, 0:1] = pwx
        pose_ref[0:1, 1:2] = pwy
        pose_ref[0:1, 2:3] = pth
        h00, h01, h02, h11, h12, h22 = Hacc
        H_ref[0:1, 0:1] = h00
        H_ref[0:1, 1:2] = h01
        H_ref[0:1, 2:3] = h02
        H_ref[0:1, 3:4] = h01
        H_ref[0:1, 4:5] = h11
        H_ref[0:1, 5:6] = h12
        H_ref[0:1, 6:7] = h02
        H_ref[0:1, 7:8] = h12
        H_ref[0:1, 8:9] = h22

    return kernel


DRIFT_MARGIN = 24  # cells of GN pose motion tolerated within one level


def _level_window(size_y, size_x, res, max_range_m):
    """Pose-centered working window (Wy, Wx) for one pyramid level, or
    None when it wouldn't be smaller than the grid. All beams lie within
    max_range of the pose, so a window of 2·(range+margin) cells bounds
    every bilinear access; the window base is fixed at level entry and
    DRIFT_MARGIN absorbs the pose motion of the level's GN iterations.
    The base is aligned down to the TPU tile (8 sublanes / 128 lanes), so
    the width carries one extra tile of slack to keep full coverage."""
    if max_range_m is None:
        return None
    half = int(math.ceil(max_range_m / res)) + DRIFT_MARGIN + 2
    Wy = min(size_y, -(-(2 * half + 16) // 8) * 8)
    Wx = min(size_x, -(-(2 * half + 256) // 128) * 128)
    if Wy >= size_y and Wx >= size_x:
        return None
    return (Wy, Wx)


@functools.partial(
    jax.jit, static_argnames=("grid_cfgs", "hcfg", "interpret", "max_range_m")
)
def hector_match_fused(
    prob_grids: tuple,
    grid_cfgs: tuple,
    hcfg: HectorConfig,
    pose_world: jax.Array,  # (3,)
    pts_laser: jax.Array,  # (N, 2) laser-frame meters
    valid: jax.Array,  # (N,)
    interpret: bool = False,
    max_range_m: float | None = None,
):
    """Drop-in fused equivalent of ops/hector.match_multires.

    prob_grids: per-level occupancy-prob grids shaped (size_y, size_x),
    level 0 finest. max_range_m: sensor range bound — enables the
    pose-centered gather window (identical results while the match stays
    within DRIFT_MARGIN cells of the initial pose, i.e. always in
    practice). Returns (pose_world (3,), H (3,3) of the finest level's
    last step)."""
    dtype = pts_laser.dtype
    N = pts_laser.shape[0]
    npad = (-N) % BEAM_PAD
    pts = jnp.where(valid[:, None], pts_laser, 0.0)
    w = valid.astype(dtype)
    if npad:
        pts = jnp.concatenate([pts, jnp.zeros((npad, 2), dtype)], 0)
        w = jnp.concatenate([w, jnp.zeros((npad,), dtype)], 0)
    Np = N + npad

    levels = tuple(
        (g.size_x, g.size_y, float(g.resolution),
         float(g.origin_x), float(g.origin_y))
        for g in grid_cfgs
    )
    windows = tuple(
        _level_window(g.size_y, g.size_x, float(g.resolution), max_range_m)
        for g in grid_cfgs
    )
    kern = _make_kernel(
        levels, hcfg.iterations_fine, hcfg.iterations_coarse,
        float(hcfg.max_rot_step), Np, windows,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    pose, Hf = pl.pallas_call(
        kern,
        in_specs=[vspec] * (len(prob_grids) + 4),
        out_specs=[vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((1, 3), dtype),
            jax.ShapeDtypeStruct((1, 9), dtype),
        ],
        interpret=interpret,
    )(
        *[g.astype(dtype) for g in prob_grids],
        pts[:, 0:1], pts[:, 1:2], w[:, None],
        pose_world.reshape(1, 3),
    )
    return pose[0], Hf.reshape(3, 3)
