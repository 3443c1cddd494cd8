"""Pallas TPU kernel for the correlative response search.

The XLA path (`ops/correlative._responses_sliced`) evaluates the response
numerators of GetResponse (`lesson6/lib/open_karto/src/Mapper.cpp:819-856`)
over the whole (x, y) candidate lattice as one batched window load per beam
— measured 15-20 ms on v5e while touching only ~30 MB: it is bound by
gather/dispatch overhead of the vmapped dynamic slices, not bytes.

Here the correlation grid lives in VMEM as int8 (values 0..100, so the
2445² front-end grid is ~7 MB) and ONE kernel program covers ALL search
angles (`fori_loop` over angles, inner `fori_loop` over beam groups) — the
grid crosses HBM→VMEM once per match call, not once per angle.

Each beam's candidate lattice is extracted from the window at the
tile-ALIGNED start below its rotated cell offset (Mosaic requires provably
(32, 128)-aligned dynamic starts for int8) with two one-hot selection
matmuls on the MXU:

    lattice[r, c] = (Q_y @ window @ Q_x)[r, c]
                  = window[rem_y + r·stride, rem_x + c·stride]

Q_y/Q_x are 0/1 offset-diagonal matrices built from 2-D iotas; selections
of int8 grid values (≤ 100) are exact in bfloat16 with f32 accumulation,
so the kernel is int32-bit-identical to the XLA path.

At front-end lattice sizes the kernel is ISSUE-bound, not FLOP-bound (the
round-3 ablation: hoisting any one of the selector builds or the window
load moves nothing; an empty loop body costs 0.1 ms vs 2 ms full), so
BEAMS_PER_GROUP beams are stacked BLOCK-DIAGONALLY into one matmul pair
per group — 4× the (cheap, ~7% of roofline) MXU FLOPs for ¼ the serial
matmul issues, measured 1.55 → 0.77 ms on the 2445²/384-beam/21-angle
benchmark shape. Large (loop-matcher) lattices skip the stacking: there
the matmuls are big enough to be FLOP-bound and block-diag padding would
waste real compute.

Window start cells arrive via scalar prefetch (SMEM), clamped on the host
side with exactly the dynamic_slice clamp semantics of the XLA path.
Invalid beams multiply their (clamped, in-bounds) lattice by 0 instead of
branching — same contract as the XLA path's `jnp.where(valid, w, 0)`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BEAMS_PER_GROUP = 4  # v5e sweet spot (0.93/0.77/1.34 ms at B=2/4/8)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel(
    n_beams: int, n_angles: int, n_x: int, n_y: int, stride: int,
    s_y: int, s_x: int, n_yp: int, n_xp: int, B: int,
    grid_in_hbm: bool = False,
):
    """B beams per block-diagonal matmul pair; B=1 is the plain kernel.

    grid_in_hbm: the correlation grid stays HBM-resident and each beam's
    window arrives by explicit DMA into the win_ref scratch — required
    once the grid exceeds the 16 MB scoped-VMEM stack (outdoor 50 m
    range thresholds: 26-103 MB int8 grids). Below that the whole-grid
    VMEM block is kept: window reads are plain vector loads."""
    n_groups = n_beams // B

    def kernel(ys_ref, xs_ref, vld_ref, grid_ref, out_ref, acc_ref,
               win_ref, *maybe_sem):
        # block-diagonal iotas (2-D — 1-D doesn't lower), hoisted across
        # every (angle, group) iteration. Row r belongs to beam rb = r//n_yp
        # of the group; col c of the output to beam cb = c//n_xp.
        r4 = jax.lax.broadcasted_iota(jnp.int32, (B * n_yp, B * s_y), 0)
        k4 = jax.lax.broadcasted_iota(jnp.int32, (B * n_yp, B * s_y), 1)
        kq = jax.lax.broadcasted_iota(jnp.int32, (s_x, B * n_xp), 0)
        cq = jax.lax.broadcasted_iota(jnp.int32, (s_x, B * n_xp), 1)
        rb, rr = r4 // n_yp, r4 % n_yp
        kb, kk = k4 // s_y, k4 % s_y
        cb, cc = cq // n_xp, cq % n_xp

        def angle_body(a, _):
            acc_ref[...] = jnp.zeros_like(acc_ref)

            def body(g, _):
                i0 = g * B
                remy_rows = jnp.zeros((B * n_yp, 1), jnp.int32)
                remx_cols = jnp.zeros((1, B * n_xp), jnp.int32)
                vmask = jnp.zeros((1, B * n_xp), jnp.float32)
                for b in range(B):
                    k = a * n_beams + i0 + b
                    y0 = ys_ref[k]
                    x0 = xs_ref[k]
                    v = vld_ref[i0 + b]
                    y0a = (y0 // 32) * 32
                    x0a = (x0 // 128) * 128
                    if grid_in_hbm:
                        cp = pltpu.make_async_copy(
                            grid_ref.at[
                                pl.ds(y0a, s_y), pl.ds(x0a, s_x)
                            ],
                            win_ref.at[pl.ds(b * s_y, s_y), :],
                            maybe_sem[0],
                        )
                        cp.start()
                        cp.wait()
                    else:
                        win_ref[pl.ds(b * s_y, s_y), :] = grid_ref[
                            pl.ds(y0a, s_y), pl.ds(x0a, s_x)
                        ]
                    remy_rows = jnp.where(
                        rb[:, :1] == b, y0 - y0a, remy_rows
                    )
                    remx_cols = jnp.where(
                        cb[:1, :] == b, x0 - x0a, remx_cols
                    )
                    vmask = jnp.where(cb[:1, :] == b, v, vmask)
                # row selector: output row (b, r) reads window-b row
                # rem_y_b + r·stride; col selector likewise per beam block
                qy = (
                    (kb == rb) & (kk == remy_rows + rr * stride)
                    & (rr < n_y)
                ).astype(jnp.bfloat16)
                qx = (
                    (kq == remx_cols + cc * stride) & (cc < n_x)
                ).astype(jnp.bfloat16)
                wb = win_ref[...].astype(jnp.bfloat16)  # (B·s_y, s_x)
                sel = jnp.dot(qy, wb, preferred_element_type=jnp.float32)
                w = jnp.dot(
                    sel.astype(jnp.bfloat16), qx,
                    preferred_element_type=jnp.float32,
                )  # (B·n_yp, B·n_xp); beam b's lattice is diag block b
                w = w * vmask
                tot = jnp.zeros((n_yp, n_xp), jnp.float32)
                for b in range(B):
                    tot = tot + w[
                        b * n_yp : (b + 1) * n_yp, b * n_xp : (b + 1) * n_xp
                    ]
                # f32 adds of integer-valued terms ≤ 100·n_beams ≪ 2^24:
                # exact in any summation order → still int32-bit-identical
                acc_ref[...] += tot
                return 0

            jax.lax.fori_loop(0, n_groups, body, 0)
            out_ref[a] = acc_ref[...].astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, n_angles, angle_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_x", "n_y", "stride", "interpret"),
)
def responses_sliced_pallas(
    grid: jax.Array,  # (H, W) int32 correlation grid (W = 8-aligned stride)
    pts_cells: jax.Array,  # (N, 2) laser points / resolution
    beam_valid: jax.Array,  # (N,) bool
    angles: jax.Array,  # (A,)
    cand0_xy: jax.Array,  # (2,) int32 cell of the first candidate [x, y]
    n_x: int,
    n_y: int,
    stride: int,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for `_responses_sliced`: (A, nY*nX) int32."""
    H, W = grid.shape
    A = angles.shape[0]
    span_x = (n_x - 1) * stride + 1
    span_y = (n_y - 1) * stride + 1
    # grids past the scoped-VMEM stack stay HBM-resident with per-window
    # DMA (outdoor 50 m range thresholds); threshold leaves room for the
    # selectors + accumulators beside a VMEM-resident grid
    grid_in_hbm = H * W > 12_000_000
    # window sizes covering any intra-tile remainder; HBM DMAs need
    # 32-aligned sublane extents (int8 tile is (32, 128))
    s_y = _round_up(span_y + 32, 32 if grid_in_hbm else 8)
    s_x = _round_up(span_x + 128, 128)
    n_yp = _round_up(n_y, 8)
    n_xp = _round_up(n_x, 128)

    # block-diag beam stacking only where the matmuls are issue-bound
    # (front-end shapes); at loop-matcher lattices the B² FLOP growth and
    # VMEM footprint outweigh the issue savings
    B = BEAMS_PER_GROUP if (n_yp <= 32 and n_xp <= 128) else 1
    pad = (-pts_cells.shape[0]) % B
    if pad:
        pts_cells = jnp.concatenate(
            [pts_cells, jnp.zeros((pad, 2), pts_cells.dtype)]
        )
        beam_valid = jnp.concatenate(
            [beam_valid, jnp.zeros((pad,), beam_valid.dtype)]
        )
    N = pts_cells.shape[0]

    # padded int8 grid: rows/cols [0, H)×[0, W) hold true data; aligned-down
    # loads plus the remainder never reach past the clamped start + span, and
    # the pad region only feeds selector rows that are masked off.
    gy = _round_up(H + s_y, 32)
    gx = _round_up(W + s_x, 128)
    grid8 = jnp.zeros((gy, gx), jnp.int8)
    grid8 = jax.lax.dynamic_update_slice(
        grid8, jnp.clip(grid, -128, 127).astype(jnp.int8), (0, 0)
    )

    # rotated beam cell offsets — the same rounding as the XLA path
    # (math::Round = half away from zero, GridIndexLookup::ComputeOffsets,
    # Karto.h:6455-6500)
    from tpu_slam.ops.correlative import kround

    c = jnp.cos(angles)[:, None]
    s = jnp.sin(angles)[:, None]
    ox = kround(c * pts_cells[None, :, 0] - s * pts_cells[None, :, 1])
    oy = kround(s * pts_cells[None, :, 0] + c * pts_cells[None, :, 1])
    # absolute window starts with dynamic_slice clamp semantics on the
    # UNPADDED grid (starts clipped to [0, dim - span])
    xs = jnp.clip(
        cand0_xy[0] + ox.astype(jnp.int32), 0, W - span_x
    ).reshape(-1)
    ys = jnp.clip(
        cand0_xy[1] + oy.astype(jnp.int32), 0, H - span_y
    ).reshape(-1)
    vld = beam_valid.astype(jnp.float32)

    scratch = [
        pltpu.VMEM((n_yp, n_xp), jnp.float32),
        pltpu.VMEM((B * s_y, s_x), jnp.int8),
    ]
    if grid_in_hbm:
        scratch.append(pltpu.SemaphoreType.DMA)
        grid_spec_in = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    else:
        grid_spec_in = pl.BlockSpec((gy, gx), lambda a, *refs: (0, 0))
    out = pl.pallas_call(
        _make_kernel(N, A, n_x, n_y, stride, s_y, s_x, n_yp, n_xp, B,
                     grid_in_hbm=grid_in_hbm),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(1,),
            in_specs=[grid_spec_in],
            out_specs=pl.BlockSpec(
                (A, n_yp, n_xp), lambda a, *refs: (0, 0, 0)
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((A, n_yp, n_xp), jnp.int32),
        interpret=interpret,
    )(ys, xs, vld, grid8)

    return out[:, :n_y, :n_x].reshape(A, n_y * n_x)
