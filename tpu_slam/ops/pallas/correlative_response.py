"""Pallas TPU kernel for the correlative response search.

The XLA path (`ops/correlative._responses_sliced`) evaluates the response
numerators of GetResponse (`lesson6/lib/open_karto/src/Mapper.cpp:819-856`)
over the whole (x, y) candidate lattice as one batched window load per beam
— measured 15-20 ms on v5e while touching only ~30 MB: it is bound by
gather/dispatch overhead of the vmapped dynamic slices, not bytes.

Here the correlation grid lives in VMEM as int8 (values 0..100, so the
2445² front-end grid is ~7 MB) and ONE kernel program per search angle runs
a `fori_loop` over beams. Each step loads the beam's window at the
tile-ALIGNED start below its rotated cell offset (Mosaic requires provably
(32, 128)-aligned dynamic starts for int8), then extracts the strided
candidate lattice with two one-hot selection matmuls on the MXU:

    lattice[r, c] = (Q_y @ window @ Q_x)[r, c]
                  = window[rem_y + r·stride, rem_x + c·stride]

Q_y/Q_x are 0/1 offset-diagonal matrices built from 2-D iotas; selections
of int8 grid values (≤ 100) are exact in bfloat16 with f32 accumulation,
so the kernel is int32-bit-identical to the XLA path. (A first attempt
used `pltpu.roll` for the intra-tile shift; its dynamic-shift lowering is
wrong for blocks spanning more than two tiles in this toolchain.)

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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel(
    n_beams: int, n_x: int, n_y: int, stride: int,
    s_y: int, s_x: int, n_yp: int, n_xp: int,
):
    def kernel(ys_ref, xs_ref, vld_ref, grid_ref, out_ref, acc_ref):
        a = pl.program_id(0)

        acc_ref[...] = jnp.zeros_like(acc_ref)

        # iotas for the one-hot selectors (2-D iota — 1-D doesn't lower)
        ry = jax.lax.broadcasted_iota(jnp.int32, (n_yp, s_y), 0)
        ky = jax.lax.broadcasted_iota(jnp.int32, (n_yp, s_y), 1)
        kx = jax.lax.broadcasted_iota(jnp.int32, (s_x, n_xp), 0)
        cx = jax.lax.broadcasted_iota(jnp.int32, (s_x, n_xp), 1)

        def body(i, _):
            k = a * n_beams + i
            y0 = ys_ref[k]
            x0 = xs_ref[k]
            v = vld_ref[i]
            y0a = (y0 // 32) * 32
            x0a = (x0 // 128) * 128
            wb = grid_ref[
                pl.ds(y0a, s_y), pl.ds(x0a, s_x)
            ].astype(jnp.bfloat16)
            # row selector: lattice row r reads window row rem_y + r·stride
            qy = (
                (ky == (y0 - y0a) + ry * stride) & (ry < n_y)
            ).astype(jnp.bfloat16)
            qx = (
                (kx == (x0 - x0a) + cx * stride) & (cx < n_x)
            ).astype(jnp.bfloat16)
            sel = jnp.dot(qy, wb, preferred_element_type=jnp.float32)
            w = jnp.dot(
                sel.astype(jnp.bfloat16), qx,
                preferred_element_type=jnp.float32,
            )
            acc_ref[...] += w * v
            return 0

        jax.lax.fori_loop(0, n_beams, body, 0)
        out_ref[0] = acc_ref[...].astype(jnp.int32)

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
    N = pts_cells.shape[0]
    A = angles.shape[0]
    span_x = (n_x - 1) * stride + 1
    span_y = (n_y - 1) * stride + 1
    # window sizes covering any intra-tile remainder
    s_y = _round_up(span_y + 32, 8)
    s_x = _round_up(span_x + 128, 128)
    n_yp = _round_up(n_y, 8)
    n_xp = _round_up(n_x, 128)

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

    out = pl.pallas_call(
        _make_kernel(N, n_x, n_y, stride, s_y, s_x, n_yp, n_xp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(A,),
            in_specs=[
                pl.BlockSpec((gy, gx), lambda a, *refs: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, n_yp, n_xp), lambda a, *refs: (a, 0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((n_yp, n_xp), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((A, n_yp, n_xp), jnp.int32),
        interpret=interpret,
    )(ys, xs, vld, grid8)

    return out[:, :n_y, :n_x].reshape(A, n_y * n_x)
