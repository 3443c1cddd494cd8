"""Shared correspondence search for the ICP family.

TPU-native replacement for PCL's KD-tree correspondences
(`lesson2/src/scan_match_icp.cc:138-143`) and CSM's angular-window
correspondence tricks (`use_corr_tricks`, lesson3/src/plicp_odometry.cc:99).

At 2D-scan sizes (N ≲ 2k beams) exhaustive pairwise distances are a single
small matmul-shaped op — far better for the MXU than any tree or bucket
structure, and exact (no "tricks" to verify). ‖a−b‖² is expanded as
‖a‖² + ‖b‖² − 2a·b so the dominant term is one (N, 2)×(2, M) contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e12


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """(..., N, 2) × (..., M, 2) → (..., N, M) squared distances."""
    an = jnp.sum(a * a, axis=-1)[..., :, None]
    bn = jnp.sum(b * b, axis=-1)[..., None, :]
    cross = jnp.einsum(
        "...nd,...md->...nm", a, b, preferred_element_type=a.dtype
    )
    return an + bn - 2.0 * cross


def nearest_neighbor(
    src: jax.Array,
    tgt: jax.Array,
    tgt_valid: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """For each src point the index and squared distance of the nearest
    valid tgt point. Shapes: src (..., N, 2), tgt (..., M, 2) → ((..., N), (..., N))."""
    d2 = pairwise_sqdist(src, tgt)
    d2 = jnp.where(tgt_valid[..., None, :], d2, BIG)
    idx = jnp.argmin(d2, axis=-1)
    best = jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]
    return idx, best


def second_point_on_segment(
    idx: jax.Array, src_w: jax.Array, tgt: jax.Array, tgt_valid: jax.Array
) -> jax.Array:
    """CSM's second correspondence point: the better of the two beams adjacent
    to the nearest point j1 (csm sm/icp/icp_corr_*: j2 ∈ {j1−1, j1+1}).

    Returns indices (..., N) of j2 (clamped at scan ends; invalid neighbors
    lose by distance).
    """
    m = tgt.shape[-2]
    lo = jnp.clip(idx - 1, 0, m - 1)
    hi = jnp.clip(idx + 1, 0, m - 1)

    def d2_at(j):
        q = jnp.take_along_axis(tgt, j[..., None], axis=-2)
        v = jnp.take_along_axis(tgt_valid, j, axis=-1)
        d = jnp.sum((src_w - q) ** 2, axis=-1)
        return jnp.where(v & (j != idx), d, BIG)

    d_lo, d_hi = d2_at(lo), d2_at(hi)
    return jnp.where(d_lo <= d_hi, lo, hi)


def masked_quantile(x: jax.Array, mask: jax.Array, q: float) -> jax.Array:
    """Quantile of x over mask==True entries (per batch row, static shape).

    Used for CSM's outlier trimming percentiles (plicp_odometry.cc:139-156):
    invalid entries are pushed to +BIG, the quantile is taken at
    q·(count−1) in the sorted order via a gather.
    """
    n = x.shape[-1]
    xs = jnp.sort(jnp.where(mask, x, BIG), axis=-1)
    cnt = jnp.sum(mask, axis=-1)
    pos = jnp.clip(
        jnp.floor(q * jnp.maximum(cnt - 1, 0)).astype(jnp.int32), 0, n - 1
    )
    return jnp.take_along_axis(xs, pos[..., None], axis=-1)[..., 0]
