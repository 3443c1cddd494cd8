"""Occupancy-grid substrate: ray rasterization + three cell models.

TPU-native replacement for the reference's three grid stacks:
  * Hector log-odds grids + per-scan dedup update
    (`lesson4/include/lesson4/hector_mapping/map/OccGridMapBase.h:118-330`,
    `GridMapLogOdds.h:37-161`)
  * GMapping hit/visit counters over Bresenham rays
    (`lesson4/src/gmapping/gmapping.cc:87-242`, `grid/gridlinetraversal.h`)
  * Karto pass/hit occupancy built from all scans
    (`open_karto/include/open_karto/Karto.h:5609-6039`)

Design (SURVEY §7 stage 4): instead of per-beam Bresenham loops, every ray is
sampled at a fixed sub-resolution step — a static (beams × samples) tensor of
cell indices — and cell updates become masked scatters. The reference's
"mark each cell at most once per scan, occupied beats free" update-index trick
(OccGridMapBase.h:302-330) becomes two boolean scatter-max masks combined as
``occ ∪ (free ∖ occ)``, which reproduces the semantics exactly and has no
write-order hazards (scatter-max of booleans is associative).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_slam.config import GridConfig, LogOddsConfig


def world_to_cell(cfg: GridConfig, xy: jax.Array) -> jax.Array:
    """World coords → fractional cell coords (x-col, y-row), (...,2)."""
    return (xy - jnp.asarray([cfg.origin_x, cfg.origin_y], xy.dtype)) / cfg.resolution


def cell_to_world(cfg: GridConfig, cxy: jax.Array) -> jax.Array:
    return cxy * cfg.resolution + jnp.asarray(
        [cfg.origin_x, cfg.origin_y], cxy.dtype
    )


# sentinel for "skip this cell": a large positive index that is out of bounds
# for any realistic grid, so `.at[].op(mode="drop")` discards it. (A -1
# sentinel would WRAP to the last cell under numpy-style negative indexing.)
OOB_INDEX = 1 << 30

# epsilon (in cells) so endpoints that land exactly on a cell border under
# f32 arithmetic (e.g. 94.0 computed as 93.99999) fall in the intended cell
_CELL_EPS = 1e-3


def cell_index(cfg: GridConfig, cxy: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Fractional cell coords → (flat row-major index, inbounds mask).

    Out-of-bounds returns OOB_INDEX, which `.at[].op(mode="drop")` discards —
    the vectorized form of the reference's pointOutOfMapBounds/IsUpTo guards.
    """
    ix = jnp.floor(cxy[..., 0] + _CELL_EPS).astype(jnp.int32)
    iy = jnp.floor(cxy[..., 1] + _CELL_EPS).astype(jnp.int32)
    inb = (ix >= 0) & (ix < cfg.size_x) & (iy >= 0) & (iy < cfg.size_y)
    flat = jnp.where(inb, iy * cfg.size_x + ix, OOB_INDEX)
    return flat, inb


def ray_cell_indices(
    cfg: GridConfig,
    origin_xy: jax.Array,
    endpoints: jax.Array,
    valid: jax.Array,
    step_frac: float = 0.7,
    max_range: float | None = None,
    stop_before_end: bool = True,
):
    """Sample every beam at ``step_frac × resolution`` along the ray.

    Returns (free_idx (N, S) int32 flat indices with OOB_INDEX = skip,
             end_idx (N,) endpoint indices with OOB_INDEX = skip).
    Free samples stop one resolution short of the endpoint so the endpoint
    cell is never marked free by its own beam (bresenham2D stops before the
    end cell, OccGridMapBase.h:270-313). Rays are truncated at ``max_range``.
    """
    d = endpoints - origin_xy[..., None, :]
    r = jnp.linalg.norm(d, axis=-1)
    r_safe = jnp.maximum(r, 1e-9)
    dirn = d / r_safe[..., None]
    if max_range is None:
        max_range = cfg.resolution * max(cfg.size_x, cfg.size_y)
    n_samples = int(max_range / (cfg.resolution * step_frac)) + 1

    t = (
        jnp.arange(n_samples, dtype=endpoints.dtype)
        * (cfg.resolution * step_frac)
    )
    # (..., N, S, 2) sample points
    pts = (
        origin_xy[..., None, None, :]
        + dirn[..., :, None, :] * t[None, :, None]
    )
    margin = cfg.resolution if stop_before_end else 0.0
    free_ok = (
        valid[..., None]
        & (t < (jnp.minimum(r, max_range) - margin)[..., None])
    )
    free_flat, free_inb = cell_index(cfg, world_to_cell(cfg, pts))
    free_idx = jnp.where(free_ok & free_inb, free_flat, OOB_INDEX)

    end_ok = valid & (r <= max_range)
    end_flat, end_inb = cell_index(cfg, world_to_cell(cfg, endpoints))
    end_idx = jnp.where(end_ok & end_inb, end_flat, OOB_INDEX)
    return free_idx, end_idx


def scan_masks(
    cfg: GridConfig,
    origin_xy: jax.Array,
    endpoints: jax.Array,
    valid: jax.Array,
    max_range: float | None = None,
):
    """Per-scan boolean (free, occ) cell masks with reference dedup semantics:
    each cell at most once per scan; endpoint (occupied) wins over free
    (OccGridMapBase.h:302-330 update-index stamps)."""
    ncells = cfg.size_x * cfg.size_y
    # free samples run all the way to the endpoint: the occupied-beats-free
    # combination below removes endpoint cells, matching Bresenham's
    # stop-before-end without losing the near-endpoint free band
    free_idx, end_idx = ray_cell_indices(
        cfg, origin_xy, endpoints, valid, max_range=max_range,
        stop_before_end=False,
    )
    free = jnp.zeros((ncells,), bool).at[free_idx.reshape(-1)].max(
        True, mode="drop"
    )
    occ = jnp.zeros((ncells,), bool).at[end_idx.reshape(-1)].max(
        True, mode="drop"
    )
    return free & ~occ, occ


def logodds_factors(cfg: LogOddsConfig, dtype=jnp.float32):
    """log(p/(1−p)) update increments (GridMapLogOdds.h:120-161)."""
    import math

    lo_free = math.log(cfg.p_free / (1.0 - cfg.p_free))
    lo_occ = math.log(cfg.p_occupied / (1.0 - cfg.p_occupied))
    return jnp.asarray(lo_free, dtype), jnp.asarray(lo_occ, dtype)


def logodds_update_scan(
    grid: jax.Array,
    cfg: GridConfig,
    locfg: LogOddsConfig,
    origin_xy: jax.Array,
    endpoints: jax.Array,
    valid: jax.Array,
    max_range: float | None = None,
) -> jax.Array:
    """One scan's log-odds update (updateByScan, OccGridMapBase.h:118-168).

    grid: flat (size_y*size_x,) log-odds array. Occupied cells are capped at
    ``log_odds_max`` (the `isOccupied` 50.0 cap, GridMapLogOdds.h:60).
    """
    free, occ = scan_masks(cfg, origin_xy, endpoints, valid, max_range)
    lo_free, lo_occ = logodds_factors(locfg, grid.dtype)
    upd = jnp.where(occ, lo_occ, jnp.where(free, lo_free, 0.0))
    return jnp.clip(grid + upd, locfg.log_odds_min, locfg.log_odds_max)


def occupancy_prob(grid: jax.Array) -> jax.Array:
    """Log-odds → probability: odds/(1+odds) (GridMapLogOdds.h:102-112)."""
    return jax.nn.sigmoid(grid)


def counts_update_scan(
    hits: jax.Array,
    visits: jax.Array,
    cfg: GridConfig,
    origin_xy: jax.Array,
    endpoints: jax.Array,
    valid: jax.Array,
    max_range: float | None = None,
    acc: jax.Array | None = None,
):
    """GMapping per-beam counters, **no** per-scan dedup: every beam's ray
    increments visits along the line and (visits, hits) at the endpoint
    (gmapping.cc:146-229, PointAccumulator grid/map.h:17-48).

    Count-valued scatter-adds: overlapping beams accumulate, exactly like the
    sequential Bresenham loops. If ``acc`` (cells, 2) is given, hit world
    positions are accumulated into it too and it is returned as a third
    output (PointAccumulator's acc field).
    """
    free_idx, end_idx = ray_cell_indices(
        cfg, origin_xy, endpoints, valid, max_range=max_range
    )
    # dedup per-beam (a ray can sample one cell twice at sub-res steps, the
    # Bresenham line visits it once): drop a sample whose cell equals the
    # previous sample's cell
    prev = jnp.concatenate(
        [jnp.full_like(free_idx[..., :1], OOB_INDEX + 1), free_idx[..., :-1]],
        axis=-1,
    )
    uniq = jnp.where(free_idx != prev, free_idx, OOB_INDEX)
    visits = visits.at[uniq.reshape(-1)].add(1, mode="drop")
    visits = visits.at[end_idx.reshape(-1)].add(1, mode="drop")
    hits = hits.at[end_idx.reshape(-1)].add(1, mode="drop")
    if acc is None:
        return hits, visits
    # PointAccumulator hit-position accumulation (grid/map.h:17-48:
    # `acc.x += hit.x; acc.y += hit.y` on every endpoint update): the same
    # endpoints that increment `hits` contribute their world coordinates
    acc = acc.at[end_idx.reshape(-1)].add(
        endpoints.reshape(-1, 2).astype(acc.dtype), mode="drop"
    )
    return hits, visits, acc


def counts_mean(acc: jax.Array, hits: jax.Array) -> jax.Array:
    """Per-cell mean hit position (PointAccumulator::mean, grid/map.h:17-48);
    cells with no hits → 0."""
    return acc / jnp.maximum(hits, 1)[..., None].astype(acc.dtype)


def counts_occupancy(
    hits: jax.Array, visits: jax.Array, threshold: float = 0.25
) -> jax.Array:
    """GMapping cell value: n/visits > threshold ⇒ occupied
    (gmapping.cc:146-158). Returns float fraction; never-visited cells → 0."""
    return hits / jnp.maximum(visits, 1)


def karto_counts_update_scan(
    pass_cnt: jax.Array,
    hit_cnt: jax.Array,
    cfg: GridConfig,
    origin_xy: jax.Array,
    endpoints: jax.Array,
    valid: jax.Array,
    range_threshold: float,
):
    """Karto RayTrace + UpdateCell counters (Karto.h:5852-5968): free cells
    along the ray increment pass; a valid endpoint increments pass and hit.
    Beams longer than range_threshold trace free up to the threshold without
    a hit (isEndpointValid, Karto.h:5913-5933)."""
    d = endpoints - origin_xy[..., None, :]
    r = jnp.linalg.norm(d, axis=-1)
    clipped_end = origin_xy[..., None, :] + d / jnp.maximum(r, 1e-9)[
        ..., None
    ] * jnp.minimum(r, range_threshold)[..., None]
    free_idx, end_idx = ray_cell_indices(
        cfg, origin_xy, clipped_end, valid, max_range=range_threshold
    )
    prev = jnp.concatenate(
        [jnp.full_like(free_idx[..., :1], OOB_INDEX + 1), free_idx[..., :-1]],
        axis=-1,
    )
    uniq = jnp.where(free_idx != prev, free_idx, OOB_INDEX)
    pass_cnt = pass_cnt.at[uniq.reshape(-1)].add(1, mode="drop")
    endpoint_valid = valid & (r <= range_threshold)
    end_idx = jnp.where(endpoint_valid, end_idx, OOB_INDEX)
    pass_cnt = pass_cnt.at[end_idx.reshape(-1)].add(1, mode="drop")
    hit_cnt = hit_cnt.at[end_idx.reshape(-1)].add(1, mode="drop")
    return pass_cnt, hit_cnt


def karto_occupancy(
    pass_cnt: jax.Array,
    hit_cnt: jax.Array,
    min_pass_through: int = 2,
    occupancy_threshold: float = 0.1,
) -> jax.Array:
    """Karto cell state (UpdateCell, Karto.h:5953-5968): occupied iff
    pass > MinPassThrough ∧ hit/pass ≥ OccupancyThreshold; free iff passed;
    else unknown. Returns int8: -1 unknown, 0 free, 100 occupied."""
    passed = pass_cnt > min_pass_through
    frac = hit_cnt / jnp.maximum(pass_cnt, 1)
    occ = passed & (frac >= occupancy_threshold)
    return jnp.where(occ, 100, jnp.where(passed, 0, -1)).astype(jnp.int8)


def logodds_to_ros(
    grid: jax.Array, obstacle_threshold: float = 0.0
) -> jax.Array:
    """Hector grid → nav_msgs-style int8 map (hector_slam.cc:270-317):
    occupied→100, free→0, untouched→-1. One device op replacing the
    ~50 ms/publish conversion loop (SURVEY §6)."""
    occupied = grid > obstacle_threshold
    free = grid < 0.0
    touched = grid != 0.0
    return jnp.where(
        occupied, 100, jnp.where(free & touched, 0, -1)
    ).astype(jnp.int8)
