import jax.numpy as jnp
import numpy as np

from tpu_slam.config import GridConfig, LogOddsConfig, ScanConfig
from tpu_slam.data import simulator as sim
from tpu_slam.ops import gridmap as gm


CFG = GridConfig(resolution=0.1, size_x=128, size_y=128, origin_x=-6.4, origin_y=-6.4)
LO = LogOddsConfig()


def test_world_cell_roundtrip():
    xy = jnp.array([[0.0, 0.0], [1.0, -2.0]])
    c = gm.world_to_cell(CFG, xy)
    np.testing.assert_allclose(np.asarray(gm.cell_to_world(CFG, c)), np.asarray(xy), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c[0]), [64.0, 64.0])


def test_cell_index_bounds():
    c = jnp.array([[0.5, 0.5], [-1.0, 3.0], [127.5, 127.5], [128.0, 5.0]])
    flat, inb = gm.cell_index(CFG, c)
    assert list(np.asarray(inb)) == [True, False, True, False]
    assert int(flat[0]) == 0
    assert int(flat[2]) == 127 * 128 + 127
    assert int(flat[1]) == gm.OOB_INDEX


def test_single_beam_masks():
    origin = jnp.array([0.0, 0.0])
    endpoints = jnp.array([[3.0, 0.0]])
    valid = jnp.array([True])
    free, occ = gm.scan_masks(CFG, origin, endpoints, valid)
    free2 = np.asarray(free).reshape(128, 128)
    occ2 = np.asarray(occ).reshape(128, 128)
    # endpoint cell (94, 64) occupied
    assert occ2[64, 94]
    assert occ2.sum() == 1
    # cells along +x between origin and endpoint are free
    assert free2[64, 65:92].all()
    # endpoint not free, perpendicular cells untouched
    assert not free2[64, 94]
    assert not free2[70, 64:].any()


def test_occ_beats_free():
    """Two beams: one ends where another passes through → cell stays occupied
    (OccGridMapBase.h:315-330 unset-free correction)."""
    origin = jnp.array([0.0, 0.0])
    endpoints = jnp.array([[2.0, 0.0], [4.0, 0.0]])
    valid = jnp.array([True, True])
    free, occ = gm.scan_masks(CFG, origin, endpoints, valid)
    f = np.asarray(free).reshape(128, 128)
    o = np.asarray(occ).reshape(128, 128)
    ex1 = 64 + 20  # 2.0m endpoint cell
    assert o[64, ex1]
    assert not f[64, ex1]  # second beam passes through but occ wins


def test_logodds_update_and_cap():
    grid = jnp.zeros((128 * 128,), jnp.float32)
    origin = jnp.array([0.0, 0.0])
    endpoints = jnp.array([[3.0, 0.0]])
    valid = jnp.array([True])
    g1 = gm.logodds_update_scan(grid, CFG, LO, origin, endpoints, valid)
    g1 = np.asarray(g1).reshape(128, 128)
    assert g1[64, 94] > 0  # occupied
    assert g1[64, 70] < 0  # free
    # repeat many times → saturates at caps
    g = grid
    for _ in range(60):
        g = gm.logodds_update_scan(g, CFG, LO, origin, endpoints, valid)
    g = np.asarray(g).reshape(128, 128)
    assert g[64, 94] <= LO.log_odds_max + 1e-6
    assert g[64, 70] >= LO.log_odds_min - 1e-6


def test_gmapping_counts():
    hits = jnp.zeros((128 * 128,), jnp.int32)
    visits = jnp.zeros((128 * 128,), jnp.int32)
    origin = jnp.array([0.0, 0.0])
    endpoints = jnp.array([[3.0, 0.0]])
    valid = jnp.array([True])
    for _ in range(4):
        hits, visits = gm.counts_update_scan(
            hits, visits, CFG, origin, endpoints, valid
        )
    h = np.asarray(hits).reshape(128, 128)
    v = np.asarray(visits).reshape(128, 128)
    assert h[64, 94] == 4 and v[64, 94] == 4
    assert h[64, 70] == 0 and v[64, 70] == 4  # free cell visited once per scan
    frac = np.asarray(gm.counts_occupancy(hits, visits)).reshape(128, 128)
    assert frac[64, 94] == 1.0 and frac[64, 70] == 0.0


def test_karto_counts_range_threshold():
    p = jnp.zeros((128 * 128,), jnp.int32)
    h = jnp.zeros((128 * 128,), jnp.int32)
    origin = jnp.array([0.0, 0.0])
    # one in-range beam, one beyond threshold (traces free, no hit)
    endpoints = jnp.array([[3.0, 0.0], [0.0, 5.5]])
    ranges = jnp.array([3.0, 5.5])
    p, h = gm.karto_counts_update_scan(
        p, h, CFG, origin, endpoints, ranges, range_threshold=4.0,
        min_range=0.1, max_range=12.0,
    )
    pp = np.asarray(p).reshape(128, 128)
    hh = np.asarray(h).reshape(128, 128)
    # valid endpoint: TraceLine visits it once + the endpoint update adds
    # pass AND hit (the reference's double count, Karto.h:5929-5945)
    assert hh[64, 94] == 1 and pp[64, 94] == 2
    assert hh[:, 64].sum() == 0  # long beam never hits
    assert pp[80, 64] == 1  # but traces free along +y up to 4 m
    assert pp[64 + 41, 64] == 0  # nothing past the threshold
    # free cells along the first beam get exactly one pass
    assert pp[64, 70] == 1


def test_karto_occupancy_rule():
    p = jnp.array([0, 1, 3, 10, 10])
    h = jnp.array([0, 1, 3, 0, 2])
    out = np.asarray(gm.karto_occupancy(p, h))
    assert out[0] == -1  # unknown
    assert out[1] == -1  # pass ≤ min_pass_through
    assert out[2] == 100  # 3/3 ≥ 0.1
    assert out[3] == 0  # free
    assert out[4] == 100  # 2/10 ≥ 0.1


def test_map_reconstruction_accuracy():
    """Scans rendered in a box world at known poses must reproduce the walls."""
    scan_cfg = ScanConfig(num_beams=360, range_max=12.0)
    world = sim.World.box(-4, -4, 4, 4)
    traj = sim.circle_trajectory(20, radius=1.0, angular_rate=1.0)
    seq = sim.simulate_sequence(world, traj, scan_cfg, noise_std=0.0, seed=0)
    grid = jnp.zeros((CFG.size_y * CFG.size_x,), jnp.float32)
    from tpu_slam.data.scan import make_scan, world_points, index_scan

    scans = make_scan(seq.ranges, scan_cfg)
    for t in range(20):
        s = index_scan(scans, t)
        pose = jnp.asarray(seq.gt_poses[t], jnp.float32)
        wp = world_points(s, pose)
        grid = gm.logodds_update_scan(
            grid, CFG, LO, pose[:2], wp, s.valid, max_range=scan_cfg.range_max
        )
    g = np.asarray(grid).reshape(128, 128)
    # wall cells: x=±4 → cells 24 and 104 on the row through the center
    assert g[64, 104] > 10.0 and g[64, 24] > 10.0
    assert g[104, 64] > 10.0 and g[24, 64] > 10.0
    # interior free
    assert (g[50:79, 50:79] < 0).mean() > 0.95
    ros = np.asarray(gm.logodds_to_ros(grid)).reshape(128, 128)
    assert ros[64, 104] == 100 and ros[64, 70] == 0
    # outside the box: never observed
    assert ros[2, 2] == -1
