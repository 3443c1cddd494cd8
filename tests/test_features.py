import jax.numpy as jnp
import numpy as np

from tpu_slam.config import FeatureConfig, ScanConfig
from tpu_slam.data.scan import make_scan
from tpu_slam.ops.features import curvature_compacted, extract_corner_features


def reference_feature_select(ranges, cfg: FeatureConfig):
    """Numpy replica of feature_detection.cc:93-171 (compaction + sector sort)."""
    n = len(ranges)
    map_index = []
    new_scan = []
    for i in range(n):
        if np.isfinite(ranges[i]):
            map_index.append(i)
            new_scan.append(ranges[i])
    count = len(new_scan)
    new_scan = np.array(new_scan)
    curv = np.zeros(count)
    hw = cfg.half_window
    for i in range(hw, count - hw):
        d = new_scan[i - hw : i + hw + 1].sum() - new_scan[i] * (2 * hw + 1)
        curv[i] = d * d
    selected = set()
    for j in range(cfg.num_sectors):
        start = count * j // cfg.num_sectors
        end = count * (j + 1) // cfg.num_sectors - 1
        if start >= end:
            continue
        # reference sorts [start, end) then walks from end downward (end
        # element itself never sorted in; harmless boundary quirk we ignore
        # by using distinct curvatures and sorting the full closed range)
        idx = np.argsort(curv[start : end + 1], kind="stable") + start
        picked = 0
        for k in reversed(idx):
            if curv[k] > cfg.curvature_threshold:
                picked += 1
                if picked <= cfg.max_per_sector:
                    selected.add(map_index[k])
                else:
                    break
    return selected


def test_flat_wall_low_curvature():
    cfg = ScanConfig(num_beams=64, range_max=50.0)
    # constant ranges: curvature identically zero
    scan = make_scan(np.full(64, 3.0), cfg)
    curv, order, count = curvature_compacted(scan.ranges, scan.valid)
    assert int(count) == 64
    np.testing.assert_allclose(np.asarray(curv), 0.0, atol=1e-9)


def test_corner_has_high_curvature():
    cfg = ScanConfig(num_beams=64, range_max=50.0)
    r = np.full(64, 3.0)
    r[32:] = 6.0  # range jump
    scan = make_scan(r, cfg)
    curv, order, count = curvature_compacted(scan.ranges, scan.valid)
    curv = np.asarray(curv)
    assert curv[28:36].max() > 10.0
    assert curv[:20].max() < 1e-6


def test_matches_reference_selection(rng):
    cfg = ScanConfig(num_beams=240, range_max=50.0)
    fcfg = FeatureConfig()
    r = rng.uniform(1.0, 9.0, size=240)
    r[rng.uniform(size=240) < 0.1] = np.inf  # some invalid beams
    scan = make_scan(r, cfg)
    mask = np.asarray(extract_corner_features(scan, fcfg))
    got = set(np.nonzero(mask)[0].tolist())
    want = reference_feature_select(r, fcfg)
    # identical selection up to curvature ties (random ranges → no ties)
    assert got == want
    assert len(got) > 0


def test_sector_cap(rng):
    cfg = ScanConfig(num_beams=360, range_max=50.0)
    fcfg = FeatureConfig()
    r = rng.uniform(1.0, 9.0, size=360)  # noisy: everything is a "corner"
    scan = make_scan(r, cfg)
    mask = np.asarray(extract_corner_features(scan, fcfg))
    assert mask.sum() <= fcfg.num_sectors * fcfg.max_per_sector


def test_batched_matches_single(rng):
    cfg = ScanConfig(num_beams=120, range_max=50.0)
    fcfg = FeatureConfig()
    r = rng.uniform(1.0, 9.0, size=(4, 120))
    batch = make_scan(r, cfg)
    mask_b = np.asarray(extract_corner_features(batch, fcfg))
    for i in range(4):
        single = make_scan(r[i], cfg)
        mask_s = np.asarray(extract_corner_features(single, fcfg))
        np.testing.assert_array_equal(mask_b[i], mask_s)
