"""Typed configuration tree with the reference defaults.

One dataclass config tree replacing the reference's three config tiers
(SURVEY.md §5): launch-file params, YAML rosparam loads
(`lesson6/config/mapper_params.yaml`, `lesson3/config/plicp_odometry.yaml`),
and the `karto::Parameter<T>` registry (`Karto.h:266-351`,
`Mapper.cpp:1448-1653`). Every default cites its reference origin.

All configs are plain (hashable, frozen) dataclasses so they can be passed
as static args to jit'd functions.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


def _d(**kw):
    return dataclasses.field(default_factory=lambda: kw.pop("cls")(**kw))


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    """Laser sensor model.

    Defaults follow the lesson bags' lidar (360-beam 2D scans) and
    `karto::LaserRangeFinder` (Karto.h:3709-4100).
    """

    num_beams: int = 360
    angle_min: float = -math.pi
    angle_increment: float = 2.0 * math.pi / 360.0
    range_min: float = 0.15  # validity window, scan_to_pointclod2_converter.cc:62
    range_max: float = 12.0
    # karto range threshold: use readings only below this (Karto.h:3805)
    range_threshold: float = 12.0
    scan_period: float = 0.1  # 10 Hz (SURVEY §6)


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """LIO-SAM-style corner feature extraction (lesson1/src/feature_detection.cc)."""

    half_window: int = 5  # ±5-neighbor curvature window (:112-124)
    num_sectors: int = 6  # 6 sectors per scan (:139)
    max_per_sector: int = 20  # ≤20 corners per sector (:158-166)
    curvature_threshold: float = 1.0  # edge threshold (:160)


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Point-to-point ICP (lesson2/src/scan_match_icp.cc:135-164)."""

    max_iterations: int = 20
    max_correspondence_dist: float = 1.0
    convergence_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class PLICPConfig:
    """CSM PL-ICP parameters (lesson3/src/plicp_odometry.cc:69-186).

    Field names match CSM's `sm_params`; only the subset that affects
    trajectories on the lesson workloads is implemented (SURVEY §7 hard
    part f).
    """

    # plausibility bounds on the scan-to-scan correction: CSM uses them to
    # bound its correspondence search window; with an exhaustive NN they
    # become a validity gate on the final correction (prediction fallback)
    max_angular_correction_deg: float = 45.0
    max_linear_correction: float = 1.0
    max_iterations: int = 10
    epsilon_xy: float = 1e-6
    epsilon_theta: float = 1e-6
    max_correspondence_dist: float = 1.0
    sigma: float = 0.010
    use_point_to_line_distance: bool = True
    outliers_maxPerc: float = 0.90
    outliers_adaptive_order: float = 0.7
    outliers_adaptive_mult: float = 2.0
    # accepted for config parity; CSM only reads orientation_neighbourhood
    # on its use_ml_weights/alpha-test paths, which the lessons disable
    # (plicp_odometry.cc:119-146) — point-to-line normals come from the two
    # adjacent beams of the correspondence, as here
    orientation_neighbourhood: int = 20
    do_compute_covariance: bool = False  # covariance is always returned


@dataclasses.dataclass(frozen=True)
class KeyframeConfig:
    """Keyframe policy of the PL-ICP odometry (plicp_odometry.cc:60-67, 498-517)."""

    kf_dist_linear: float = 0.1
    kf_dist_angular: float = 5.0 * math.pi / 180.0
    kf_scan_count: int = 10


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Occupancy-grid geometry shared by all map flavors."""

    resolution: float = 0.05  # lesson4 hector default (hector_slam.cc:46)
    size_x: int = 1024  # cells
    size_y: int = 1024
    # world coords of grid cell (0,0) center
    origin_x: float = -25.6
    origin_y: float = -25.6


@dataclasses.dataclass(frozen=True)
class LogOddsConfig:
    """Hector log-odds cell model (map/GridMapLogOdds.h:37-161).

    Library defaults are 0.4/0.6; the hector_slam node overrides to
    update_free=0.4, update_occupied=0.9 (hector_slam.cc:48-49).
    """

    p_free: float = 0.4
    p_occupied: float = 0.9
    log_odds_max: float = 50.0  # occupied cap (GridMapLogOdds.h:~60)
    log_odds_min: float = -50.0
    obstacle_threshold: float = 0.0  # logodds > 0 ⇒ occupied


@dataclasses.dataclass(frozen=True)
class GMappingConfig:
    """GMapping hit/visit cell model (gmapping/grid/map.h:17-48, gmapping.cc:146-158)."""

    occupancy_threshold: float = 0.25  # n/visits > 0.25 ⇒ occupied
    patch_magnitude: int = 5  # 32x32 patches (harray2d.h), kept for parity docs


@dataclasses.dataclass(frozen=True)
class HectorConfig:
    """Hector SLAM (lesson4/src/hector_mapping/hector_slam.cc:40-66 and
    slam_main/HectorSlamProcessor.h:46-68)."""

    map_resolution: float = 0.05
    map_size: int = 1024
    map_start_x: float = 0.5  # normalized start position in map
    map_start_y: float = 0.5
    map_multi_res_levels: int = 3
    update_factor_free: float = 0.4
    update_factor_occupied: float = 0.9
    map_update_distance_thresh: float = 0.4  # HectorSlamProcessor.h:66
    map_update_angle_thresh: float = 0.13  # rad, HectorSlamProcessor.h:67
    laser_z_min_value: float = -1.0
    laser_z_max_value: float = 1.0
    # GN iterations: 3 per coarse level, 5(+1 initial) at finest
    # (MapRepMultiMap.h:144-167, ScanMatcher.h:60-139)
    iterations_coarse: int = 3
    iterations_fine: int = 5
    max_rot_step: float = 0.2  # ±0.2 rad clamp (ScanMatcher.h:120-135)
    use_odom_prior: bool = False


@dataclasses.dataclass(frozen=True)
class CorrelativeConfig:
    """Karto correlation ScanMatcher parameters (Mapper.cpp:1448-1653 defaults).

    Names mirror the karto::Parameter registry entries.
    """

    # CorrelationParameters (Mapper.cpp:1546-1573)
    correlation_search_space_dimension: float = 0.3
    correlation_search_space_resolution: float = 0.01
    correlation_search_space_smear_deviation: float = 0.03
    # search angle (Mapper.cpp:1620-1650)
    coarse_search_angle_offset: float = math.radians(20.0)
    coarse_angle_resolution: float = math.radians(2.0)
    fine_search_angle_offset: float = math.radians(0.2)
    # penalties (Mapper.cpp:1590-1618; constants Mapper.h DISTANCE/ANGLE_PENALTY_GAIN=0.2)
    distance_variance_penalty: float = 0.3 * 0.3
    angle_variance_penalty: float = math.radians(20.0) ** 2
    minimum_distance_penalty: float = 0.5
    minimum_angle_penalty: float = 0.9
    distance_penalty_gain: float = 0.2
    angle_penalty_gain: float = 0.2
    use_response_expansion: bool = True


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Karto loop-closure parameters (Mapper.cpp:1497-1545, 1574-1589)."""

    loop_search_space_dimension: float = 8.0
    loop_search_space_resolution: float = 0.05
    loop_search_space_smear_deviation: float = 0.03
    loop_search_maximum_distance: float = 4.0
    loop_match_minimum_chain_size: int = 10
    loop_match_maximum_variance_coarse: float = 0.4 * 0.4
    loop_match_minimum_response_coarse: float = 0.8
    loop_match_minimum_response_fine: float = 0.8


@dataclasses.dataclass(frozen=True)
class KartoFrontEndConfig:
    """Karto Mapper front-end gates (Mapper.cpp:1448-1496)."""

    minimum_travel_distance: float = 0.2  # HasMovedEnough (Mapper.cpp:2087-2120)
    minimum_travel_heading: float = math.radians(10.0)
    # accept a scan regardless of travel once this much time has passed
    # (MinimumTimeInterval, Mapper.cpp:1468-1478; default 3600 s)
    minimum_time_interval: float = 3600.0
    scan_buffer_size: int = 70  # running scans cap (Mapper.h:1365-1386)
    scan_buffer_maximum_scan_distance: float = 20.0
    link_match_minimum_response_fine: float = 0.8
    link_scan_maximum_distance: float = 10.0
    use_scan_matching: bool = True
    use_scan_barycenter: bool = True
    do_loop_closing: bool = True
    # pipeline parallelism (new vs reference, SURVEY §2.5): dispatch the
    # loop-closure LM solve asynchronously and keep matching scans; the
    # correction is harvested when the device finishes and propagated
    # chain-consistently to scans accepted in the meantime. The reference
    # blocks the front-end inline (Mapper.cpp:2063-2070).
    async_loop_closure: bool = False
    # speculative front match (new vs reference): during scan t's loop
    # search, scan t+1's correlative front match is already in flight —
    # the gates it needs (odometric HasMovedEnough, last corrected pose,
    # running-buffer membership) are known before TryCloseLoop runs, and
    # the rare invalidation (a closure or async harvest moved the poses)
    # falls back to a fresh synchronous dispatch, so results are
    # bit-identical to the sequential order. Only KartoSLAM.run (bag
    # replay) has the lookahead to drive it; live per-scan process()
    # calls behave as before.
    speculative_front_match: bool = True


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Pose-graph LM solver, parity with SPA2d (spa2d.cpp:425-609)."""

    max_iterations: int = 40  # doSPA(40), spa_solver.cc:51
    initial_lambda: float = 1e-4  # sLambda default (spa2d.h)
    lambda_factor: float = 2.0  # rollback doubling (spa2d.cpp:531-582)
    convergence_delta: float = 1e-16  # ‖δ‖² threshold
    cg_iterations: int = 100  # CG cap for the iterative path
    cg_tolerance: float = 1e-10
    # restarted CG: fresh Krylov space at the TRUE residual, `restarts`
    # times. f32 CG loses conjugacy on high-diameter graphs — 2 restarts
    # recover 4.6× better convergence on the synthetic 4k ring (cost
    # 0.355 → 0.077) at 2× solve time, but measured NO accuracy gain on
    # the real 6k outdoor mission — hence opt-in (BENCHMARKS round 3)
    cg_restarts: int = 1
    use_dense_below: int = 512  # nodes; dense Cholesky under this, CG above
    # Schur-complement submap factorization (solver/schur.py): batched
    # per-submap Cholesky + one reduced separator solve. Opt-in: it wins on
    # closure-dense graphs (236 ms vs 350 ms CG on the synthetic 1024-node
    # ring, round 3) but LOSES on real chain-shaped mission graphs (679 vs
    # 404 ms/solve on the 984-scan mission) — CG stays the default.
    use_schur: bool = False
    schur_submaps: int = 32
    # exact fallback for large graphs the banded CR kernel rejects
    # (bandwidth breaks under RCM — e.g. the offline outdoor graph with
    # multi-stride skip edges): run the LM with the DIRECT Schur
    # factorization in float64. Measured on the 6,114-node outdoor
    # graph (BENCHMARKS round 4): f32 CG 1.19 m ATE, f32 Schur 1.12,
    # f64 CG 1.16 (CG is algorithmically inadequate at chain condition
    # numbers ~1e6) — f64 Schur 0.651, matching the f64 host oracle
    # exactly, at 1.7 s per warm solve on v5e. 0 disables.
    f64_schur_above: int = 3000
    host_direct_fallback: bool = True  # the non-bandable graphs above
    # f64_schur_above solve on the HOST in f64 sparse-direct LM (the
    # reference's own CSparse regime, spa2d.cpp:505): their soft global
    # modes need f64 factorization the MXU doesn't have, and the mixed
    # f32-factor device path either crawls (floored damping) or caps out
    # its PCG — measured 8.4 s & stalled vs 0.3 s & exact on host
    # (round 5). False restores the device mixed-Schur path.
    # whole-doSPA fused Pallas kernel (solver/pallas_lm.py): single-device
    # f32 solves on TPU below the VMEM one-hot cap run the entire LM loop
    # in one launch. Shipped at HIGHEST precision: 111 ms on the
    # 1024-node graph vs 351 ms XLA (58 ms mixed-precision degrades the
    # reached optimum; BENCHMARKS round 3). Round 4: superseded on
    # bandable graphs by the DIRECT kernel below; kept as the fallback.
    use_fused_kernel: bool = True
    # direct cyclic-reduction kernel (solver/pallas_cr_lm.py): the EXACT
    # factorization (RCM-banded supernodes + block cyclic reduction =
    # Cholesky under nested dissection) run as one Pallas launch — the
    # TPU-native analogue of the reference's sparse Cholesky
    # (spa2d.cpp:505 csp.doChol). Round-4 measured walls through the
    # tunnel on the ring benchmark: 30/43/63/150 ms at 1024/2048/4096/
    # 8192 nodes vs the harnessed reference sparse 43/84/198/~700 ms,
    # converged cost 0.0 (exact) at every size — no f32-CG cliff.
    use_direct: bool = True
    direct_max_bandwidth: int = 8  # RCM block bandwidth cap (bucketed)


@dataclasses.dataclass(frozen=True)
class UndistortConfig:
    """Motion-distortion correction (lesson5/src/lidar_undistortion.cc)."""

    use_imu: bool = True
    use_odom: bool = True


@dataclasses.dataclass(frozen=True)
class OfflineConfig:
    """Offline batch SLAM (models/offline.py) — new vs reference.

    The reference processes scans strictly sequentially (Mapper::Process per
    scan callback); the offline mapper re-designs the same Karto-style
    odometry→loop-closure→optimize pipeline as data-parallel device
    programs over the WHOLE mission at once."""

    loop_min_gap: int = 40  # scans between loop candidate endpoints
    loop_radius: float = 2.0  # m pose distance for candidacy
    loop_nms_gap: int = 10  # candidate thinning along both scan indices
    max_candidates: int = 128  # per round
    # seed lattice for the multi-start loop matching (brute-forcing the
    # PL-ICP convergence basin with batch throughput)
    seeds_xy: int = 3  # lattice points per translation axis
    seed_xy: float = 0.6  # half-extent (m)
    seeds_theta: int = 5
    seed_theta: float = math.radians(15.0)
    # acceptance gates on the best seed's match
    max_mean_error: float = 0.05  # m, trimmed inlier residual (absolute cap)
    # adaptive alias gate: a genuine loop match of the same sensor in the
    # same world cannot be much worse than the mission's own consecutive
    # matches, so the error gate self-calibrates to
    # alias_error_mult x median(chain match error)
    alias_error_mult: float = 2.0
    min_inlier_frac: float = 0.6  # of the scan's valid beams
    # systematic-error floor added to every match covariance: the GN
    # covariance sigma^2 H^-1 is overconfident (correlated beam errors,
    # interpolation bias), so a few-cm floor keeps edge chi^2 honest
    cov_floor_xy: float = 0.02  # m (stddev)
    cov_floor_theta: float = 0.01  # rad (stddev)
    # pairwise-consistency loop filtering (PCM-style): corridor slides can
    # match PERFECTLY (range-limit endpoints fake a corner), so per-edge
    # gates cannot catch them — but a slid edge is inconsistent with the
    # consensus of good edges through chain cycles
    use_pcm: bool = True
    pcm_chi2: float = 9.0  # pairwise consistency gate
    pcm_drift_inflation: float = 4.0  # x chain variance (correlated drift)
    rounds: int = 2  # detect→match→solve passes (round 2 sees corrected poses)
    # chain stiffening: multi-stride skip edges (new vs reference). The
    # consecutive PL-ICP chain accumulates per-step bias+noise over the
    # whole mission, and loop closures only pin the few revisited places —
    # between anchors the chain sags by the accumulated drift (measured
    # 1.35 m ATE on the 6k-scan outdoor mission). Matching scan t directly
    # against t+s shortcuts s steps of accumulation, so the sag drops
    # ~s-fold and the pose-graph diameter shrinks by the largest stride
    # (which also conditions the CG solve). Strides are matched in ONE
    # extra batched device call with chain-predicted guesses.
    # both drift-control stages (skip edges + anchors) engage only on
    # routes long enough for accumulated chain drift to matter: short
    # indoor missions hold cm ATE from chain+loops alone, their graphs
    # stay RCM-bandable (skip edges break the band), and the solver
    # keeps the fast exact CR kernel path
    drift_control_min_route: float = 250.0  # m of integrated travel
    skip_strides: tuple = (8, 32, 128)
    # acceptance: deviation of the refined transform from the chain
    # prediction (a genuine skip match lands within local drift scale;
    # corridor-slide aliases walk off)
    skip_dev_xy: float = 0.5  # m
    skip_dev_theta: float = math.radians(10.0)
    # correlative re-anchoring sweep: the offline analogue of the online
    # front-end's scan-to-map correlative matching (Mapper.cpp:184-291).
    # PL-ICP carries a small geometry-correlated bias that warps the map
    # (measured ±1 m over the 512 m outdoor route — skip edges can't fix
    # it because they share the bias); the correlative grid matcher is
    # unbiased, so matching every anchor_step-th scan against a submap of
    # its recent past (posed at current estimates) straightens the warp.
    # Anchors are independent given the current poses — batched
    # anchor_lanes per device program, all programs in flight before one
    # fetch pass (CorrelativeMatcher.match_anchors_store_async).
    use_anchor: bool = True
    # engage only at the mission scale where chain warp (bias × path
    # length) exceeds the correlative grid's ~1 cm quantization noise:
    # measured on the 704-scan indoor corridor anchors COST 9 mm ATE
    # (0.015→0.025) while on the 6,114-scan outdoor route they remove a
    # ±1 m warp (BENCHMARKS round 4)
    anchor_min_scans: int = 2000
    anchor_step: int = 8  # anchor every k-th scan
    anchor_span: int = 72  # base submap reaches this many scans back
    anchor_gap: int = 8  # nearest base scan (the edge's reference node)
    anchor_scans: int = 16  # base scans per submap (subsampled from span)
    anchor_lanes: int = 8  # anchors per device dispatch
    anchor_min_response: float = 0.5
    anchor_rounds: int = 1  # sweeps per macro pass (the offline macro
    # schedule alternates loop detection and anchor sweeps anyway)
    max_solver_loops: int = 192  # cap on loop edges fed to the solver
    # (full set stays in the result): same-revisit loops are
    # near-duplicates (826 -> 104 moved the outdoor f64 optimum by
    # 0.5 mm) but every endpoint is a Schur separator node
    anchor_drop_min_loops: int = 4  # drop anchor edges from the FINAL
    # solve when at least this many loop closures carry the global
    # structure (anchors are bootstrap-only: measured 0.110 -> 0.003 m on
    # the 2-lap outdoor graph — see offline_slam's macro schedule)
    macro_rounds: int = 4  # max anchor-sweep/loop-redetect alternations;
    # each round re-gathers loop candidates from the anchor-corrected
    # poses (the pre-anchor warp can exceed the gather radius) and
    # re-anchors against the re-solved shape; stops early once neither
    # finds anything new
    # long-lever anchor level: the short span can only see warp gradients
    # above resolution/span (0.01 m / 6.5 m ≈ 1.5e-3 m/m — the measured
    # outdoor warp is right AT that limit, so half the short anchors
    # return their own search center). A second sweep at 8× the span and
    # 2× the grid pitch sees gradients 4× below the warp signal and
    # straightens the macro shape; the short level then polishes locally.
    use_anchor_long: bool = True
    anchor_long_span: int = 512
    anchor_long_step: int = 32
    anchor_long_search: float = 1.6  # m window (covers inter-sweep drift)
    anchor_long_resolution: float = 0.02
    anchor_long_smear: float = 0.05


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the distributed paths (SURVEY §2.5)."""

    data_axis: str = "data"  # scan-batch data parallelism
    graph_axis: str = "graph"  # pose-graph edge sharding


@dataclasses.dataclass(frozen=True)
class SLAMConfig:
    """Top-level config tree."""

    scan: ScanConfig = dataclasses.field(default_factory=ScanConfig)
    features: FeatureConfig = dataclasses.field(default_factory=FeatureConfig)
    icp: ICPConfig = dataclasses.field(default_factory=ICPConfig)
    plicp: PLICPConfig = dataclasses.field(default_factory=PLICPConfig)
    keyframe: KeyframeConfig = dataclasses.field(default_factory=KeyframeConfig)
    grid: GridConfig = dataclasses.field(default_factory=GridConfig)
    logodds: LogOddsConfig = dataclasses.field(default_factory=LogOddsConfig)
    gmapping: GMappingConfig = dataclasses.field(default_factory=GMappingConfig)
    hector: HectorConfig = dataclasses.field(default_factory=HectorConfig)
    correlative: CorrelativeConfig = dataclasses.field(
        default_factory=CorrelativeConfig
    )
    loop: LoopConfig = dataclasses.field(default_factory=LoopConfig)
    karto: KartoFrontEndConfig = dataclasses.field(
        default_factory=KartoFrontEndConfig
    )
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    offline: OfflineConfig = dataclasses.field(default_factory=OfflineConfig)
    undistort: UndistortConfig = dataclasses.field(default_factory=UndistortConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def default_config() -> SLAMConfig:
    return SLAMConfig()


def _update_dataclass(obj, updates: dict):
    kw = {}
    for f in dataclasses.fields(obj):
        cur = getattr(obj, f.name)
        if f.name in updates:
            val = updates[f.name]
            if dataclasses.is_dataclass(cur) and isinstance(val, dict):
                kw[f.name] = _update_dataclass(cur, val)
            else:
                kw[f.name] = val
        else:
            kw[f.name] = cur
    return type(obj)(**kw)


def config_from_dict(d: dict, base: Optional[SLAMConfig] = None) -> SLAMConfig:
    """Build a config from a nested dict (e.g. parsed YAML), overriding defaults.

    The YAML-loadable replacement for rosparam loads of
    `lesson6/config/mapper_params.yaml` etc.
    """
    return _update_dataclass(base or default_config(), d)


def config_from_yaml(path: str, base: Optional[SLAMConfig] = None) -> SLAMConfig:
    import yaml

    with open(path) as f:
        d = yaml.safe_load(f) or {}
    return config_from_dict(d, base)


def preset(name: str) -> SLAMConfig:
    """Load a shipped configuration preset by name.

    Mirrors the reference's launch-selectable YAML presets
    (`lesson6/config/mapper_params.yaml` indoor /
    `mapper_params_outdoor.yaml` for the outdoor bag):

        cfg = preset("karto_outdoor")
    """
    import os

    path = os.path.join(
        os.path.dirname(__file__), "configs", f"{name}.yaml"
    )
    if not os.path.exists(path):
        import glob

        avail = sorted(
            os.path.splitext(os.path.basename(p))[0]
            for p in glob.glob(os.path.join(
                os.path.dirname(__file__), "configs", "*.yaml"
            ))
        )
        raise ValueError(f"unknown preset {name!r}; available: {avail}")
    return config_from_yaml(path)
