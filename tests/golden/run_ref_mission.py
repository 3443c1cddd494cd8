"""Subprocess runner: full reference Mapper mission (abort-isolated).

The assert-enabled reference aborts the whole process on an exactly-singular
match covariance (Matrix3::Inverse, Karto.h:2444-2453 — reachable whenever a
correlation keep-set is collinear). Running it here keeps the abort out of
the pytest process; the parent detects the non-zero exit and skips.

stdin/argv: in_npz out_npz [--with-solver]
in_npz: ranges (T,N), odom (T,3), plus cfg knobs replicated from golden_cfg.
"""

import sys

import numpy as np


def main():
    in_npz, out_npz = sys.argv[1], sys.argv[2]
    with_solver = "--with-solver" in sys.argv

    sys.path.insert(0, str(__file__).rsplit("/tests/", 1)[0])
    from tests.golden.ref_karto import RefMapper
    from tests.test_golden_karto import golden_cfg, outdoor_golden_cfg

    z = np.load(in_npz)
    ranges, odom = z["ranges"], z["odom"]
    cfg = outdoor_golden_cfg() if "--cfg-outdoor" in sys.argv else golden_cfg()
    flavor = "ndebug" if "--ndebug" in sys.argv else "assert"
    ref = RefMapper(cfg.scan, flavor=flavor)
    ref.configure(cfg)

    if with_solver:
        from tpu_slam.solver.pose_graph import PoseGraphSolver

        def solve_fn(ids, poses, src, tgt, means, covs):
            solver = PoseGraphSolver(cfg.solver)
            for i, v in enumerate(ids):
                solver.add_node(int(v), poses[i])
            for k in range(len(src)):
                solver.add_constraint(
                    int(src[k]), int(tgt[k]), means[k], covariance=covs[k]
                )
            solver.compute()
            return solver.get_poses()

        ref.set_solver(solve_fn)

    accepted = []
    abort_scan = -1
    for t in range(len(ranges)):
        try:
            if ref.process(ranges[t], odom[t]):
                accepted.append(t)
        except RuntimeError:
            # the harness caught a karto::Exception inside Mapper::Process
            # (NDEBUG flavor: a singular keep-set covariance falls through
            # Matrix3::Inverse's unscaled adjugate into garbage poses and
            # an out-of-range correlation-grid index, PARITY.md dev. 5).
            # Record WHERE it died instead of aborting: the parent test
            # asserts this documented failure deterministically rather
            # than skipping on an opaque crash.
            abort_scan = t
            break
    np.savez(
        out_npz,
        accepted=np.asarray(accepted, np.int64),
        poses=ref.poses(),
        closures=np.asarray([ref.compute_calls], np.int64),
        abort_scan=np.asarray([abort_scan], np.int64),
    )


if __name__ == "__main__":
    main()
