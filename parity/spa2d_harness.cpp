// Golden-parity harness over the REFERENCE SPA2d solver.
//
// Compiles the unmodified reference source
//   /root/reference/lesson6/lib/sparse_bundle_adjustment/src/spa2d.cpp
// against the mini-Eigen shim (shims/Eigen/Core) and exposes the
// SysSPA2d::{addNode,addConstraint,doSPA} surface (reference
// spa2d.cpp:207-252,425-609) over a flat C API for ctypes.
//
// Both solver paths of doSPA are exercised:
//   * DENSE (useCSparse = SBA_DENSE_CHOLESKY) — the round-2 golden path;
//   * SPARSE (SBA_SPARSE_CHOLESKY) — the path the SpaSolver actually runs
//     (spa_solver.cc:51 doSPA(40) default; spa2d.cpp:505 csp.doChol), via
//     the reference's own csparse.cpp compiled unmodified against the
//     CSparse-compatible cs_cholsol in cs_impl.cpp.
#include <sparse_bundle_adjustment/spa2d.h>

#include <cstdlib>
#include <cstring>

extern "C"
{

void *spa_new()
{
    return new sba::SysSPA2d();
}

void spa_free(void *s)
{
    delete static_cast<sba::SysSPA2d *>(s);
}

void spa_add_node(void *s, double x, double y, double th, int id)
{
    Eigen::Vector3d pos;
    pos(0) = x;
    pos(1) = y;
    pos(2) = th;
    static_cast<sba::SysSPA2d *>(s)->addNode(pos, id);
}

int spa_add_constraint(void *s, int id0, int id1,
                       const double *mean, const double *prec)
{
    Eigen::Vector3d m;
    m(0) = mean[0];
    m(1) = mean[1];
    m(2) = mean[2];
    Eigen::Matrix3d p;
    for (int r = 0; r < 3; r++)
        for (int c = 0; c < 3; c++)
            p(r, c) = prec[r * 3 + c];
    return static_cast<sba::SysSPA2d *>(s)->addConstraint(id0, id1, m, p)
               ? 1
               : 0;
}

// Runs doSPA with the dense solver; returns good-iteration count.
int spa_do_spa(void *s, int niter, double s_lambda)
{
    return static_cast<sba::SysSPA2d *>(s)->doSPA(
        niter, s_lambda, SBA_DENSE_CHOLESKY);
}

// Runs doSPA with the reference's default SPARSE Cholesky solver
// (setupSparseSys + CSparse2d::doChol → cs_cholsol each LM iteration).
int spa_do_spa_sparse(void *s, int niter, double s_lambda)
{
    return static_cast<sba::SysSPA2d *>(s)->doSPA(
        niter, s_lambda, SBA_SPARSE_CHOLESKY);
}

double spa_calc_cost(void *s)
{
    return static_cast<sba::SysSPA2d *>(s)->calcCost();
}

int spa_num_nodes(void *s)
{
    return (int)static_cast<sba::SysSPA2d *>(s)->nodes.size();
}

// node poses in insertion order: out[n*4] = (nodeId, x, y, th)
void spa_get_poses(void *s, double *out)
{
    sba::SysSPA2d *spa = static_cast<sba::SysSPA2d *>(s);
    for (size_t i = 0; i < spa->nodes.size(); i++)
    {
        out[i * 4] = spa->nodes[i].nodeId;
        out[i * 4 + 1] = spa->nodes[i].trans(0);
        out[i * 4 + 2] = spa->nodes[i].trans(1);
        out[i * 4 + 3] = spa->nodes[i].arot;
    }
}

} // extern "C"
