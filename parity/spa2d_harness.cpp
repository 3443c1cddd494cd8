// Golden-parity harness over the REFERENCE SPA2d solver.
//
// Compiles the unmodified reference source
//   /root/reference/lesson6/lib/sparse_bundle_adjustment/src/spa2d.cpp
// against the mini-Eigen shim (shims/Eigen/Core) and exposes the
// SysSPA2d::{addNode,addConstraint,doSPA} surface (reference
// spa2d.cpp:207-252,425-609) over a flat C API for ctypes.
//
// Only the DENSE Cholesky path (useCSparse = SBA_DENSE_CHOLESKY) is
// exercised: it solves the same normal equations as the CSparse path the
// SpaSolver uses by default (spa_solver.cc:51 doSPA(40)), with identical LM
// iterates up to linear-solver roundoff. The CSparse2d members referenced by
// the (never-executed) sparse path are stubbed below to satisfy the linker.
#include <sparse_bundle_adjustment/spa2d.h>

#include <cstdlib>
#include <cstring>

namespace sba
{
// --- linker stubs for the un-exercised sparse path (csparse.cpp) ----------
CSparse2d::CSparse2d()
{
    A = AF = nullptr;
    asize = csize = nnz = 0;
    useCholmod = false;
}
CSparse2d::~CSparse2d() {}
void CSparse2d::setupBlockStructure(int, bool) { abort(); }
void CSparse2d::addOffdiagBlock(Matrix<double, 3, 3> &, int, int) { abort(); }
void CSparse2d::incDiagBlocks(double) { abort(); }
void CSparse2d::setupCSstructure(double, bool) { abort(); }
void CSparse2d::uncompress(MatrixXd &) { abort(); }
bool CSparse2d::doChol() { abort(); }
int CSparse2d::doPCG(int) { abort(); }
int CSparse2d::doBPCG(int, double, int) { abort(); }
} // namespace sba

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
