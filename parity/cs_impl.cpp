// CSparse-compatible sparse Cholesky for the golden-parity harness.
//
// The reference's SpaSolver runs SysSPA2d::doSPA with useCSparse=1, whose
// per-iteration solve is cs_cholsol(order, A, b) on the upper-triangular
// 3x3-block CSC system assembled by setupSparseSys
// (/root/reference/lesson6/lib/sparse_bundle_adjustment/src/spa2d.cpp:328-413,
// csparse.cpp:736-745). CSparse itself (SuiteSparse) is not vendored in the
// reference checkout and not present on this system, so the harness provides
// a from-scratch implementation of the exact entry points csparse.cpp links:
//
//   cs_spalloc / cs_spfree            compressed-column allocation
//   cs_cholsol(order, A, b)           fill-reducing ordering + up-looking
//                                     sparse Cholesky + two triangular solves
//   cs_transpose / cs_add / cs_fkeep  (only reached from the unused doPCG
//                                     path; implemented for completeness)
//
// Algorithms are the textbook ones (elimination tree + row-pattern reach +
// up-looking factorization; greedy minimum-degree for order>0). This is an
// honest stand-in for CSparse's own complexity class — both do
// ordering + symbolic + numeric per call, as the reference does per LM
// iteration — so harness timings are a fair CPU denominator.

#include <algorithm>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include "suitesparse/cs.h"
}

extern "C" cs *cs_spalloc(int m, int n, int nzmax, int values, int triplet)
{
    cs *A = (cs *)calloc(1, sizeof(cs));
    if (!A)
        return NULL;
    A->m = m;
    A->n = n;
    A->nzmax = nzmax = std::max(nzmax, 1);
    A->nz = triplet ? 0 : -1; // -1 marks compressed-column form
    A->p = (int *)malloc(sizeof(int) * (triplet ? nzmax : (n + 1)));
    A->i = (int *)malloc(sizeof(int) * nzmax);
    A->x = values ? (double *)malloc(sizeof(double) * nzmax) : NULL;
    if (!A->p || !A->i || (values && !A->x))
    {
        cs_spfree(A);
        return NULL;
    }
    return A;
}

extern "C" cs *cs_spfree(cs *A)
{
    if (!A)
        return NULL;
    free(A->p);
    free(A->i);
    free(A->x);
    free(A);
    return NULL;
}

namespace
{

// Greedy minimum-degree ordering on the symmetric pattern of A (upper CSC).
// Explicit elimination-graph formulation: adequate for pose-graph systems
// (near-banded chains + sparse closures) where fill stays small; CSparse
// proper uses AMD's quotient graph, which computes a comparable ordering.
void min_degree_order(int n, const std::vector<std::vector<int>> &adj0,
                      std::vector<int> &perm)
{
    std::vector<std::vector<int>> adj(adj0);
    std::vector<char> dead(n, 0), inmerge(n, 0);
    perm.resize(n);
    // bucketed degree lists with lazy repair
    std::vector<int> deg(n);
    for (int i = 0; i < n; i++)
        deg[i] = (int)adj[i].size();
    std::vector<std::vector<int>> bucket(n + 1);
    for (int i = 0; i < n; i++)
        bucket[deg[i]].push_back(i);
    int cur = 0;
    for (int k = 0; k < n; k++)
    {
        int v = -1;
        while (v < 0)
        {
            while (cur <= n && bucket[cur].empty())
                cur++;
            int cand = bucket[cur].back();
            bucket[cur].pop_back();
            if (dead[cand] || deg[cand] != cur)
                continue; // stale entry
            v = cand;
        }
        perm[k] = v;
        dead[v] = 1;
        // form the clique of v's live neighbors
        std::vector<int> nbr;
        nbr.reserve(adj[v].size());
        for (int u : adj[v])
            if (!dead[u])
                nbr.push_back(u);
        for (int u : nbr)
        {
            // drop dead vertices, union in the clique
            std::vector<int> &au = adj[u];
            size_t w = 0;
            for (size_t r = 0; r < au.size(); r++)
                if (!dead[au[r]])
                    au[w++] = au[r];
            au.resize(w);
            for (int t : au)
                inmerge[t] = 1;
            inmerge[u] = 1;
            for (int t : nbr)
                if (!inmerge[t])
                    au.push_back(t);
            for (int t : au)
                inmerge[t] = 0;
            inmerge[u] = 0;
            int d = (int)au.size();
            if (d != deg[u])
            {
                deg[u] = d;
                bucket[d].push_back(u);
                if (d < cur)
                    cur = d;
            }
        }
        cur = 0; // degrees may have dropped anywhere
    }
}

} // namespace

// Solve A x = b (A symmetric positive definite, upper triangle stored in
// compressed-column form), overwriting b with x. order==0: natural order;
// order>0: minimum-degree fill-reducing ordering. Returns 1 on success.
extern "C" int cs_cholsol(int order, const cs *A, double *b)
{
    if (!A || A->nz != -1 || A->n != A->m || !b)
        return 0;
    const int n = A->n;
    const int *Ap = A->p;
    const int *Ai = A->i;
    const double *Ax = A->x;

    // ---- ordering -------------------------------------------------------
    std::vector<int> perm(n), pos(n);
    if (order > 0)
    {
        std::vector<std::vector<int>> adj(n);
        for (int j = 0; j < n; j++)
            for (int p = Ap[j]; p < Ap[j + 1]; p++)
            {
                int i = Ai[p];
                if (i != j)
                {
                    adj[i].push_back(j);
                    adj[j].push_back(i);
                }
            }
        for (int i = 0; i < n; i++)
        {
            std::sort(adj[i].begin(), adj[i].end());
            adj[i].erase(std::unique(adj[i].begin(), adj[i].end()),
                         adj[i].end());
        }
        min_degree_order(n, adj, perm);
    }
    else
        for (int i = 0; i < n; i++)
            perm[i] = i;
    for (int k = 0; k < n; k++)
        pos[perm[k]] = k;

    // ---- C = P A P', upper triangle, columns sorted ---------------------
    int nnz = Ap[n];
    std::vector<int> cnt(n + 1, 0);
    for (int j = 0; j < n; j++)
        for (int p = Ap[j]; p < Ap[j + 1]; p++)
        {
            int ni = pos[Ai[p]], nj = pos[j];
            cnt[std::max(ni, nj)]++;
        }
    std::vector<int> Cp(n + 1, 0);
    for (int j = 0; j < n; j++)
        Cp[j + 1] = Cp[j] + cnt[j];
    std::vector<int> Ci(nnz), w(Cp.begin(), Cp.end() - 1);
    std::vector<double> Cx(nnz);
    for (int j = 0; j < n; j++)
        for (int p = Ap[j]; p < Ap[j + 1]; p++)
        {
            int ni = pos[Ai[p]], nj = pos[j];
            int col = std::max(ni, nj), row = std::min(ni, nj);
            int q = w[col]++;
            Ci[q] = row;
            Cx[q] = Ax[p];
        }
    for (int j = 0; j < n; j++)
    {
        // sort each column's (row, value) pairs
        int lo = Cp[j], hi = Cp[j + 1];
        std::vector<std::pair<int, double>> col(hi - lo);
        for (int p = lo; p < hi; p++)
            col[p - lo] = {Ci[p], Cx[p]};
        std::sort(col.begin(), col.end());
        for (int p = lo; p < hi; p++)
        {
            Ci[p] = col[p - lo].first;
            Cx[p] = col[p - lo].second;
        }
    }

    // ---- elimination tree (upper-triangular column form) ---------------
    std::vector<int> parent(n, -1), ancestor(n, -1);
    for (int k = 0; k < n; k++)
        for (int p = Cp[k]; p < Cp[k + 1]; p++)
        {
            int i = Ci[p];
            while (i != -1 && i < k)
            {
                int inext = ancestor[i];
                ancestor[i] = k;
                if (inext == -1)
                    parent[i] = k;
                i = inext;
            }
        }

    // ---- symbolic: column counts of L via row-pattern reach -------------
    std::vector<int> mark(n, -1), stk(n), s(n), lcnt(n, 1); // 1 = diagonal
    auto ereach = [&](int k) -> int {
        int top = n;
        mark[k] = k;
        for (int p = Cp[k]; p < Cp[k + 1]; p++)
        {
            int i = Ci[p];
            if (i >= k)
                continue;
            int len = 0;
            while (mark[i] != k)
            {
                stk[len++] = i;
                mark[i] = k;
                i = parent[i];
            }
            while (len > 0)
                s[--top] = stk[--len];
        }
        return top;
    };
    for (int k = 0; k < n; k++)
    {
        int top = ereach(k);
        for (int p = top; p < n; p++)
            lcnt[s[p]]++;
    }

    // ---- numeric: up-looking factorization ------------------------------
    std::vector<int> Lp(n + 1, 0);
    for (int j = 0; j < n; j++)
        Lp[j + 1] = Lp[j] + lcnt[j];
    int lnz = Lp[n];
    std::vector<int> Li(lnz), c(Lp.begin(), Lp.end() - 1);
    std::vector<double> Lx(lnz), x(n, 0.0);
    std::fill(mark.begin(), mark.end(), -1);
    for (int k = 0; k < n; k++)
    {
        int top = ereach(k);
        double d = 0.0;
        for (int p = Cp[k]; p < Cp[k + 1]; p++)
        {
            int i = Ci[p];
            if (i < k)
                x[i] = Cx[p];
            else if (i == k)
                d = Cx[p];
        }
        for (int pp = top; pp < n; pp++)
        {
            int i = s[pp];             // pattern of row k, topological order
            double lki = x[i] / Lx[Lp[i]]; // L[i,i] is column i's first entry
            x[i] = 0.0;
            for (int q = Lp[i] + 1; q < c[i]; q++)
                x[Li[q]] -= Lx[q] * lki;
            d -= lki * lki;
            int q = c[i]++;
            Li[q] = k;
            Lx[q] = lki;
        }
        if (d <= 0.0)
            return 0; // not positive definite
        int q = c[k]++;
        Li[q] = k;
        Lx[q] = std::sqrt(d);
    }

    // ---- solve L z = P b, then L' y = z, then x = P' y ------------------
    std::vector<double> z(n);
    for (int k = 0; k < n; k++)
        z[k] = b[perm[k]];
    for (int j = 0; j < n; j++)
    {
        z[j] /= Lx[Lp[j]];
        for (int p = Lp[j] + 1; p < Lp[j + 1]; p++)
            z[Li[p]] -= Lx[p] * z[j];
    }
    for (int j = n - 1; j >= 0; j--)
    {
        for (int p = Lp[j] + 1; p < Lp[j + 1]; p++)
            z[j] -= Lx[p] * z[Li[p]];
        z[j] /= Lx[Lp[j]];
    }
    for (int k = 0; k < n; k++)
        b[perm[k]] = z[k];
    return 1;
}

// --- helpers only reached from the harness-unused doPCG path --------------

extern "C" cs *cs_transpose(const cs *A, int values)
{
    if (!A || A->nz != -1)
        return NULL;
    int m = A->m, n = A->n, nnz = A->p[n];
    cs *T = cs_spalloc(n, m, nnz, values && A->x, 0);
    if (!T)
        return NULL;
    std::vector<int> w(m, 0);
    for (int p = 0; p < nnz; p++)
        w[A->i[p]]++;
    T->p[0] = 0;
    for (int i = 0; i < m; i++)
        T->p[i + 1] = T->p[i] + w[i];
    for (int i = 0; i < m; i++)
        w[i] = T->p[i];
    for (int j = 0; j < n; j++)
        for (int p = A->p[j]; p < A->p[j + 1]; p++)
        {
            int q = w[A->i[p]]++;
            T->i[q] = j;
            if (T->x)
                T->x[q] = A->x[p];
        }
    return T;
}

extern "C" int cs_fkeep(cs *A, int (*fkeep)(int, int, double, void *),
                        void *other)
{
    if (!A || A->nz != -1)
        return -1;
    int nz = 0;
    for (int j = 0; j < A->n; j++)
    {
        int p = A->p[j];
        A->p[j] = nz;
        for (; p < A->p[j + 1]; p++)
            if (fkeep(A->i[p], j, A->x ? A->x[p] : 1.0, other))
            {
                if (A->x)
                    A->x[nz] = A->x[p];
                A->i[nz++] = A->i[p];
            }
    }
    A->p[A->n] = nz;
    return nz;
}

extern "C" cs *cs_add(const cs *A, const cs *B, double alpha, double beta)
{
    if (!A || !B || A->m != B->m || A->n != B->n)
        return NULL;
    int m = A->m, n = A->n;
    cs *C = cs_spalloc(m, n, A->p[n] + B->p[n], 1, 0);
    if (!C)
        return NULL;
    std::vector<int> mark(m, -1);
    std::vector<double> acc(m, 0.0);
    int nz = 0;
    for (int j = 0; j < n; j++)
    {
        C->p[j] = nz;
        for (int p = A->p[j]; p < A->p[j + 1]; p++)
        {
            int i = A->i[p];
            if (mark[i] != j)
            {
                mark[i] = j;
                acc[i] = 0.0;
                C->i[nz++] = i;
            }
            acc[i] += alpha * A->x[p];
        }
        for (int p = B->p[j]; p < B->p[j + 1]; p++)
        {
            int i = B->i[p];
            if (mark[i] != j)
            {
                mark[i] = j;
                acc[i] = 0.0;
                C->i[nz++] = i;
            }
            acc[i] += beta * B->x[p];
        }
        for (int q = C->p[j]; q < nz; q++)
            C->x[q] = acc[C->i[q]];
    }
    C->p[n] = nz;
    return C;
}
