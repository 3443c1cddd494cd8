/* Shim: the public CSparse compressed-column struct + the entry points
 * csparse.cpp links, implemented from scratch in ../cs_impl.cpp (sparse
 * up-looking Cholesky + minimum-degree ordering) so the reference's
 * SPARSE doSPA path runs unmodified. */
#ifndef _CS_H
#define _CS_H
typedef struct cs_sparse
{
    int nzmax;
    int m;
    int n;
    int *p;
    int *i;
    double *x;
    int nz;
} cs;

cs *cs_spalloc(int m, int n, int nzmax, int values, int triplet);
cs *cs_spfree(cs *A);
int cs_cholsol(int order, const cs *A, double *b);
cs *cs_transpose(const cs *A, int values);
int cs_fkeep(cs *A, int (*fkeep)(int, int, double, void *), void *other);
cs *cs_add(const cs *A, const cs *B, double alpha, double beta);
#endif
