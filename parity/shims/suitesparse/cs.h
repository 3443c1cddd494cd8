/* Shim: the public CSparse compressed-column struct declaration, so the
 * reference's csparse.h compiles. No CSparse functions are linked — the
 * golden harness exercises only the dense-Cholesky path of doSPA. */
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
#endif
