/* piqp_tpu C interface.
 *
 * C-callable surface over the TPU-native solver, the analog of the
 * reference's C interface (/root/reference/interfaces/c/include/piqp.h:21-43
 * and piqp_typedef.h:27-196 define the shape being mirrored; this is a
 * fresh implementation embedding the Python runtime, since Python is the
 * host language of the TPU framework the way C++ is the reference's).
 *
 * Threading: calls must come from one thread (the embedded interpreter
 * owns the device runtime).  All matrices are row-major double arrays.
 */
#ifndef PIQP_TPU_C_H
#define PIQP_TPU_C_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct piqp_tpu_workspace piqp_tpu_workspace; /* opaque */

typedef struct {
    /* min 0.5 x'Px + c'x  s.t. Ax=b, h_l <= Gx <= h_u, x_l <= x <= x_u.
     * P: n*n row-major (upper triangle used); A: p*n; G: m*n.
     * Any of A/b/G/h_l/h_u/x_l/x_u may be NULL (p/m 0 as applicable;
     * NULL bounds mean +/- infinity). */
    const double* P;
    const double* c;
    const double* A;
    const double* b;
    const double* G;
    const double* h_l;
    const double* h_u;
    const double* x_l;
    const double* x_u;
    int n;
    int p;
    int m;
} piqp_tpu_dense_data;

typedef struct {
    double eps_abs;            /* default 1e-8 */
    double eps_rel;            /* default 1e-9 */
    int max_iter;              /* default 250 */
    double infeasibility_threshold; /* default 0.9 */
    int verbose;               /* default 0 */
} piqp_tpu_settings;

typedef struct {
    /* views owned by the workspace; valid until the next solve/free */
    const double* x;    /* n */
    const double* y;    /* p */
    const double* z_l;  /* m */
    const double* z_u;  /* m */
    const double* z_bl; /* n */
    const double* z_bu; /* n */
    int status;         /* piqp status code (1 = solved) */
    int iter;
    double primal_obj;
    double primal_res;
    double dual_res;
} piqp_tpu_result;

/* Fill settings with the library defaults. */
void piqp_tpu_settings_default(piqp_tpu_settings* s);

/* Create a workspace from dense problem data.  Returns NULL on error
 * (piqp_tpu_last_error() describes it). */
piqp_tpu_workspace* piqp_tpu_setup_dense(const piqp_tpu_dense_data* data,
                                         const piqp_tpu_settings* settings);

/* Update problem values in place (shapes must match setup; NULL fields
 * keep their current values).  Returns 0 on success. */
int piqp_tpu_update_dense(piqp_tpu_workspace* w,
                          const piqp_tpu_dense_data* data);

/* Solve; returns the status code (1 = solved) or -100 on internal error. */
int piqp_tpu_solve(piqp_tpu_workspace* w);

/* Result views for the last solve.  Returns 0 on success. */
int piqp_tpu_get_result(piqp_tpu_workspace* w, piqp_tpu_result* out);

/* Destroy the workspace. */
void piqp_tpu_free(piqp_tpu_workspace* w);

/* Last error message (static buffer). */
const char* piqp_tpu_last_error(void);

#ifdef __cplusplus
}
#endif

#endif /* PIQP_TPU_C_H */
