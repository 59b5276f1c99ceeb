/* C interface smoke test: the doc QP through the C API, warm update +
 * re-solve (the analog of the reference's c_interface_test.cpp). */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "piqp_tpu_c.h"

static int approx(double a, double b, double tol)
{
    return fabs(a - b) <= tol;
}

int main(void)
{
    /* min 3x0^2 + 2x1^2 - x0 - 4x1  s.t. x0 - 2 x1 = 0 */
    double P[4] = {6.0, 0.0, 0.0, 4.0};
    double c[2] = {-1.0, -4.0};
    double A[2] = {1.0, -2.0};
    double b[1] = {0.0};

    piqp_tpu_dense_data data = {0};
    data.P = P;
    data.c = c;
    data.A = A;
    data.b = b;
    data.n = 2;
    data.p = 1;
    data.m = 0;

    piqp_tpu_settings settings;
    piqp_tpu_settings_default(&settings);

    piqp_tpu_workspace* w = piqp_tpu_setup_dense(&data, &settings);
    if (!w) {
        fprintf(stderr, "setup failed: %s\n", piqp_tpu_last_error());
        return 1;
    }

    int status = piqp_tpu_solve(w);
    if (status != 1) {
        fprintf(stderr, "solve failed: status=%d (%s)\n", status,
                piqp_tpu_last_error());
        return 1;
    }

    piqp_tpu_result res;
    if (piqp_tpu_get_result(w, &res) != 0) {
        fprintf(stderr, "get_result failed\n");
        return 1;
    }
    printf("x = [%f, %f], iters = %d\n", res.x[0], res.x[1], res.iter);
    if (!approx(res.x[0], 3.0 / 7.0, 1e-6) ||
        !approx(res.x[1], 3.0 / 14.0, 1e-6)) {
        fprintf(stderr, "wrong solution\n");
        return 1;
    }

    /* warm update: change the linear cost, re-solve */
    double c2[2] = {-2.0, -4.0};
    piqp_tpu_dense_data upd = {0};
    upd.c = c2;
    upd.n = 2;
    upd.p = 0;
    upd.m = 0;
    if (piqp_tpu_update_dense(w, &upd) != 0) {
        fprintf(stderr, "update failed: %s\n", piqp_tpu_last_error());
        return 1;
    }
    status = piqp_tpu_solve(w);
    if (status != 1) {
        fprintf(stderr, "re-solve failed: status=%d\n", status);
        return 1;
    }
    piqp_tpu_get_result(w, &res);
    printf("updated x = [%f, %f]\n", res.x[0], res.x[1]);
    /* KKT by hand: x = (2y+2, 4-y)/..; solving gives x0=2x1,
     * 6x0 - 2 + ... -> x0 = 10/22*2 ... just check constraint + optimality
     * via residuals */
    if (res.primal_res > 1e-8 || res.dual_res > 1e-8) {
        fprintf(stderr, "bad residuals after update\n");
        return 1;
    }
    if (!approx(res.x[0] - 2.0 * res.x[1], 0.0, 1e-8)) {
        fprintf(stderr, "constraint violated after update\n");
        return 1;
    }

    piqp_tpu_free(w);
    printf("C interface test passed\n");
    return 0;
}
