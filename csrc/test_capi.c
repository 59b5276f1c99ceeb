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
    status = piqp_tpu_solve_warm(w); /* seeds from the previous iterates */
    if (status != 1) {
        fprintf(stderr, "warm re-solve failed: status=%d\n", status);
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

    /* full info mirror is populated */
    if (res.info.status != 1 || res.info.iter <= 0 ||
        res.info.primal_res > 1e-8) {
        fprintf(stderr, "info mirror wrong\n");
        return 1;
    }

    /* settings round-trip */
    piqp_tpu_settings got;
    if (piqp_tpu_get_settings(w, &got) != 0 ||
        !approx(got.eps_abs, settings.eps_abs, 0) ||
        got.max_iter != settings.max_iter || got.tau != settings.tau) {
        fprintf(stderr, "settings round-trip failed\n");
        return 1;
    }
    settings.compute_timings = 1;
    if (piqp_tpu_update_settings(w, &settings) != 0) {
        fprintf(stderr, "update_settings failed: %s\n",
                piqp_tpu_last_error());
        return 1;
    }
    status = piqp_tpu_solve(w);
    piqp_tpu_get_result(w, &res);
    if (status != 1 || res.info.solve_time <= 0.0) {
        fprintf(stderr, "compute_timings via update_settings failed\n");
        return 1;
    }

    piqp_tpu_free(w);

    /* ---- sparse (CSC) interface: same QP plus an inequality ---- */
    /* P = diag(6, 4) in CSC upper-tri; A = [1, -2]; G = [1, 0] with
     * -inf <= x0 <= 0.8 */
    {
        int Pp[3] = {0, 1, 2};
        int Pi[2] = {0, 1};
        double Px[2] = {6.0, 4.0};
        piqp_tpu_csc Pm = {2, 2, 2, Pp, Pi, Px};

        int Ap[3] = {0, 1, 2};
        int Ai[2] = {0, 0};
        double Ax[2] = {1.0, -2.0};
        piqp_tpu_csc Am = {1, 2, 2, Ap, Ai, Ax};

        int Gp[3] = {0, 1, 1};
        int Gi[1] = {0};
        double Gx[1] = {1.0};
        piqp_tpu_csc Gm = {1, 2, 1, Gp, Gi, Gx};

        double h_l[1] = {-PIQP_TPU_INF};
        double h_u[1] = {0.8};

        piqp_tpu_sparse_data sd = {0};
        sd.P = &Pm;
        sd.c = c;
        sd.A = &Am;
        sd.b = b;
        sd.G = &Gm;
        sd.h_l = h_l;
        sd.h_u = h_u;
        sd.n = 2;
        sd.p = 1;
        sd.m = 1;

        piqp_tpu_settings_default(&settings);
        piqp_tpu_workspace* ws = piqp_tpu_setup_sparse(&sd, &settings);
        if (!ws) {
            fprintf(stderr, "sparse setup failed: %s\n",
                    piqp_tpu_last_error());
            return 1;
        }
        status = piqp_tpu_solve(ws);
        if (status != 1) {
            fprintf(stderr, "sparse solve failed: status=%d (%s)\n", status,
                    piqp_tpu_last_error());
            return 1;
        }
        piqp_tpu_result rs;
        piqp_tpu_get_result(ws, &rs);
        printf("sparse x = [%f, %f]\n", rs.x[0], rs.x[1]);
        /* inequality inactive at the optimum (x0 = 3/7 < 0.8): same
         * solution as the dense equality-only QP */
        if (!approx(rs.x[0], 3.0 / 7.0, 1e-6) ||
            !approx(rs.x[1], 3.0 / 14.0, 1e-6)) {
            fprintf(stderr, "wrong sparse solution\n");
            return 1;
        }
        /* slack view present: s_l/s_u sized m */
        if (rs.s_u == NULL) {
            fprintf(stderr, "missing slack views\n");
            return 1;
        }

        /* sparse value update: tighten h_u so the inequality becomes
         * active -> x0 pinned at 0.2 */
        double h_u2[1] = {0.2};
        piqp_tpu_sparse_data su = {0};
        su.h_u = h_u2;
        su.n = 2;
        su.p = 0;
        su.m = 1;
        if (piqp_tpu_update_sparse(ws, &su) != 0) {
            fprintf(stderr, "sparse update failed: %s\n",
                    piqp_tpu_last_error());
            return 1;
        }
        status = piqp_tpu_solve(ws);
        piqp_tpu_get_result(ws, &rs);
        if (status != 1 || !approx(rs.x[0], 0.2, 1e-6)) {
            fprintf(stderr, "sparse update wrong: status=%d x0=%f\n", status,
                    rs.x[0]);
            return 1;
        }
        piqp_tpu_free(ws);
    }

    /* ---- backend selection: the dense_ldlt full-KKT signed Cholesky ---- */
    {
        piqp_tpu_settings_default(&settings);
        settings.kkt_solver = PIQP_TPU_DENSE_LDLT;
        piqp_tpu_workspace* wl = piqp_tpu_setup_dense(&data, &settings);
        if (!wl) {
            fprintf(stderr, "dense_ldlt setup failed: %s\n",
                    piqp_tpu_last_error());
            return 1;
        }
        status = piqp_tpu_solve(wl);
        piqp_tpu_result rl;
        piqp_tpu_get_result(wl, &rl);
        if (status != 1 || !approx(rl.x[0], 3.0 / 7.0, 1e-6)) {
            fprintf(stderr, "dense_ldlt solve wrong: status=%d x0=%f\n",
                    status, rl.x[0]);
            return 1;
        }
        piqp_tpu_free(wl);
    }

    printf("C interface test passed\n");
    return 0;
}
