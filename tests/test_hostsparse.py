"""Host sparse backend tests: the NumPy/SciPy twin must agree with the
device (dense condensed) solver — the same cross-backend oracle pattern the
reference uses between its KKT backends (tests/src/sparse/kkt_test.cpp,
multistage_kkt_test.cpp).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from piqp_tpu import Settings, Status, solve_dense, SparseSolver
from piqp_tpu.hostsparse import prepare_sparse, solve_host, solve_sparse_host
from piqp_tpu.utils.random import dense_strongly_convex_qp


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_host_matches_device_dense(seed):
    prob = dense_strongly_convex_qp(30, 8, 12, seed=seed)
    res_dev = solve_dense(**prob)
    assert int(res_dev.info.status) == Status.SOLVED

    res_host = solve_sparse_host(**prob)
    assert res_host.info.status == int(Status.SOLVED)
    np.testing.assert_allclose(res_host.x, np.asarray(res_dev.x), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(res_host.y, np.asarray(res_dev.y), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        res_host.z_u, np.asarray(res_dev.z_u), rtol=1e-5, atol=1e-6
    )


def test_host_equality_only():
    rng = np.random.default_rng(3)
    n, p = 20, 6
    M = rng.standard_normal((n, n))
    P = M @ M.T + n * np.eye(n)
    c = rng.standard_normal(n)
    A = rng.standard_normal((p, n))
    b = rng.standard_normal(p)
    res_host = solve_sparse_host(P, c, A, b)
    res_dev = solve_dense(P, c, A, b)
    assert res_host.info.status == int(Status.SOLVED)
    np.testing.assert_allclose(res_host.x, np.asarray(res_dev.x), rtol=1e-7, atol=1e-9)


def test_host_infeasible_detection():
    # x >= 1 and x <= 0 simultaneously -> primal infeasible
    P = np.eye(2)
    c = np.zeros(2)
    G = np.array([[1.0, 0.0], [-1.0, 0.0]])
    h_u = np.array([-1.0, -1.0])  # x0 <= -1 and -x0 <= -1
    res = solve_sparse_host(P, c, G=G, h_u=h_u)
    assert res.info.status == int(Status.PRIMAL_INFEASIBLE)


def test_sparse_solver_routes_large_to_host():
    rng = np.random.default_rng(7)
    n = 600  # > DENSE_ROUTING_MAX_N
    P = sp.diags(rng.uniform(1.0, 2.0, n)).tocsc()
    c = rng.standard_normal(n)
    # banded G
    G = sp.eye(n, format="csc")
    h_u = rng.uniform(0.5, 1.5, n)
    s = SparseSolver()
    s.setup(P, c, G=G, h_u=h_u)
    assert s._host_raw is not None  # routed to host backend
    assert s.solve() == Status.SOLVED
    # analytic solution of min 1/2 x'Dx + c'x s.t. x <= h  (per-coordinate)
    x_exp = np.minimum(-c / P.diagonal(), h_u)
    np.testing.assert_allclose(s.result.x, x_exp, rtol=1e-5, atol=1e-5)


def test_sparse_solver_force_host_small():
    prob = dense_strongly_convex_qp(20, 4, 8, seed=9)
    s = SparseSolver(Settings(kkt_solver=__import__("piqp_tpu").KKTBackend.sparse_host))
    s.setup(**prob)
    assert s._host_raw is not None
    assert s.solve() == Status.SOLVED
    res_dev = solve_dense(**prob)
    np.testing.assert_allclose(
        s.result.x, np.asarray(res_dev.x), rtol=1e-6, atol=1e-7
    )
