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


@pytest.mark.parametrize("seed", [0, 1])
def test_condensed_route_matches_full_kkt(seed):
    """The condensed ALL_ELIMINATED host route (kkt_all_eliminated.hpp
    algebra: n x n K = P + diag(x_reg) + delta^-1 A'A + G'WG) must produce
    the same solution as the full-KKT LU on the same problem."""
    from piqp_tpu.hostsparse import _KKT, equilibrate_host
    from piqp_tpu.utils.random import sparse_strongly_convex_qp

    prob = sparse_strongly_convex_qp(60, 20, 20, seed=seed)
    data = prepare_sparse(**prob)

    res_cond = solve_host(data)
    assert res_cond.info.status == int(Status.SOLVED)

    # force the full-KKT route by monkeypatching route selection
    orig = _KKT._choose_route
    _KKT._choose_route = lambda self: "full"
    try:
        res_full = solve_host(data)
    finally:
        _KKT._choose_route = orig
    assert res_full.info.status == int(Status.SOLVED)
    np.testing.assert_allclose(res_cond.x, res_full.x, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(res_cond.y, res_full.y, rtol=1e-5, atol=1e-7)


def test_condensed_route_selected_for_sparse_eq():
    """CVXQP-style instances (banded P, a few nnz per row of A, no G)
    should take the condensed route; it is where the 23x CVXQP1_L tail win
    comes from (docs/performance.md round 5).  A 10%-dense random instance
    (A'A pattern blows up) must stay on the full KKT."""
    from piqp_tpu.hostsparse import _KKT
    from piqp_tpu.utils.random import sparse_strongly_convex_qp

    n, p = 400, 200
    rng = np.random.default_rng(7)
    P = sp.diags([np.full(n - 1, -1.0), rng.uniform(3, 4, n),
                  np.full(n - 1, -1.0)], [-1, 0, 1], format="csc")
    # 3 nnz per row of A, CVXQP-style x_i + x_j + x_k = b_i
    rows = np.repeat(np.arange(p), 3)
    cols = rng.integers(0, n, 3 * p)
    A = sp.csc_matrix((rng.standard_normal(3 * p), (rows, cols)), (p, n))
    data = prepare_sparse(P=P, c=np.ones(n), A=A, b=A @ np.ones(n))
    assert _KKT(data, Settings())._choose_route() == "cond"

    dense_prob = sparse_strongly_convex_qp(200, 100, 0, seed=7)
    data2 = prepare_sparse(**dense_prob)
    assert _KKT(data2, Settings())._choose_route() == "full"


@pytest.mark.parametrize("mode", ["eq", "ineq", "full", "cond"])
def test_elimination_modes_match(mode):
    """Every KKT elimination level (kkt_eq_eliminated.hpp /
    kkt_ineq_eliminated.hpp / kkt_all_eliminated.hpp / kkt_full.hpp)
    produces the same solution on a mixed-constraint sparse QP."""
    from piqp_tpu.utils.random import sparse_strongly_convex_qp

    prob = sparse_strongly_convex_qp(60, 18, 24, seed=5)
    ref = solve_sparse_host(**prob, kkt_mode="full")
    assert ref.info.status == int(Status.SOLVED)
    res = solve_sparse_host(**prob, kkt_mode=mode)
    assert res.info.status == int(Status.SOLVED), mode
    np.testing.assert_allclose(res.x, ref.x, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(res.y, ref.y, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("mode", ["eq", "ineq"])
def test_elimination_modes_corpus_instance(mode):
    """The partially-eliminated modes solve a real corpus instance with
    both equality and inequality structure (mirrors the reference's
    maros_meszaros_tests over its KKT modes)."""
    from piqp_tpu.utils.io import load_mat

    prob = load_mat(
        "/root/reference/tests/data/maros_meszaros/HS118.mat", sparse=True
    )
    res = solve_sparse_host(**prob, kkt_mode=mode)
    assert res.info.status == int(Status.SOLVED), mode


@pytest.mark.parametrize("mode", ["eq", "ineq"])
def test_elimination_modes_eq_or_ineq_only(mode):
    """Degenerate block shapes: eq mode with p=0 and ineq mode with m=0
    reduce to bordered/condensed forms without failing."""
    from piqp_tpu.utils.random import sparse_strongly_convex_qp

    prob = sparse_strongly_convex_qp(40, 0 if mode == "eq" else 12,
                                     14 if mode == "eq" else 0, seed=9)
    res = solve_sparse_host(**prob, kkt_mode=mode)
    assert res.info.status == int(Status.SOLVED)


@pytest.mark.parametrize("mode", ["eq", "ineq", "cond", "full"])
def test_sparse_solver_host_kkt_mode(mode):
    """SparseSolver(host_kkt_mode=...) threads the elimination level to
    the host route end-to-end."""
    from piqp_tpu.utils.random import sparse_strongly_convex_qp

    prob = sparse_strongly_convex_qp(60, 18, 24, seed=5)
    s = SparseSolver(
        Settings(kkt_solver=__import__("piqp_tpu").KKTBackend.sparse_host),
        host_kkt_mode=mode,
    )
    s.setup(**prob)
    assert s.solve() == Status.SOLVED, mode
