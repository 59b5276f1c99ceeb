"""Solver behavior tests — mirrors the reference test strategy
(/root/reference/tests/src/dense/solver_test.cpp, SURVEY.md section 4):
analytic micro-QPs with known solutions, infeasibility certificates,
random strongly convex QPs with independent KKT verification, update paths.
"""

import numpy as np
import pytest

import piqp_tpu
from piqp_tpu import DenseSolver, Settings, Status, solve_dense
from piqp_tpu.utils.random import dense_strongly_convex_qp

from helpers import check_optimality

INF = np.inf


def test_simple_qp_with_update():
    # mirrors DenseSolverTest.SimpleQPWithUpdate (solver_test.cpp:30-105)
    P = np.array([[6.0, 0.0], [0.0, 4.0]])
    c = np.array([-1.0, -4.0])
    A = np.array([[1.0, -2.0]])
    b = np.array([0.0])
    G = np.array([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
    h_l = np.array([-1.0, -INF, -2.0])
    h_u = np.array([INF, 1.0, 2.0])
    x_l = np.array([-INF, -1.0])
    x_u = np.array([INF, 1.0])

    solver = DenseSolver()
    solver.setup(P, c, A, b, G, h_l, h_u, x_l, x_u)
    status = solver.solve()
    assert status == Status.SOLVED
    r = solver.result
    assert np.isclose(r.x[0], 0.4285714, atol=1e-6)
    assert np.isclose(r.x[1], 0.2142857, atol=1e-6)
    assert np.isclose(r.y[0], -1.5714286, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.z_l), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.z_u), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.z_bl), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.z_bu), 0, atol=1e-6)

    # update (second QP of the reference test)
    P2 = P.copy(); P2[0, 0] = 8
    A2 = A.copy(); A2[0, 1] = -3
    h_u2 = h_u.copy(); h_u2[0] = 2
    x_u2 = x_u.copy(); x_u2[1] = 2
    solver.update(P=P2, A=A2, h_u=h_u2, x_u=x_u2)
    status = solver.solve()
    assert status == Status.SOLVED
    r = solver.result
    assert np.isclose(r.x[0], 0.2763157, atol=1e-6)
    assert np.isclose(r.x[1], 0.0921056, atol=1e-6)
    assert np.isclose(r.y[0], -1.2105263, atol=1e-6)


def test_primal_infeasible_qp():
    # mirrors DenseSolverTest.PrimalInfeasibleQP (solver_test.cpp:107-135)
    P = np.array([[6.0, 0.0], [0.0, 4.0]])
    c = np.array([-1.0, -4.0])
    A = np.array([[1.0, -2.0]])
    b = np.array([0.0])
    G = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    h = np.array([0.0, 2.0, 1.0, -1.0])

    res = solve_dense(P, c, A, b, G, None, h)
    assert int(res.info.status) == Status.PRIMAL_INFEASIBLE


def test_dual_infeasible_qp():
    # mirrors DenseSolverTest.DualInfeasibleQP (solver_test.cpp:128-154):
    # min -x1 - x2 s.t. 0 <= x  (unbounded below)
    P = np.zeros((2, 2))
    c = np.array([-1.0, -1.0])
    G = np.array([[-1.0, 0.0], [0.0, -1.0]])
    h_u = np.array([0.0, 0.0])

    res = solve_dense(P, c, None, None, G, None, h_u)
    assert int(res.info.status) == Status.DUAL_INFEASIBLE


def test_equality_only_qp():
    # min 0.5 x'Px + c'x s.t. A x = b has closed-form KKT solution
    rng = np.random.default_rng(0)
    n, p = 8, 3
    Q = rng.standard_normal((n, n))
    P = Q @ Q.T + n * np.eye(n)
    c = rng.standard_normal(n)
    A = rng.standard_normal((p, n))
    b = rng.standard_normal(p)

    res = solve_dense(P, c, A, b)
    assert int(res.info.status) == Status.SOLVED

    # verify against the analytic saddle-point solution
    K = np.block([[P, A.T], [A, np.zeros((p, p))]])
    sol = np.linalg.solve(K, np.concatenate([-c, b]))
    np.testing.assert_allclose(np.asarray(res.x), sol[:n], atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.y), sol[n:], atol=1e-7)


def test_unconstrained_qp():
    rng = np.random.default_rng(1)
    n = 6
    Q = rng.standard_normal((n, n))
    P = Q @ Q.T + n * np.eye(n)
    c = rng.standard_normal(n)
    res = solve_dense(P, c)
    assert int(res.info.status) == Status.SOLVED
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(P, -c), atol=1e-7)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("dims", [(10, 0, 8), (20, 5, 12), (32, 8, 20), (13, 3, 0)])
def test_random_strongly_convex(seed, dims):
    n, p, m = dims
    prob = dense_strongly_convex_qp(n, p, m, seed=seed)
    res = solve_dense(**prob)
    assert int(res.info.status) == Status.SOLVED, piqp_tpu.status_to_string(
        int(res.info.status)
    )
    check_optimality(prob, res, tol=1e-6)


def test_infinite_bound_rows_disabled():
    # rows of G with both bounds infinite must be neutralized
    # (mirrors solver_test.cpp's infinite bounds tests / data.hpp:144-169)
    P = np.eye(2)
    # optimum strictly outside the box -> bounds firmly active (nondegenerate)
    c = np.array([-2.0, -2.0])
    G = np.array([[1.0, 0.0], [5.0, 5.0], [0.0, 1.0]])
    h_l = np.array([-1.0, -INF, -1.0])
    h_u = np.array([1.0, INF, 1.0])
    res = solve_dense(P, c, None, None, G, h_l, h_u)
    assert int(res.info.status) == Status.SOLVED
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-7)


def test_one_sided_inequalities():
    # only lower or only upper bounds present
    P = np.eye(2)
    c = np.array([1.0, 1.0])
    G = np.array([[1.0, 0.0], [0.0, 1.0]])
    h_l = np.array([0.5, 0.25])
    res = solve_dense(P, c, None, None, G, h_l, None)
    assert int(res.info.status) == Status.SOLVED
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.25], atol=1e-7)


def test_box_only_qp():
    P = np.eye(3)
    c = np.array([-10.0, 10.0, 0.0])
    x_l = np.array([-1.0, -1.0, -1.0])
    x_u = np.array([1.0, 1.0, 1.0])
    res = solve_dense(P, c, x_l=x_l, x_u=x_u)
    assert int(res.info.status) == Status.SOLVED
    np.testing.assert_allclose(np.asarray(res.x), [1.0, -1.0, 0.0], atol=1e-7)
    # inactive bound duals vanish to solver tolerance
    assert abs(np.asarray(res.z_bu)[1]) < 1e-7


def test_non_strongly_convex():
    # P singular but bounded problem (solver_test.cpp:201+ analog)
    P = np.diag([1.0, 0.0])
    c = np.array([0.0, 1.0])
    x_l = np.array([-1.0, -1.0])
    x_u = np.array([1.0, 1.0])
    res = solve_dense(P, c, x_l=x_l, x_u=x_u)
    assert int(res.info.status) == Status.SOLVED
    assert np.isclose(float(res.info.primal_obj), -1.0, atol=1e-6)


def test_invalid_settings():
    solver = DenseSolver(Settings(eps_abs=-1.0))
    solver.setup(np.eye(2), np.zeros(2))
    assert solver.solve() == Status.INVALID_SETTINGS


def test_info_fields():
    prob = dense_strongly_convex_qp(10, 2, 5, seed=7)
    res = solve_dense(**prob)
    info = res.info
    assert int(info.iter) > 0
    assert float(info.primal_res) < 1e-8 or float(info.primal_res_rel) < 1e-9
    assert float(info.duality_gap) < 1e-7
    p_obj = float(info.primal_obj)
    x = np.asarray(res.x)
    P = np.asarray(prob["P"])
    expected = 0.5 * x @ (np.triu(P) + np.triu(P, 1).T) @ x + prob["c"] @ x
    assert np.isclose(p_obj, expected, rtol=1e-6, atol=1e-8)


def test_certificate_validation_toggle():
    """verify_certificates=False reproduces the reference's raw stall-counter
    exits (solver.hpp:616-630); on clean infeasible problems both modes
    certify identically."""
    P = np.array([[6.0, 0.0], [0.0, 4.0]])
    c = np.array([-1.0, -4.0])
    A = np.array([[1.0, -2.0]])
    b = np.array([0.0])
    G = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    h = np.array([0.0, 2.0, 1.0, -1.0])

    for vc in (True, False):
        res = solve_dense(P, c, A, b, G, None, h,
                          settings=Settings(verify_certificates=vc))
        assert int(res.info.status) == Status.PRIMAL_INFEASIBLE, vc


def test_violation_certificate_matches_host_under_scaling():
    """The device _violation_certificate must score the same (unscaled) ray
    quality as the host twin hostsparse._primal_ray_quality on fully
    unscaled data, even with nontrivial Ruiz scaling and active box bounds
    (the unscale identity divides by d_x: A_s = D_y A D_x)."""
    import jax.numpy as jnp

    from piqp_tpu import hostsparse, ruiz, solver as solver_mod
    from piqp_tpu.api import prepare_data
    from piqp_tpu.types import Vars

    rng = np.random.default_rng(0)
    n, p, m = 6, 2, 4
    P = np.diag(10.0 ** rng.uniform(-3, 3, n))
    c = rng.normal(size=n) * 10.0 ** rng.uniform(-2, 2, n)
    A = rng.normal(size=(p, n)) * 10.0 ** rng.uniform(-2, 2, (p, 1))
    b = rng.normal(size=p)
    G = rng.normal(size=(m, n)) * 10.0 ** rng.uniform(-2, 2, (m, 1))
    h_l = -np.abs(rng.normal(size=m))
    h_u = np.abs(rng.normal(size=m))
    x_l = np.full(n, -2.0)
    x_u = np.full(n, 2.0)

    data = prepare_data(P, c, A, b, G, h_l, h_u, x_l, x_u)
    sdata, sc = ruiz.equilibrate(data, max_iter=10, scale_cost=False)
    assert float(jnp.max(jnp.abs(sc.d_x - 1.0))) > 0.1  # scaling nontrivial

    x = rng.normal(size=n) * 3.0  # violates bounds/inequalities generically
    x_s = jnp.asarray(x) / sc.d_x
    z = lambda k: jnp.zeros(k, x_s.dtype)
    v = Vars(x_s, z(p), z(m), z(m), z(n), z(n), z(m), z(m), z(n), z(n))
    ray_dev, eq_dev, sup_dev, norm_dev = solver_mod._violation_certificate(
        sdata, sc, v
    )

    d0 = hostsparse.prepare_sparse(P, c, A, b, G, h_l, h_u, x_l, x_u)
    ray_host = hostsparse._violation_primal_ray(d0, x)
    eq_h, neg_h, sup_h = hostsparse._primal_ray_quality(d0, *ray_host)

    assert float(eq_dev) == pytest.approx(float(eq_h), rel=1e-8)
    assert float(sup_dev) == pytest.approx(float(sup_h), rel=1e-8)
    nh = max(np.abs(r).max(initial=0.0) for r in ray_host)
    assert float(norm_dev) == pytest.approx(nh, rel=1e-8)
    np.testing.assert_allclose(np.asarray(ray_dev[0]), ray_host[0],
                               rtol=1e-8, atol=1e-12)


def test_centrality_correctors_equivalent_and_fewer_iters():
    """Gondzio correctors (opt-in): identical solutions and statuses, and
    the iteration total over a seed sweep must not increase (measured:
    ~10% fewer; rounds are accept-only-if-longer-step, so monotone)."""
    import numpy as np

    from piqp_tpu import Settings, solve_dense
    from piqp_tpu.utils.random import dense_strongly_convex_qp

    tot0 = tot2 = 0
    for seed in range(6):
        prob = dense_strongly_convex_qp(32, 12, 16, seed=7000 + seed)
        r0 = solve_dense(**prob, settings=Settings())
        r2 = solve_dense(**prob, settings=Settings(centrality_correctors=2))
        assert int(r0.info.status) == 1 and int(r2.info.status) == 1
        # both are eps_abs=1e-8 KKT points; with strong-convexity 1e-2
        # two such points can differ by ~eps/sigma_min in x
        np.testing.assert_allclose(
            np.asarray(r2.x), np.asarray(r0.x), atol=3e-5
        )
        tot0 += int(r0.info.iter)
        tot2 += int(r2.info.iter)
    assert tot2 <= tot0, (tot2, tot0)
