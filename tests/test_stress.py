"""Randomized stress sweep across bound configurations.

The corpus tests exercise real-world instances; this sweep exercises the
*structural* axes (equalities only, one-sided rows, infinite bounds, dead
rows, boxes only, non-strongly-convex P, degenerate redundant rows)
against the independent numpy KKT checker (helpers.check_optimality), on
both the device dense backend and the host sparse backend — the same
coverage idea as the reference's constraint-subset tests
(/root/reference/tests/src/sparse/solver_test.cpp:201-353) but randomized.
"""

import numpy as np
import pytest

from piqp_tpu import Settings, Status, solve_dense
from piqp_tpu.hostsparse import solve_sparse_host

from helpers import check_optimality


def _spd(rng, n, reg=1.0):
    Q = rng.standard_normal((n, n))
    return Q @ Q.T + reg * np.eye(n)


def _case(kind, seed):
    """Build (problem dict, expect_solved) for a structural case."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(6, 24))
    P = _spd(rng, n)
    c = rng.standard_normal(n)
    prob = dict(P=P, c=c, A=None, b=None, G=None, h_l=None, h_u=None,
                x_l=None, x_u=None)

    if kind == "unconstrained":
        pass
    elif kind == "equalities_only":
        p = max(1, n // 3)
        A = rng.standard_normal((p, n))
        prob.update(A=A, b=A @ rng.standard_normal(n))
    elif kind == "box_only":
        prob.update(x_l=np.full(n, -1.0), x_u=np.full(n, 1.0))
    elif kind == "one_sided_upper":
        m = n
        G = rng.standard_normal((m, n))
        prob.update(G=G, h_u=G @ rng.standard_normal(n) + rng.uniform(0.1, 2, m))
    elif kind == "one_sided_lower":
        m = n
        G = rng.standard_normal((m, n))
        prob.update(G=G, h_l=G @ rng.standard_normal(n) - rng.uniform(0.1, 2, m))
    elif kind == "two_sided_mixed_inf":
        m = n + 2
        G = rng.standard_normal((m, n))
        x0 = rng.standard_normal(n)
        h_u = G @ x0 + rng.uniform(0.1, 2, m)
        h_l = G @ x0 - rng.uniform(0.1, 2, m)
        # knock out a mix of sides, leave one fully-dead row
        h_u[::3] = np.inf
        h_l[1::3] = -np.inf
        h_u[0] = np.inf
        h_l[0] = -np.inf
        prob.update(G=G, h_l=h_l, h_u=h_u)
    elif kind == "redundant_rows":
        p = max(2, n // 3)
        A = rng.standard_normal((p, n))
        A = np.vstack([A, A[:1]])  # exact duplicate row (rank-deficient)
        x0 = rng.standard_normal(n)
        prob.update(A=A, b=A @ x0)
    elif kind == "psd_only":
        # positive semi-definite P (rank n-2) with a box to keep it bounded
        Q = rng.standard_normal((n, max(1, n - 2)))
        prob.update(P=Q @ Q.T, x_l=np.full(n, -5.0), x_u=np.full(n, 5.0))
    elif kind == "everything":
        p, m = n // 3, n
        A = rng.standard_normal((p, n))
        G = rng.standard_normal((m, n))
        x0 = rng.uniform(-0.5, 0.5, n)
        prob.update(
            A=A, b=A @ x0, G=G,
            h_l=G @ x0 - rng.uniform(0.1, 2, m),
            h_u=G @ x0 + rng.uniform(0.1, 2, m),
            x_l=np.full(n, -1.0), x_u=np.full(n, 1.0),
        )
    else:
        raise ValueError(kind)
    return prob


KINDS = [
    "unconstrained", "equalities_only", "box_only", "one_sided_upper",
    "one_sided_lower", "two_sided_mixed_inf", "redundant_rows",
    "psd_only", "everything",
]


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [1, 2])
def test_stress_device_dense(kind, seed):
    prob = _case(kind, seed)
    res = solve_dense(**prob)
    assert int(res.info.status) == Status.SOLVED, (
        f"{kind}/{seed}: {int(res.info.status)}"
    )
    check_optimality(prob, res, tol=1e-6)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [1, 2])
def test_stress_host_sparse(kind, seed):
    prob = _case(kind, seed)
    res = solve_sparse_host(**prob)
    assert res.info.status == int(Status.SOLVED), (
        f"{kind}/{seed}: {res.info.status}"
    )
    check_optimality(prob, res, tol=1e-6)


@pytest.mark.parametrize("kind", ["everything", "two_sided_mixed_inf"])
def test_stress_device_host_agree(kind):
    prob = _case(kind, seed=7)
    rd = solve_dense(**prob)
    rh = solve_sparse_host(**prob)
    assert int(rd.info.status) == Status.SOLVED
    assert rh.info.status == int(Status.SOLVED)
    np.testing.assert_allclose(np.asarray(rd.x), rh.x, rtol=1e-5, atol=1e-6)
