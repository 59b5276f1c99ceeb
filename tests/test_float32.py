"""float32 fast-path tests: lower precision + iterative refinement
(the reference's refinement mechanism, kkt_system.hpp:256-301, is exactly
the tool to recover accuracy from a lower-precision factorization —
SURVEY.md section 7 delta 5)."""

import numpy as np
import pytest

from piqp_tpu import Settings, Status, solve_dense
from piqp_tpu.utils.random import dense_strongly_convex_qp

from helpers import check_optimality

F32 = Settings(
    dtype="float32",
    eps_abs=1e-5,
    eps_rel=1e-6,
    eps_duality_gap_abs=1e-5,
    eps_duality_gap_rel=1e-6,
    iterative_refinement_always_enabled=True,
    iterative_refinement_eps_abs=1e-6,
    iterative_refinement_eps_rel=1e-6,
    iterative_refinement_static_regularization_eps=1e-6,
)


def test_f32_simple_qp():
    P = np.array([[6.0, 0.0], [0.0, 4.0]])
    c = np.array([-1.0, -4.0])
    A = np.array([[1.0, -2.0]])
    b = np.array([0.0])
    res = solve_dense(P, c, A, b, settings=F32)
    assert int(res.info.status) == Status.SOLVED
    assert res.x.dtype == np.float32
    assert np.isclose(float(res.x[0]), 0.4285714, atol=1e-4)


def test_f32_random_qp():
    prob = dense_strongly_convex_qp(16, 4, 8, seed=3)
    res = solve_dense(**prob, settings=F32)
    assert int(res.info.status) == Status.SOLVED
    check_optimality(prob, res, tol=5e-3)


MIXED = Settings(mixed_precision=True)


def test_mixed_precision_full_accuracy():
    """float32 factor + float64 refinement reaches the default float64
    tolerances (eps_abs=1e-8)."""
    prob = dense_strongly_convex_qp(24, 6, 12, seed=8)
    res = solve_dense(**prob, settings=MIXED)
    assert int(res.info.status) == Status.SOLVED
    assert res.x.dtype == np.float64
    check_optimality(prob, res, tol=1e-6)
    # agrees with the pure-f64 solve
    res64 = solve_dense(**prob)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res64.x), atol=1e-6, rtol=1e-6
    )


def test_mixed_precision_multistage():
    from piqp_tpu import multistage as ms
    from piqp_tpu import solve_prepared

    sdata = ms.random_multistage_qp(T=8, D=3, Da=2, ra=2, rg=2, seed=31)
    res = solve_prepared(sdata, MIXED)
    assert int(res.info.status) == Status.SOLVED
    res64 = solve_prepared(sdata)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res64.x), atol=1e-6, rtol=1e-6
    )


def test_mixed_precision_cyclic_reduction():
    """Two-phase mixed precision composes with the cyclic-reduction
    factorization (power-of-two horizon)."""
    from piqp_tpu import multistage as ms
    from piqp_tpu import solve_prepared

    sdata = ms.random_multistage_qp(T=64, D=4, Da=2, ra=2, rg=2, seed=13)
    assert ms._use_cr(sdata.T)
    res = solve_prepared(sdata, MIXED)
    assert int(res.info.status) == Status.SOLVED
    res64 = solve_prepared(sdata)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res64.x), atol=1e-6, rtol=1e-6
    )


@pytest.mark.parametrize("passes", [-1, 0, 1, 2])
def test_refine_static_passes_policies(passes):
    """Every phase-A refinement policy (adaptive, none, 1, 2 static
    passes) reaches the default f64 tolerances under mixed precision."""
    prob = dense_strongly_convex_qp(24, 6, 12, seed=11)
    res = solve_dense(
        **prob,
        settings=Settings(mixed_precision=True, refine_static_passes=passes),
    )
    assert int(res.info.status) == Status.SOLVED
    check_optimality(prob, res, tol=1e-6)


@pytest.mark.parametrize("patience", [0, 3, 12])
def test_mixed_phase_a_patience(patience):
    """The phase-A stall guard (any patience, incl. disabled) preserves
    solutions on well-behaved problems — it only changes trajectories
    that plateau."""
    prob = dense_strongly_convex_qp(16, 4, 8, seed=12)
    res = solve_dense(
        **prob,
        settings=Settings(mixed_precision=True,
                          mixed_phase_a_patience=patience),
    )
    assert int(res.info.status) == Status.SOLVED
    check_optimality(prob, res, tol=1e-6)
