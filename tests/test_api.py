"""API behavior tests: warm-path compile stability (the analog of the
reference's allocation-free solve/update assertions, solver_test.cpp:62-94 —
here the resource that must not leak is XLA compilations), settings
verification, and reference-name compatibility.
"""

import jax
import numpy as np
import pytest

from piqp_tpu import (
    DenseSolver,
    KKTBackend,
    Settings,
    Status,
)
from piqp_tpu.utils.random import dense_strongly_convex_qp


def test_update_resolve_does_not_retrace():
    """update() + solve() must reuse the compiled executable — the TPU
    analog of PIQP's allocation-free update path (solver.hpp:218-308,
    asserted via the Eigen malloc guard in the reference tests)."""
    prob = dense_strongly_convex_qp(16, 4, 8, seed=0)
    s = DenseSolver()
    s.setup(**prob)
    assert s.solve() == Status.SOLVED

    from piqp_tpu.api import _solve_fresh

    compiles_before = _solve_fresh._cache_size()
    rng = np.random.default_rng(1)
    for k in range(3):
        s.update(c=prob["c"] + 1e-3 * rng.standard_normal(16))
        assert s.solve() == Status.SOLVED
    assert _solve_fresh._cache_size() == compiles_before, "solve retraced"


def test_invalid_settings_rejected():
    prob = dense_strongly_convex_qp(8, 2, 4, seed=0)
    s = DenseSolver(Settings(max_iter=-1))
    s.setup(**prob)
    assert s.solve() == Status.INVALID_SETTINGS


def test_piqp_backend_name_aliases():
    assert KKTBackend.from_piqp("sparse_ldlt") == KKTBackend.sparse_host
    assert KKTBackend.from_piqp("sparse_ldlt_cond") == KKTBackend.dense_cholesky
    assert KKTBackend.from_piqp("sparse_multistage") == KKTBackend.multistage
    assert KKTBackend.from_piqp("dense_cholesky") == KKTBackend.dense_cholesky
    assert KKTBackend.from_piqp("dense_lu") == KKTBackend.dense_lu
    with pytest.raises(ValueError):
        KKTBackend.from_piqp("nope")


def test_status_to_string():
    from piqp_tpu import status_to_string

    assert status_to_string(1) == "solved"
    assert status_to_string(-2) == "primal infeasible"
    assert status_to_string(12345) == "unknown"
