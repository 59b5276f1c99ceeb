"""Pallas batched cholesky-with-inverse kernel (ops/pallas_chol.py) —
equivalence vs XLA's cholesky, and end-to-end IPM runs with
Settings(pallas_kernels=True).

On the CPU test backend the kernel runs in interpreter mode (the identical
kernel body compiles under Mosaic on TPU; tests/test_pallas.py re-runs on
the real chip via PIQP_TPU_TEST_TPU=1).

Mirrors the reference's kernel-test layer for the blocked dense
factorization (tests/src/dense/ldlt_test.cpp; kernel being replaced:
dense/ldlt_no_pivot.hpp:279-354).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piqp_tpu import DenseSolver, Settings, Status
from piqp_tpu.batch import prepare_batch, solve_batch
from piqp_tpu.ops.pallas_chol import (
    _chol_inv_xla,
    _pallas_chol_inv_batched,
    cholesky_with_inverse,
    inv_solve,
)
from piqp_tpu.utils.random import dense_strongly_convex_qp

from helpers import check_optimality


def _spd_batch(B, n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.uniform(-1, 1, (B, n, n))
    K = Q @ np.swapaxes(Q, 1, 2) + n * np.eye(n)
    return jnp.asarray(K, dtype)


@pytest.mark.parametrize("n", [8, 32, 100, 128, 256])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_kernel_matches_xla_cholesky(n, dtype):
    B = 5  # deliberately not a multiple of the tile size (pads internally)
    K = _spd_batch(B, n, dtype, seed=n)
    L, Linv = _pallas_chol_inv_batched(K)
    L_ref = jnp.linalg.cholesky(K)
    tol = 5e-5 if dtype == jnp.float32 else 1e-11
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=tol, rtol=tol)
    # Linv is the exact triangular inverse
    eye = np.broadcast_to(np.eye(n), (B, n, n))
    np.testing.assert_allclose(
        np.asarray(L @ Linv), eye, atol=50 * tol, rtol=0
    )


def test_inv_solve_roundtrip():
    B, n = 4, 64
    K = _spd_batch(B, n, jnp.float64, seed=3)
    L, Linv = _pallas_chol_inv_batched(K)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((B, n)))
    x = inv_solve(Linv, v)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bj->bi", K, x)), np.asarray(v), atol=1e-9
    )


def test_custom_vmap_dispatch():
    """Unbatched call -> XLA fallback; vmapped call -> the Pallas kernel.
    Both must agree."""
    n = 48
    K = _spd_batch(6, n, jnp.float64, seed=1)
    L1, I1 = jax.vmap(cholesky_with_inverse)(K)
    L0, I0 = _chol_inv_xla(K[0])
    np.testing.assert_allclose(np.asarray(L1[0]), np.asarray(L0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(I1[0]), np.asarray(I0), atol=1e-9)


def test_dense_solver_pallas_end_to_end():
    prob = dense_strongly_convex_qp(24, 6, 12, seed=11)
    s = DenseSolver(Settings(pallas_kernels=True))
    s.setup(**prob)
    assert s.solve() == Status.SOLVED
    check_optimality(prob, s.result, tol=1e-6)
    # same solution as the XLA route
    s2 = DenseSolver(Settings())
    s2.setup(**prob)
    assert s2.solve() == Status.SOLVED
    np.testing.assert_allclose(
        np.asarray(s.result.x), np.asarray(s2.result.x), atol=1e-7
    )


@pytest.mark.parametrize("mixed", [False, True])
def test_batched_solve_pallas(mixed):
    B, n = 12, 32
    problems = [
        dense_strongly_convex_qp(n, n // 4, n // 2, seed=100 + i)
        for i in range(B)
    ]
    data = prepare_batch(problems)
    res = solve_batch(
        data, Settings(pallas_kernels=True, mixed_precision=mixed)
    )
    assert np.all(np.asarray(res.info.status) == int(Status.SOLVED))
    for i in range(B):
        one = jax.tree.map(lambda x: x[i], res)
        check_optimality(problems[i], one, tol=1e-6)


@pytest.mark.parametrize("T", [17, 32])
def test_multistage_cr_pallas(T):
    """CR scheme with the Pallas block-potrf path (5-tuple levels) matches
    the XLA route and solves to optimality."""
    from piqp_tpu import multistage as ms
    from piqp_tpu.api import solve_prepared

    sdata = ms.random_multistage_qp(T=T, D=4, Da=2, ra=2, rg=2, seed=31)
    res_p = solve_prepared(sdata, Settings(pallas_kernels=True))
    res_x = solve_prepared(sdata, Settings())
    assert int(res_p.info.status) == int(Status.SOLVED)
    assert int(res_x.info.status) == int(Status.SOLVED)
    np.testing.assert_allclose(
        np.asarray(res_p.x), np.asarray(res_x.x), atol=1e-7, rtol=1e-6
    )


def test_multistage_cr_pallas_mixed():
    from piqp_tpu import multistage as ms
    from piqp_tpu.api import solve_prepared

    sdata = ms.random_multistage_qp(T=32, D=4, Da=2, ra=2, rg=2, seed=33)
    res_p = solve_prepared(
        sdata, Settings(pallas_kernels=True, mixed_precision=True)
    )
    res_x = solve_prepared(sdata, Settings())
    assert int(res_p.info.status) == int(Status.SOLVED)
    np.testing.assert_allclose(
        np.asarray(res_p.x), np.asarray(res_x.x), atol=1e-6, rtol=1e-5
    )


@pytest.mark.parametrize("n", [24, 64, 130])
def test_chol_inv_rank1_matches_xla(n):
    """The f64-on-accelerator fallback (rank-1/GEMM build, including the
    identity-padding slice for n not a multiple of the block) must agree
    with XLA cholesky + triangular inverse."""
    from piqp_tpu.ops.pallas_chol import _chol_inv_rank1, _chol_inv_xla

    rng = np.random.default_rng(5)
    A = rng.standard_normal((n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n), dtype=jnp.float64)
    L1, Linv1 = _chol_inv_rank1(K)
    L2, Linv2 = _chol_inv_xla(K)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L2),
                               atol=1e-10, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Linv1), np.asarray(Linv2),
                               atol=1e-10, rtol=1e-8)


@pytest.mark.parametrize("n,r", [(8, 18), (32, 80), (64, 144)])
def test_chol_inv_apply_fused(n, r):
    """The fused factor+inverse+apply kernel (the CR chain-step kernel)
    matches a plain solve: Y == K^-1 RHS, L == chol(K)."""
    from piqp_tpu.ops.pallas_chol import _pallas_chol_inv_apply_batched

    B = 5  # not a tile multiple (pads internally)
    K = _spd_batch(B, n, jnp.float64, seed=n + r)
    rng = np.random.default_rng(r)
    RHS = jnp.asarray(rng.standard_normal((B, n, r)))
    L, Linv, Y = _pallas_chol_inv_apply_batched(K, RHS)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(jnp.linalg.cholesky(K)), atol=1e-11,
        rtol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(K @ Y), np.asarray(RHS), atol=1e-8, rtol=1e-9
    )


def test_chol_inv_apply_custom_vmap():
    """vmapped cholesky_inverse_apply dispatches the fused kernel and
    agrees with the unbatched fallback composition."""
    from piqp_tpu.ops.pallas_chol import cholesky_inverse_apply

    B, n, r = 4, 24, 52
    K = _spd_batch(B, n, jnp.float64, seed=7)
    rng = np.random.default_rng(9)
    RHS = jnp.asarray(rng.standard_normal((B, n, r)))
    Lb, Linvb, Yb = jax.vmap(cholesky_inverse_apply)(K, RHS)
    for i in range(B):
        L1, Linv1, Y1 = cholesky_inverse_apply(K[i], RHS[i])
        np.testing.assert_allclose(np.asarray(Lb[i]), np.asarray(L1),
                                   atol=1e-10, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(Yb[i]), np.asarray(Y1),
                                   atol=1e-8, rtol=1e-8)
