"""KKT backend tests — mirrors the reference factor/solve/mul round-trip
oracle (/root/reference/tests/src/dense/kkt_test.cpp): K^-1 then K* must
reproduce the right-hand side on random QPs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piqp_tpu import Settings, prepare_data
from piqp_tpu import kkt as kkt_mod
from piqp_tpu.types import Vars
from piqp_tpu.utils.random import dense_strongly_convex_qp

kkt = kkt_mod


def _random_state(n, p, m, seed):
    prob = dense_strongly_convex_qp(n, p, m, seed=seed)
    data = prepare_data(**prob)
    rng = np.random.default_rng(seed + 1000)

    def pos(mask, size):
        v = rng.uniform(0.5, 2.0, size)
        return jnp.asarray(np.where(np.asarray(mask), v, 0.0))

    vars = Vars(
        x=jnp.asarray(rng.standard_normal(n)),
        y=jnp.asarray(rng.standard_normal(p)),
        z_l=pos(data.hl_mask, m), z_u=pos(data.hu_mask, m),
        z_bl=pos(data.xl_mask, n), z_bu=pos(data.xu_mask, n),
        s_l=pos(data.hl_mask, m), s_u=pos(data.hu_mask, m),
        s_bl=pos(data.xl_mask, n), s_bu=pos(data.xu_mask, n),
    )
    return prob, data, vars, rng


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("dims", [(10, 4, 6), (16, 0, 10), (12, 5, 0)])
@pytest.mark.parametrize("use_ir", [False, True])
def test_factor_solve_mul_roundtrip(seed, dims, use_ir):
    n, p, m = dims
    settings = Settings()
    prob, data, vars, rng = _random_state(n, p, m, seed)

    rho = jnp.asarray(1e-6)
    delta = jnp.asarray(1e-4)
    P_diag = jnp.diagonal(data.P)
    ks = kkt.compute_scalings(
        data, settings, vars, rho, delta, jnp.asarray(use_ir), P_diag
    )
    ks, ok = kkt.factor(data, ks)
    assert bool(ok)

    def masked(mask, size):
        v = rng.standard_normal(size)
        return jnp.asarray(np.where(np.asarray(mask), v, 0.0))

    rhs = Vars(
        x=jnp.asarray(rng.standard_normal(n)),
        y=jnp.asarray(rng.standard_normal(p)),
        z_l=masked(data.hl_mask, m), z_u=masked(data.hu_mask, m),
        z_bl=masked(data.xl_mask, n), z_bu=masked(data.xu_mask, n),
        s_l=masked(data.hl_mask, m), s_u=masked(data.hu_mask, m),
        s_bl=masked(data.xl_mask, n), s_bu=masked(data.xu_mask, n),
    )

    lhs, ok = kkt.solve(data, settings, ks, rhs)
    assert bool(ok)

    back = kkt.mul_full(data, ks, lhs)
    tol = 1e-7 if not use_ir else 1e-6
    for name in ("x", "y", "z_l", "z_u", "z_bl", "z_bu", "s_l", "s_u", "s_bl", "s_bu"):
        got = np.asarray(getattr(back, name))
        want = np.asarray(getattr(rhs, name))
        np.testing.assert_allclose(got, want, atol=tol, err_msg=name)


def test_condensed_matches_dense_reference():
    """Assembled condensed matrix equals the brute-force formula."""
    n, p, m = 8, 3, 5
    settings = Settings()
    prob, data, vars, rng = _random_state(n, p, m, 3)
    ks = kkt.compute_scalings(
        data, settings, vars, jnp.asarray(1e-6), jnp.asarray(1e-4),
        jnp.asarray(False), jnp.diagonal(data.P),
    )
    K = np.asarray(kkt.assemble_condensed(data, ks))
    P = np.asarray(data.P)
    A = np.asarray(data.A)
    G = np.asarray(data.G)
    expected = (
        P
        + np.diag(np.asarray(ks.x_reg))
        + A.T @ A / float(ks.delta_reg)
        + G.T @ np.diag(1.0 / np.asarray(ks.z_reg_fact)) @ G
    )
    np.testing.assert_allclose(K, expected, atol=1e-12)
    # symmetric positive definite
    w = np.linalg.eigvalsh(expected)
    assert w.min() > 0
