"""Differentiable-solve tests (piqp_tpu/diff.py).

Oracle: central finite differences of the (non-differentiated) solver on
random directions, per parameter field — the standard check for
implicit-diff QP layers.  Solved tight (eps_abs=1e-11) so the FD noise
floor sits well under the tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piqp_tpu import Settings, solve_dense
from piqp_tpu.api import has_cone, prepare_data
from piqp_tpu.diff import solve_qp_diff
from piqp_tpu.types import Status
from piqp_tpu.utils.random import dense_strongly_convex_qp

TIGHT = Settings(eps_abs=1e-11, eps_rel=1e-12)


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """grad-of-solve executables are the largest in the suite (the bwd
    traces the full forward IPM plus the adjoint); dropping in-memory
    executables around each test keeps the XLA:CPU compiler below its
    cumulative-state crash point (see tests/conftest.py), and the
    persistent disk cache keeps re-compiles cheap."""
    jax.clear_caches()
    yield


def _nondegenerate_qp(n=6, p=2, m=4, seed=0, box=True):
    """QP with a controlled, strictly-complementary, nondegenerate active
    set built by inverse KKT: pick x*, duals and actives, back out c.
    (The random generator often lands on degenerate vertices — h_l == h_u
    rows plus > n active constraints — where the solution map is
    nonsmooth and FD checks are meaningless.)"""
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    P = M @ M.T + n * np.eye(n)
    A = rng.standard_normal((p, n))
    G = rng.standard_normal((m, n))
    xs = rng.standard_normal(n)
    ys = rng.standard_normal(p)
    b = A @ xs

    inf = np.inf
    h_l, h_u = np.full(m, -inf), np.full(m, inf)
    z_l, z_u = np.zeros(m), np.zeros(m)
    Gx = G @ xs
    # row 0: upper bound active; row 1: lower bound active; rest loose
    if m > 0:
        h_u[0], z_u[0] = Gx[0], 0.7
    if m > 1:
        h_l[1], z_l[1] = Gx[1], 0.9
    for i in range(2, m):
        h_l[i], h_u[i] = Gx[i] - 1.0, Gx[i] + 1.0

    x_l, x_u = np.full(n, -inf), np.full(n, inf)
    z_bl, z_bu = np.zeros(n), np.zeros(n)
    if box:
        x_u[1], z_bu[1] = xs[1], 0.5     # active upper box
        x_l[3], z_bl[3] = xs[3], 0.3     # active lower box
        x_l[0], x_u[0] = xs[0] - 2.0, xs[0] + 2.0  # loose two-sided box

    c = -(P @ xs + A.T @ ys + G.T @ (z_u - z_l) + (z_bu - z_bl))
    prob = dict(P=P, c=c, A=A, b=b, G=G, h_l=h_l, h_u=h_u, x_l=x_l, x_u=x_u)
    return prob, xs


def _prep(n=6, p=2, m=4, seed=0, box=True):
    prob, xs = _nondegenerate_qp(n, p, m, seed=seed, box=box)
    r = solve_dense(**prob, settings=TIGHT)
    assert int(r.info.status) == int(Status.SOLVED)
    np.testing.assert_allclose(np.asarray(r.x), xs, atol=1e-7)
    data = prepare_data(**prob)
    return data, has_cone(data)


def _fd_directional(loss, data, field, D, eps=1e-6):
    Dj = jnp.asarray(D)
    dp = dataclasses.replace(data, **{field: getattr(data, field) + eps * Dj})
    dm = dataclasses.replace(data, **{field: getattr(data, field) - eps * Dj})
    return (loss(dp) - loss(dm)) / (2 * eps)


@pytest.mark.parametrize("seed", [0, 3])
def test_x_gradients_match_fd(seed):
    data, cone = _prep(seed=seed)
    v = np.random.default_rng(seed + 7).standard_normal(data.n)
    v = jnp.asarray(v)

    def loss(d):
        return v @ solve_qp_diff(d, TIGHT, cone).x

    g = jax.grad(loss, allow_int=True)(data)
    rng = np.random.default_rng(seed + 13)
    checks = {
        "c": rng.standard_normal(data.n),
        "b": rng.standard_normal(data.p),
        "A": rng.standard_normal((data.p, data.n)),
        "G": rng.standard_normal((data.m, data.n)),
        "h_u": rng.standard_normal(data.m) * np.asarray(data.hu_mask),
        "h_l": rng.standard_normal(data.m) * np.asarray(data.hl_mask),
        "x_u": rng.standard_normal(data.n) * np.asarray(data.xu_mask),
        "x_l": rng.standard_normal(data.n) * np.asarray(data.xl_mask),
    }
    M = rng.standard_normal((data.n, data.n))
    checks["P"] = M + M.T  # symmetric direction (P must stay symmetric)

    for field, D in checks.items():
        ana = float(jnp.sum(getattr(g, field) * jnp.asarray(D)))
        num = float(_fd_directional(loss, data, field, D))
        assert num == pytest.approx(ana, rel=2e-4, abs=5e-6), field


def test_dual_cotangents_flow():
    """Gradients of losses on y and z (not just x) are correct."""
    data, cone = _prep(seed=1)
    rng = np.random.default_rng(5)
    vy = jnp.asarray(rng.standard_normal(data.p))
    vz = jnp.asarray(rng.standard_normal(data.m))

    def loss(d):
        w = solve_qp_diff(d, TIGHT, cone)
        return vy @ w.y + vz @ (w.z_u - w.z_l)

    g = jax.grad(loss, allow_int=True)(data)
    for field in ("c", "b", "h_u"):
        D = rng.standard_normal(getattr(data, field).shape)
        if field == "h_u":
            D = D * np.asarray(data.hu_mask)
        ana = float(jnp.sum(getattr(g, field) * jnp.asarray(D)))
        num = float(_fd_directional(loss, data, field, D))
        assert num == pytest.approx(ana, rel=5e-4, abs=5e-6), field


def test_equality_only():
    data, _ = _prep(p=3, m=0, box=False, seed=2)

    def loss(d):
        return jnp.sum(solve_qp_diff(d, TIGHT, False).x ** 2)

    g = jax.grad(loss, allow_int=True)(data)
    rng = np.random.default_rng(11)
    for field in ("c", "b"):
        D = rng.standard_normal(getattr(data, field).shape)
        ana = float(jnp.sum(getattr(g, field) * jnp.asarray(D)))
        num = float(_fd_directional(loss, data, field, D))
        assert num == pytest.approx(ana, rel=2e-4, abs=5e-6), field


def test_jit_and_vmap_compose():
    """grad-of-solve under jit and vmapped over a batch of linear costs."""
    data, cone = _prep(seed=4)

    @jax.jit
    def gc(c):
        def loss(cc):
            d = dataclasses.replace(data, c=cc)
            return jnp.sum(solve_qp_diff(d, TIGHT, cone).x)

        return jax.grad(loss)(c)

    g1 = gc(data.c)
    assert np.all(np.isfinite(np.asarray(g1)))

    cs = jnp.stack([data.c, data.c + 0.05, data.c - 0.05])
    gs = jax.vmap(gc)(cs)
    assert gs.shape == (3, data.n)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(g1), atol=1e-9)
    # FD cross-check on the first batch element
    eps = 1e-6
    v = jnp.ones((data.n,))

    def loss_c(cc):
        return jnp.sum(
            solve_qp_diff(dataclasses.replace(data, c=cc), TIGHT, cone).x
        )

    D = np.random.default_rng(17).standard_normal(data.n)
    num = (loss_c(data.c + eps * D) - loss_c(data.c - eps * D)) / (2 * eps)
    ana = float(jnp.sum(g1 * jnp.asarray(D)))
    assert float(num) == pytest.approx(ana, rel=2e-4, abs=5e-6)


def test_jacrev_full_jacobian():
    """jacrev computes the full solution-map Jacobian dx*/dc; columns must
    match FD directional derivatives (custom_vjp supports jacrev; jacfwd
    is unsupported by construction)."""
    data, cone = _prep(seed=5)

    def xstar(c):
        return solve_qp_diff(dataclasses.replace(data, c=c), TIGHT, cone).x

    J = jax.jacrev(xstar)(data.c)
    assert J.shape == (data.n, data.n)
    rng = np.random.default_rng(23)
    D = rng.standard_normal(data.n)
    eps = 1e-6
    fd = (xstar(data.c + eps * jnp.asarray(D))
          - xstar(data.c - eps * jnp.asarray(D))) / (2 * eps)
    np.testing.assert_allclose(
        np.asarray(J @ jnp.asarray(D)), np.asarray(fd), atol=1e-5, rtol=1e-4
    )


def test_multistage_diff_matches_dense_diff():
    """Structured differentiation: solve_qp_diff on a StageQPData routes
    the adjoint through the multistage factorization; its gradients on the
    shared flat fields (c, b, h_u) must match the dense-QPData path's on
    the densified problem, and FD directionals must agree."""
    from piqp_tpu import multistage as ms

    sdata = ms.random_multistage_qp(T=6, D=3, Da=2, ra=1, rg=2, seed=3)
    ddata = ms.to_dense(sdata)

    def loss_s(c):
        d = dataclasses.replace(sdata, c=c)
        return jnp.sum(solve_qp_diff(d, TIGHT, True).x ** 2)

    def loss_d(c):
        d = dataclasses.replace(ddata, c=c)
        return jnp.sum(solve_qp_diff(d, TIGHT, True).x ** 2)

    g_s = jax.grad(loss_s)(sdata.c)
    g_d = jax.grad(loss_d)(ddata.c)
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_d), atol=1e-6, rtol=1e-5
    )
    # FD oracle on a random direction
    D = np.random.default_rng(9).standard_normal(sdata.c.shape[0])
    eps = 1e-6
    num = (loss_s(sdata.c + eps * jnp.asarray(D))
           - loss_s(sdata.c - eps * jnp.asarray(D))) / (2 * eps)
    ana = float(jnp.sum(g_s * jnp.asarray(D)))
    assert float(num) == pytest.approx(ana, rel=5e-4, abs=5e-6)


def test_multistage_diff_block_gradients():
    """Gradients land on the structured stage blocks (Pd here) and match
    FD — tuning stage costs through the structured solver."""
    from piqp_tpu import multistage as ms

    sdata = ms.random_multistage_qp(T=5, D=3, Da=2, ra=1, rg=2, seed=7)

    def loss_pd(Pd):
        d = dataclasses.replace(sdata, Pd=Pd)
        return jnp.sum(solve_qp_diff(d, TIGHT, True).x ** 2)

    g = jax.grad(loss_pd)(sdata.Pd)
    assert g.shape == sdata.Pd.shape
    rng = np.random.default_rng(31)
    Draw = rng.standard_normal(sdata.Pd.shape)
    D = (Draw + np.swapaxes(Draw, -1, -2)) / 2  # keep blocks symmetric
    eps = 1e-6
    num = (loss_pd(sdata.Pd + eps * jnp.asarray(D))
           - loss_pd(sdata.Pd - eps * jnp.asarray(D))) / (2 * eps)
    ana = float(jnp.sum(g * jnp.asarray(D)))
    assert float(num) == pytest.approx(ana, rel=5e-4, abs=5e-6)


def test_multistage_diff_vmapped_fleet():
    """A fleet of MPC problems differentiates under vmap: per-scenario
    gradients through the structured adjoint (learned-MPC training loops
    over scenario batches)."""
    from piqp_tpu import multistage as ms

    sdata = ms.random_multistage_qp(T=5, D=3, Da=2, ra=1, rg=2, seed=11)

    def gc(c):
        def loss(cc):
            d = dataclasses.replace(sdata, c=cc)
            return jnp.sum(solve_qp_diff(d, TIGHT, True).x ** 2)

        return jax.grad(loss)(c)

    cs = jnp.stack([sdata.c, sdata.c * 1.01, sdata.c * 0.99])
    gs = jax.vmap(gc)(cs)
    assert gs.shape == (3, sdata.c.shape[0])
    np.testing.assert_allclose(
        np.asarray(gs[0]), np.asarray(gc(sdata.c)), atol=1e-8
    )


def test_horizon_sharded_diff_matches_unsharded():
    """Differentiable MPC ACROSS THE MESH: solve_qp_diff on a
    ShardedStageQPData dispatches the adjoint through the partitioned-
    Schur sharded factorization (subclass dispatch — zero extra code) and
    must reproduce the unsharded structured gradient exactly."""
    from jax.sharding import Mesh

    from piqp_tpu import multistage as ms
    from piqp_tpu.parallel import shard_horizon

    ndev = min(8, len(jax.devices()))
    if ndev < 2:
        pytest.skip("needs a multi-device mesh")
    sdata = ms.random_multistage_qp(T=2 * ndev, D=3, Da=2, ra=1, rg=2, seed=5)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("sp",))
    sh = shard_horizon(sdata, mesh, "sp")

    def loss_s(c):
        d = dataclasses.replace(sdata, c=c)
        return jnp.sum(solve_qp_diff(d, TIGHT, True).x ** 2)

    def loss_sh(c):
        with mesh:
            d = dataclasses.replace(sh, c=c)
            return jnp.sum(solve_qp_diff(d, TIGHT, True).x ** 2)

    g_ref = jax.grad(loss_s)(sdata.c)
    g_sh = jax.grad(loss_sh)(sh.c)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_ref), atol=1e-10
    )


def test_qp_layer_convenience():
    """qp_layer: host-side prep + differentiable closure (the README
    example); gradient on an equality-constrained QP has the closed form
    dsum(x*)/dc = -sum over columns of the reduced KKT inverse."""
    from piqp_tpu import qp_layer

    P = np.array([[6.0, 0.0], [0.0, 4.0]])
    c = np.array([-1.0, -4.0])
    A = np.array([[1.0, -2.0]])
    b = np.array([0.0])
    solve, data = qp_layer(P, c, A, b)
    x = np.asarray(solve(data))
    np.testing.assert_allclose(x, [0.42857143, 0.21428571], atol=1e-7)

    g = jax.grad(lambda d: solve(d).sum(), allow_int=True)(data)
    K = np.block([[P, A.T], [A, np.zeros((1, 1))]])
    Kinv = np.linalg.inv(K)
    expected = -(Kinv[:2, :2].T @ np.ones(2))
    np.testing.assert_allclose(np.asarray(g.c), expected, atol=1e-8)
