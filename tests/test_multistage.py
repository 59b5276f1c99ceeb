"""Multistage backend tests — cross-backend equivalence oracle, mirroring
/root/reference/tests/src/sparse/multistage_kkt_test.cpp: the block
tridiagonal+arrow backend must agree with the dense condensed backend to
1e-8 on the same problems.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import piqp_tpu  # noqa: F401  (registers dispatch)
from piqp_tpu import Settings, Status, solve_prepared
from piqp_tpu import multistage as ms
from piqp_tpu import kkt as kkt_mod
from piqp_tpu import ops
from piqp_tpu.types import Vars


def _rand_vars(data, seed):
    rng = np.random.default_rng(seed)
    n, p, m = data.n, data.p, data.m

    def pos(mask, size):
        v = rng.uniform(0.5, 2.0, size)
        return jnp.asarray(np.where(np.asarray(mask), v, 0.0))

    return Vars(
        x=jnp.asarray(rng.standard_normal(n)),
        y=jnp.asarray(rng.standard_normal(p)),
        z_l=pos(data.hl_mask, m), z_u=pos(data.hu_mask, m),
        z_bl=pos(data.xl_mask, n), z_bu=pos(data.xu_mask, n),
        s_l=pos(data.hl_mask, m), s_u=pos(data.hu_mask, m),
        s_bl=pos(data.xl_mask, n), s_bu=pos(data.xu_mask, n),
    )


CASES = [
    dict(T=4, D=3, Da=2, ra=2, rg=2, seed=0),
    dict(T=6, D=4, Da=0, ra=2, rg=3, seed=1),
    dict(T=3, D=2, Da=1, ra=0, rg=2, seed=2),
    dict(T=5, D=3, Da=2, ra=2, rg=0, seed=3),
]


@pytest.mark.parametrize("case", CASES)
def test_matvecs_match_dense(case):
    sdata = ms.random_multistage_qp(**case)
    ddata = ms.to_dense(sdata)
    rng = np.random.default_rng(99)
    x = jnp.asarray(rng.standard_normal(sdata.n))
    y = jnp.asarray(rng.standard_normal(sdata.p))
    z = jnp.asarray(rng.standard_normal(sdata.m))

    np.testing.assert_allclose(
        np.asarray(ops.P_x(sdata, x)), np.asarray(ops.P_x(ddata, x)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ops.P_diag(sdata)), np.asarray(ops.P_diag(ddata)), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(ops.A_x(sdata, x)), np.asarray(ops.A_x(ddata, x)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ops.AT_y(sdata, y)), np.asarray(ops.AT_y(ddata, y)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ops.G_x(sdata, x)), np.asarray(ops.G_x(ddata, x)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ops.GT_z(sdata, z)), np.asarray(ops.GT_z(ddata, z)), atol=1e-12
    )


@pytest.mark.parametrize("case", CASES[:2])
def test_block_factor_solve_matches_dense(case):
    settings = Settings()
    sdata = ms.random_multistage_qp(**case)
    ddata = ms.to_dense(sdata)
    vars = _rand_vars(sdata, case["seed"] + 50)

    rho, delta = jnp.asarray(1e-6), jnp.asarray(1e-4)
    ir = jnp.asarray(False)

    ks_s = kkt_mod.compute_scalings(
        sdata, settings, vars, rho, delta, ir, ops.P_diag(sdata)
    )
    ks_d = kkt_mod.compute_scalings(
        ddata, settings, vars, rho, delta, ir, ops.P_diag(ddata)
    )
    np.testing.assert_allclose(
        np.asarray(ks_s.x_reg), np.asarray(ks_d.x_reg), atol=1e-14
    )

    ks_s, ok_s = kkt_mod.factor(sdata, ks_s)
    ks_d, ok_d = kkt_mod.factor(ddata, ks_d)
    assert bool(ok_s) and bool(ok_d)

    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal(sdata.n))
    xs = np.asarray(kkt_mod.condensed_solve_x(sdata, ks_s, v))
    xd = np.asarray(kkt_mod.condensed_solve_x(ddata, ks_d, v))
    np.testing.assert_allclose(xs, xd, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("case", CASES)
def test_multistage_solve_matches_dense(case):
    """End-to-end: same QP through both backends agrees to 1e-8
    (the multistage_kkt_test.cpp:50-68 gate)."""
    sdata = ms.random_multistage_qp(**case)
    ddata = ms.to_dense(sdata)

    res_s = solve_prepared(sdata)
    res_d = solve_prepared(ddata)

    assert int(res_s.info.status) == Status.SOLVED
    assert int(res_d.info.status) == Status.SOLVED
    np.testing.assert_allclose(
        np.asarray(res_s.x), np.asarray(res_d.x), atol=1e-7, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_s.y), np.asarray(res_d.y), atol=1e-7, rtol=1e-6
    )


def test_long_horizon():
    """Linear-in-T backend handles a horizon the dense path would choke on."""
    sdata = ms.random_multistage_qp(T=64, D=4, Da=2, ra=2, rg=2, seed=11)
    res = solve_prepared(sdata)
    assert int(res.info.status) == Status.SOLVED


# ---------------------------------------------------------------------------
# structure detection + sparse conversion (csrc/structure.cpp analog of
# extract_arrow_structure, multistage_kkt.hpp:420-597)
# ---------------------------------------------------------------------------

def test_native_library_builds():
    from piqp_tpu import _native

    assert _native.have_native(), "C++ structure library failed to build"


def test_detect_and_convert_roundtrip():
    import scipy.sparse as sp
    from piqp_tpu import Settings, SparseSolver
    from piqp_tpu.types import KKTBackend

    sdata0 = ms.random_multistage_qp(T=16, D=3, Da=2, ra=2, rg=2, seed=21)
    ddata = ms.to_dense(sdata0)

    # reconstruct the original user-facing problem (dense order)
    P = np.asarray(ddata.P)
    n = P.shape[0]
    A = np.asarray(ddata.A)
    G = np.asarray(ddata.G)
    h_l = np.where(np.asarray(ddata.hl_mask), np.asarray(ddata.h_l), -np.inf)
    h_u = np.where(np.asarray(ddata.hu_mask), np.asarray(ddata.h_u), np.inf)

    sdata, layout = ms.from_sparse(
        sp.csc_matrix(P), np.asarray(ddata.c),
        sp.csc_matrix(A), np.asarray(ddata.b),
        sp.csc_matrix(G), h_l, h_u,
    )
    assert sdata.T >= 3
    assert sdata.Da >= 2  # at least the true arrow block

    res_stage = solve_prepared(sdata)
    res_dense = solve_prepared(ddata)
    assert int(res_stage.info.status) == Status.SOLVED
    x_user = np.asarray(res_stage.x)[layout.var_map]
    np.testing.assert_allclose(
        x_user, np.asarray(res_dense.x), atol=1e-7, rtol=1e-6
    )


def test_sparse_solver_multistage_routing():
    import scipy.sparse as sp
    from piqp_tpu import Settings, SparseSolver
    from piqp_tpu.types import KKTBackend

    sdata0 = ms.random_multistage_qp(T=16, D=3, Da=2, ra=2, rg=2, seed=22)
    ddata = ms.to_dense(sdata0)
    h_l = np.where(np.asarray(ddata.hl_mask), np.asarray(ddata.h_l), -np.inf)
    h_u = np.where(np.asarray(ddata.hu_mask), np.asarray(ddata.h_u), np.inf)

    s = SparseSolver(Settings(kkt_solver=KKTBackend.multistage))
    s.setup(sp.csc_matrix(np.asarray(ddata.P)), np.asarray(ddata.c),
            sp.csc_matrix(np.asarray(ddata.A)), np.asarray(ddata.b),
            sp.csc_matrix(np.asarray(ddata.G)), h_l, h_u)
    assert s._stage_data is not None, "multistage structure not detected"
    assert s.solve() == Status.SOLVED

    # same answer via the dense route
    s2 = SparseSolver(Settings())
    s2.setup(sp.csc_matrix(np.asarray(ddata.P)), np.asarray(ddata.c),
             sp.csc_matrix(np.asarray(ddata.A)), np.asarray(ddata.b),
             sp.csc_matrix(np.asarray(ddata.G)), h_l, h_u)
    assert s2.solve() == Status.SOLVED
    np.testing.assert_allclose(
        np.asarray(s.result.x), np.asarray(s2.result.x), atol=1e-7, rtol=1e-6
    )


def test_multistage_update_selective_transfer():
    """Multistage SQP-loop data-movement contract (the analog of
    test_update_selective_transfer): a vector-only update must NOT rebuild
    the (T, D, D)/(T, r, *) stage tensors — the device leaves stay the
    *same buffers* — while a dead-row-pattern change or matrix update
    takes the full re-scatter path."""
    import scipy.sparse as sp
    from piqp_tpu import SparseSolver
    from piqp_tpu.types import KKTBackend

    sdata0 = ms.random_multistage_qp(T=16, D=3, Da=2, ra=2, rg=2, seed=22)
    ddata = ms.to_dense(sdata0)
    hl_mask = np.asarray(ddata.hl_mask)
    hu_mask = np.asarray(ddata.hu_mask)
    h_l = np.where(hl_mask, np.asarray(ddata.h_l), -np.inf)
    h_u = np.where(hu_mask, np.asarray(ddata.h_u), np.inf)
    c = np.asarray(ddata.c)
    b = np.asarray(ddata.b)

    s = SparseSolver(Settings(kkt_solver=KKTBackend.multistage))
    s.setup(sp.csc_matrix(np.asarray(ddata.P)), c,
            sp.csc_matrix(np.asarray(ddata.A)), b,
            sp.csc_matrix(np.asarray(ddata.G)), h_l, h_u)
    assert s._stage_data is not None
    assert s.solve() == Status.SOLVED
    d0 = s._stage_data

    # vector-only update: every stage tensor must be the identical object
    s.update(c=c * 1.1, b=b * 0.9)
    d1 = s._stage_data
    for leaf in ("Pd", "Psub", "Pa", "Pc", "A1", "A2", "Ag", "G1", "G2", "Gg"):
        assert getattr(d1, leaf) is getattr(d0, leaf), leaf
    assert d1.c is not d0.c and d1.b is not d0.b
    assert s.solve() == Status.SOLVED

    # bound update with unchanged dead-row pattern: tensors stay resident
    h_u2 = np.where(hu_mask, h_u + 0.5, np.inf)
    s.update(h_u=h_u2)
    d2 = s._stage_data
    assert d2.G1 is d1.G1 and d2.Pd is d1.Pd
    assert s.solve() == Status.SOLVED

    # cross-check the accumulated updates against the dense route
    s2 = SparseSolver(Settings())
    s2.setup(sp.csc_matrix(np.asarray(ddata.P)), c * 1.1,
             sp.csc_matrix(np.asarray(ddata.A)), b * 0.9,
             sp.csc_matrix(np.asarray(ddata.G)), h_l, h_u2)
    assert s2.solve() == Status.SOLVED
    np.testing.assert_allclose(
        np.asarray(s.result.x), np.asarray(s2.result.x), atol=1e-7, rtol=1e-6
    )

    # dead-pattern change (a row loses both bounds) must fall back to the
    # full re-scatter path: the resident G row needs re-zeroing
    live = np.nonzero(hl_mask | hu_mask)[0]
    kill = int(live[0])
    h_l3 = h_l.copy(); h_l3[kill] = -np.inf
    h_u3 = h_u2.copy(); h_u3[kill] = np.inf
    s.update(h_l=h_l3, h_u=h_u3)
    d3 = s._stage_data
    assert d3.G1 is not d2.G1  # full rebuild happened
    assert s.solve() == Status.SOLVED


def test_detect_rejects_unstructured():
    import scipy.sparse as sp

    rng = np.random.default_rng(5)
    n = 40
    Q = rng.standard_normal((n, n))
    P = Q @ Q.T + n * np.eye(n)
    with pytest.raises(ValueError):
        ms.from_sparse(sp.csc_matrix(P), np.zeros(n))


@pytest.mark.parametrize("T", [64, 48, 41])
def test_cyclic_reduction_matches_chain(T):
    """cr_factor/cr_solve must reproduce the sequential chain solve on a
    random SPD block-tridiagonal + arrow system — any horizon length
    (even, odd and power-of-two levels all occur across these cases)."""
    import numpy as np
    from piqp_tpu.multistage import (
        cr_factor, cr_solve, chain_factor, chain_fwd, chain_bwd, _tsolve,
        _use_cr,
    )

    assert _use_cr(64) and _use_cr(41) and not _use_cr(8)

    rng = np.random.default_rng(5)
    D, Da = 5, 3
    Kd = rng.standard_normal((T, D, D)) * 0.3
    Kd = 0.5 * (Kd + Kd.transpose(0, 2, 1)) + (2 * D + Da + 1) * np.eye(D)
    Ksub = rng.standard_normal((T, D, D)) * 0.3
    Ksub[-1] = 0.0
    Ka = rng.standard_normal((T, Da, D)) * 0.3
    Kc = rng.standard_normal((Da, Da)) * 0.3
    Kc = 0.5 * (Kc + Kc.T) + (2 * D + Da + 1) * np.eye(Da)
    vs = rng.standard_normal((T, D))
    vg = rng.standard_normal(Da)

    Kd, Ksub, Ka, Kc, vs, vg = map(jnp.asarray, (Kd, Ksub, Ka, Kc, vs, vg))

    factors, ok = cr_factor(Kd, Ksub, Ka, Kc)
    assert bool(ok)
    xs, xg = cr_solve(factors, vs, vg)

    Ls, Cs, Fs, acc = chain_factor(Kd, Ksub, Ka)
    Lc = jnp.linalg.cholesky(Kc - acc)
    ws, gacc = chain_fwd(Ls, Cs, Fs, vs)
    wg = _tsolve(Lc, vg - gacc)
    xg_ref = _tsolve(Lc, wg, transpose=True)
    xs_ref = chain_bwd(Ls, Cs, Fs, ws, xg_ref)

    np.testing.assert_allclose(np.asarray(xg), np.asarray(xg_ref),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref),
                               rtol=1e-9, atol=1e-10)


def test_cyclic_reduction_end_to_end():
    """A T=64 random multistage QP routes through the CR factorization
    (T is a power of two >= _CR_MIN_T) and matches the dense backend."""
    import numpy as np

    sdata = ms.random_multistage_qp(T=64, D=4, Da=2, ra=2, rg=2, seed=11)
    assert ms._use_cr(sdata.T)
    res = solve_prepared(sdata)
    assert int(res.info.status) == Status.SOLVED

    ddata = ms.to_dense(sdata)
    res_d = solve_prepared(ddata)
    assert int(res_d.info.status) == Status.SOLVED
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res_d.x), rtol=1e-6, atol=1e-7
    )


def test_scheme_selection():
    """Pin the factorization-scheme boundaries: sequential scan below
    T=16, cyclic reduction (any parity) for 16 <= T <= 256, two-level
    chunked beyond (CR compile cost grows with log2(T) distinctly shaped
    levels; chunked stays at two scans)."""
    assert not ms._use_cr(15)
    assert ms._use_cr(16)
    assert ms._use_cr(41)  # odd horizons handled by CR, no padding
    assert ms._use_cr(256)
    assert not ms._use_cr(257)
    assert ms._chunk_count(300) is not None  # chunked picks up past CR
    assert ms._chunk_count(15) is None


def test_chunked_scheme_end_to_end():
    """T > _CR_MAX_T routes to the two-level chunked factorization; the
    solve must still match the optimality system."""
    old = ms._CR_MAX_T
    ms._CR_MAX_T = 32  # force the chunked path at a CPU-testable horizon
    try:
        T = 36  # chunkable: C=6, Q=6
        assert not ms._use_cr(T) and ms._chunk_count(T) is not None
        sdata = ms.random_multistage_qp(T=T, D=3, Da=2, ra=2, rg=2, seed=5)
        res = solve_prepared(sdata)
        assert int(res.info.status) == Status.SOLVED
    finally:
        ms._CR_MAX_T = old


def test_chunked_cr_interiors():
    """Past the CR horizon cap the chunked scheme's chunk INTERIORS still
    factor by cyclic reduction when Qi >= 16 (T=272 -> C=16, Qi=16): the
    placeholder carries (levels, base) locals and the solve must match the
    assembled condensed system."""
    T = 272
    assert not ms._use_cr(T)
    C = ms._chunk_count(T)
    Qi = T // C - 1
    assert ms._use_cr(Qi)

    settings = Settings()
    sdata = ms.random_multistage_qp(T=T, D=3, Da=2, ra=2, rg=2, seed=9)
    vars = _rand_vars(sdata, 90)
    P_diag = piqp_tpu.ops.P_diag(sdata)
    ks = kkt_mod.compute_scalings(
        sdata, settings, vars, 1e-6, 1e-4, jnp.asarray(False), P_diag
    )
    assert isinstance(ks.L[0][0], tuple)  # CR-interior placeholder
    ks, ok = kkt_mod.factor(sdata, ks)
    assert bool(ok)

    rng = np.random.default_rng(10)
    v = jnp.asarray(rng.standard_normal(sdata.n))
    x = kkt_mod.condensed_solve_x(sdata, ks, v)

    Kd, Ksub, Ka, Kc = ms._assemble_blocks(sdata, ks)
    D, Da, n = sdata.D, sdata.Da, sdata.n
    K = np.zeros((n, n))
    for t in range(T):
        K[t * D:(t + 1) * D, t * D:(t + 1) * D] = np.asarray(Kd[t])
        if t + 1 < T:
            K[(t + 1) * D:(t + 2) * D, t * D:(t + 1) * D] = np.asarray(Ksub[t])
            K[t * D:(t + 1) * D, (t + 1) * D:(t + 2) * D] = np.asarray(Ksub[t]).T
        K[T * D:, t * D:(t + 1) * D] = np.asarray(Ka[t])
        K[t * D:(t + 1) * D, T * D:] = np.asarray(Ka[t]).T
    K[T * D:, T * D:] = np.asarray(Kc)
    x_ref = np.linalg.solve(K, np.asarray(v))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-9)


def test_odd_horizon_no_padding():
    """CR handles odd T directly: from_sparse must not pad the horizon
    (the pre-round-2 code padded chain_mass T=41 -> 42 for a chunked
    scheme that was never selected)."""
    sdata0 = ms.random_multistage_qp(T=17, D=3, Da=2, ra=2, rg=2, seed=31)
    dense = ms.to_dense(sdata0)
    import scipy.sparse as sp

    P = sp.csc_matrix(np.asarray(dense.P))
    A = sp.csc_matrix(np.asarray(dense.A))
    G = sp.csc_matrix(np.asarray(dense.G))
    sdata, layout = ms.from_sparse(
        P, np.asarray(dense.c), A, np.asarray(dense.b),
        G, np.asarray(dense.h_l), np.asarray(dense.h_u),
        np.asarray(dense.x_l), np.asarray(dense.x_u),
    )
    assert sdata.T == 17, f"horizon padded to {sdata.T}"


@pytest.mark.corpus
def test_update_values_matches_fresh_scatter():
    """Value-only update (ms.update_values) must produce bit-identical
    StageQPData to a fresh from_sparse on the same data while skipping
    detection/reblocking (the nnz-map update analog,
    multistage_kkt.hpp:140-178)."""
    import time

    from piqp_tpu.utils.io import load_mat

    prob = load_mat(
        "/root/reference/tests/data/chain_mass_sqp.mat", sparse=True
    )
    t0 = time.perf_counter()
    sdata, layout = ms.from_sparse(**prob)
    setup_t = time.perf_counter() - t0

    prob2 = dict(prob)
    prob2["c"] = prob["c"] * 1.25
    prob2["P"] = prob["P"] * 1.5  # same pattern, new values

    t0 = time.perf_counter()
    up_data, up_layout = ms.update_values(layout, **prob2)
    update_t = time.perf_counter() - t0

    import jax

    fresh, _ = ms.from_sparse(**prob2)
    for a, b in zip(jax.tree.leaves(up_data), jax.tree.leaves(fresh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(up_layout.var_map, layout.var_map)
    # re-scatter skips detection: expect a large speedup
    assert update_t < setup_t, (update_t, setup_t)


def test_scenario_program_consensus_arrow():
    """BASELINE config 5 shape: an S-scenario two-stage stochastic QP with
    consensus coupling through the arrow block solves via the multistage
    backend and matches the dense solve (benchmarks/scenario_bench.py)."""
    from benchmarks.scenario_bench import build

    sdata = build(24, seed=3)
    res = solve_prepared(sdata)
    assert int(res.info.status) == Status.SOLVED
    ddata = ms.to_dense(sdata)
    res_d = solve_prepared(ddata)
    assert int(res_d.info.status) == Status.SOLVED
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res_d.x), atol=1e-7, rtol=1e-6
    )
