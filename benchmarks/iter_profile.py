"""In-graph attribution of one warm IPM iteration (north-star config).

Extends benchmarks/kernel_roofline.py's differencing technique from single
kernels to the solver's own subgraphs: each piece of a warm iteration of
``solve_scaled`` (factor, KKT solve, residuals, termination check, the full
iteration) is looped k times inside ONE jitted executable with a 1e-30 data
dependence back into a FIXED reference state (no value drift between loop
trips), the executable is timed at two k values, and the difference gives
the marginal in-graph cost of one execution — dispatch overhead removed.

The reference cost model being attributed is solver.hpp:379-882's
per-iteration budget: 1 factorization + 2 KKT solves + ~6 matvecs + O(n+m)
vector work.

Usage:  python benchmarks/iter_profile.py [name ...]
        (no args = all subgraphs, plus a repeat of the first as an
        in-process-degradation sentinel)

Prints one JSON line per subgraph; finishes with an attribution summary.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os

# the container sitecustomize imports jax pre-pointed at the TPU, so the
# JAX_PLATFORMS env var is too late; smoke tests opt into CPU here
if os.environ.get("PIQP_PROF_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from piqp_tpu import Settings, kkt, ruiz, solver
from piqp_tpu.batch import _solve_batch_jit, prepare_batch, warm_from_result
from benchmarks.make_batch import batch_problems

import os

DIM = int(os.environ.get("PIQP_PROF_DIM", "64"))
B = int(os.environ.get("PIQP_PROF_B", "256"))
K_LO, K_HI = 2, 10
EPS = 1e-30  # data-dependence coupling; vanishes numerically


def _cast_L(ks, dtype):
    return ks.replace(L=jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        ks.L,
    ))


def main():
    want = set(sys.argv[1:])
    settings = Settings(mixed_precision=True, pallas_kernels=True)

    # ---- north-star warm-solve state (identical to northstar_bench's
    # warm sweep inputs: cold solve, perturb c, warm-start) ----
    bdata = prepare_batch(batch_problems(DIM, B))
    cold = _solve_batch_jit(bdata, settings, True)
    np.asarray(cold.x)
    warm = warm_from_result(cold)
    data2 = bdata.replace(c=bdata.c * 1.01)

    def setup_one(d, w):
        sdata, sc = ruiz.equilibrate(
            d, max_iter=settings.preconditioner_iter,
            scale_cost=settings.preconditioner_scale_cost,
        )
        st, _ = solver._init_state(
            sdata, sc, settings, True, True, kkt.precompute(sdata), w
        )
        # one termination check populates st.res (the regularized
        # residuals the predictor RHS reuses)
        st = solver._check_termination(sdata, sc, settings, st)
        return sdata, sc, st

    sdata, sc, st0 = jax.jit(jax.vmap(setup_one))(data2, warm)
    pre = jax.jit(jax.vmap(kkt.precompute))(sdata)

    # factored f32 KKT state + predictor RHS, fixed inputs for the
    # solve-side subgraphs
    @jax.jit
    def mk_solve_inputs(sdata, pre, st):
        def one(d, p, stt):
            ks, _ = kkt.factor(d, _cast_L(stt.ks, jnp.float32), True, p)
            v = stt.vars
            rhs = stt.res.replace(
                s_l=-v.s_l * v.z_l, s_u=-v.s_u * v.z_u,
                s_bl=-v.s_bl * v.z_bl, s_bu=-v.s_bu * v.z_bu,
            )
            return ks, rhs
        return jax.vmap(one)(sdata, pre, st)

    ks32, rhs0 = mk_solve_inputs(sdata, pre, st0)
    jax.block_until_ready((ks32, rhs0))
    st0_f32L = st0.replace(ks=_cast_L(st0.ks, jnp.float32))

    s_noref = dataclasses.replace(settings, iterative_refinement_max_iter=0)

    # ---- subgraphs: carry -> carry, whole batch, values re-anchored ----
    def anchor_st(st_ref):
        def wrap(out_leaf):
            return st_ref.replace(vars=st_ref.vars.replace(
                x=st_ref.vars.x + EPS * out_leaf))
        return wrap

    def g_residuals(st):
        def one(d, s, stt):
            res_nr, info = solver.residuals_nr(d, s, stt.vars, stt.info)
            return res_nr.x
        return anchor_st(st0)(jax.vmap(one)(sdata, sc, st))

    def g_termination(st):
        def one(d, s, stt):
            out = solver._check_termination(d, s, settings, stt)
            # anchor must consume every output family or XLA DCEs the rest
            return out.res.x + (
                out.info.primal_res_reg + out.info.dual_res_reg
                + out.info.primal_prox_inf + out.info.dual_prox_inf
                + out.info.status.astype(out.res.x.dtype)
            )
        return anchor_st(st0)(jax.vmap(one)(sdata, sc, st))

    def g_factor32(st):
        def one(d, p, stt):
            ks, _ = kkt.factor(d, _cast_L(stt.ks, jnp.float32), True, p)
            return ks.L[0][0, 0].astype(stt.vars.x.dtype)
        out = jax.vmap(one)(sdata, pre, st)
        return anchor_st(st0)(out[:, None])

    def g_factor64(st):
        def one(d, p, stt):
            ks, _ = kkt.factor(d, stt.ks, False, p)
            return ks.L[0][0, 0]
        out = jax.vmap(one)(sdata, pre, st)
        return anchor_st(st0)(out[:, None])

    def g_scalings(st):
        def one(d, stt):
            ks = kkt.compute_scalings(
                d, settings, stt.vars, stt.info.rho, stt.info.delta,
                stt.use_ir, stt.P_diag,
            )
            return ks.x_reg
        return anchor_st(st0)(jax.vmap(one)(sdata, st))

    def g_solve(rhs):
        def one(d, ks, r):
            lhs, _ = kkt.solve(d, settings, ks, r)
            return r.replace(x=r.x + EPS * lhs.x)
        return jax.vmap(one)(sdata, ks32, rhs)

    # mu-relaxed refinement (types.refine_mu_factor): the real loop passes
    # the current barrier mu, so early (mu ~ 1e-3) solves accept the direct
    # factor solve while endgame (mu ~ 1e-9) solves refine to accuracy.
    # These two bracket the real per-solve refinement cost; the no-mu
    # kkt_solve_refined subgraph above is the worst case (fixed 1e-12 tol).
    def mk_solve_mu(ksref, mu):
        mu_arr = jnp.full((B,), mu)

        def g(rhs):
            def one(d, ks, r, m):
                lhs, _ = kkt.solve(d, settings, ks, r, m)
                return r.replace(x=r.x + EPS * lhs.x)
            return jax.vmap(one)(sdata, ksref, rhs, mu_arr)
        return g

    # f32 matrix reads for the residual matvecs: the tunnel executes
    # in-graph at ~7 GB/s effective, so matvec subgraphs are byte-bound
    # and f32 matrices halve them (the phase-A candidate optimization)
    sdata32 = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.float64 else a,
        sdata,
    )

    def g_residuals_f32(st):
        def one(d32, s, stt):
            v32 = jax.tree.map(
                lambda a: a.astype(jnp.float32)
                if hasattr(a, "dtype") and a.dtype == jnp.float64 else a,
                stt.vars,
            )
            res_nr, info = solver.residuals_nr(d32, s, v32, stt.info)
            return res_nr.x.astype(stt.vars.x.dtype)
        return anchor_st(st0)(jax.vmap(
            lambda d, s, stt: one(d, s, stt), in_axes=(0, 0, 0)
        )(sdata32, sc, st))

    def g_solve_noref(rhs):
        def one(d, ks, r):
            lhs, _ = kkt.solve(d, s_noref, ks, r)
            return r.replace(x=r.x + EPS * lhs.x)
        return jax.vmap(one)(sdata, ks32, rhs)

    def g_mul_condensed(rhs):
        def one(d, ks, r):
            rx, ry, rz = kkt.mul_condensed(d, ks, r.x, r.y, r.z_l)
            return r.replace(x=r.x + EPS * rx)
        return jax.vmap(one)(sdata, ks32, rhs)

    def g_backsolve(rhs):
        def one(d, ks, r):
            lx, ly, lz = kkt._backend_solve(d, ks, r.x, r.y, r.z_l)
            return r.replace(x=r.x + EPS * lx)
        return jax.vmap(one)(sdata, ks32, rhs)

    def g_iter32(st):
        def one(d, s, p, stt):
            out = solver._iteration(d, s, settings, True, stt, True, p)
            return out.vars.x
        out = jax.vmap(one)(sdata, sc, pre, st)
        return st0_f32L.replace(vars=st0_f32L.vars.replace(
            x=st0_f32L.vars.x + EPS * out))

    def g_iter64(st):
        def one(d, s, p, stt):
            out = solver._iteration(d, s, settings, True, stt, False, p)
            return out.vars.x
        return anchor_st(st0)(jax.vmap(one)(sdata, sc, pre, st))

    @jax.jit
    def mk_ks64(sdata, pre, st):
        def one(d, p, stt):
            ks, _ = kkt.factor(d, stt.ks, False, p)
            return ks
        return jax.vmap(one)(sdata, pre, st)

    ks64 = mk_ks64(sdata, pre, st0)
    jax.block_until_ready(ks64)

    subgraphs = [
        ("residuals_nr", g_residuals, st0),
        ("residuals_nr_f32mats", g_residuals_f32, st0),
        ("kkt_solve_ref_mu1e-3", mk_solve_mu(ks32, 1e-3), rhs0),
        ("kkt_solve_ref_mu1e-9", mk_solve_mu(ks32, 1e-9), rhs0),
        ("kkt_solve_ref64_mu1e-9", mk_solve_mu(ks64, 1e-9), rhs0),
        ("termination(+res_r)", g_termination, st0),
        ("scalings", g_scalings, st0),
        ("factor_f32_pallas", g_factor32, st0),
        ("factor_f64_rank1", g_factor64, st0),
        ("mul_condensed", g_mul_condensed, rhs0),
        ("backend_solve", g_backsolve, rhs0),
        ("kkt_solve_noref", g_solve_noref, rhs0),
        ("kkt_solve_refined", g_solve, rhs0),
        ("full_iter_f32", g_iter32, st0_f32L),
        ("full_iter_f64", g_iter64, st0),
    ]

    results = {}

    def measure(name, fn, carry0, reps=3):
        def timed(k):
            g = jax.jit(lambda c: lax.fori_loop(
                0, k, lambda i, cc: fn(cc), c))
            out = g(carry0)
            np.asarray(jax.tree.leaves(out)[0])  # warm + readback barrier
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                out = g(carry0)
                np.asarray(jax.tree.leaves(out)[0])
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = timed(K_LO), timed(K_HI)
        per = max((t_hi - t_lo) / (K_HI - K_LO), 1e-12)
        us = per / B * 1e6
        results[name] = us
        print(json.dumps(dict(
            subgraph=name, B=B, n=DIM,
            in_graph_ms=round(per * 1e3, 3),
            us_per_problem=round(us, 2),
            dispatch_floor_ms=round((t_lo - K_LO * per) * 1e3, 1),
            device=str(jax.devices()[0]),
        )), flush=True)

    for name, fn, carry0 in subgraphs:
        if want and name not in want:
            continue
        measure(name, fn, carry0)

    if not want:
        # in-process degradation sentinel: re-measure the first subgraph
        first = subgraphs[0]
        us0 = results[first[0]]
        measure(first[0] + "(sentinel)", first[1], first[2])
        drift = results[first[0] + "(sentinel)"] / max(us0, 1e-9)

        # attribution: a warm mixed iteration = scalings + factor + 2 x
        # refined solve + residuals_nr + termination + vector work
        known = (
            results.get("scalings", 0)
            + results.get("factor_f32_pallas", 0)
            + 2 * results.get("kkt_solve_refined", 0)
            + results.get("residuals_nr", 0)
            + results.get("termination(+res_r)", 0)
        )
        full = results.get("full_iter_f32", 0)
        print(json.dumps(dict(
            summary=True,
            full_iter_f32_us=round(full, 2),
            component_sum_us=round(known, 2),
            unattributed_us=round(full - known, 2),
            sentinel_drift=round(drift, 2),
        )), flush=True)


if __name__ == "__main__":
    main()
