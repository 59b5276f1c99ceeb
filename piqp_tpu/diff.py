"""Differentiable QP solve — implicit differentiation through the KKT
conditions.

A capability the C++ reference cannot offer: ``solve_qp_diff`` is a
``jax.custom_vjp`` around the IPM solve, so QP solutions compose with
``jax.grad`` / ``jax.vmap`` / ``jax.jit`` — learned MPC cost tuning,
hyperparameter fitting through a control loop, OptNet-style QP layers in
neural networks, end-to-end on TPU.

Math (implicit function theorem on the stationary KKT map).  Let
w = (x, y, z_l, z_u, z_bl, z_bu) and θ = the QPData fields.  At a solution,
F(θ, w) = 0 where F stacks (notation of types.QPData; B = diag(x_b_scaling),
M* the finite-bound masks):

    F1  = Px + c + A'y + G'(z_u - z_l) + B(Mu∘z_bu - Ml∘z_bl)      [n]
    F2  = Ax - b                                                    [p]
    F3l = Ml_h ? z_l ∘ (Gx - h_l)  : z_l                            [m]
    F3u = Mu_h ? z_u ∘ (h_u - Gx)  : z_u                            [m]
    F4l = Ml   ? z_bl ∘ (Bx - x_l) : z_bl                           [n]
    F4u = Mu   ? z_bu ∘ (x_u - Bx) : z_bu                           [n]

Then dw = -(∂F/∂w)⁻¹ (∂F/∂θ) dθ, so the VJP of w̄ is
θ̄ = -(∂F/∂θ)' u with (∂F/∂w)' u = w̄.  Eliminating the complementarity
rows reduces the transpose solve to the familiar condensed saddle system

    [ H   A' ] [u1]   [ r1  ]        H = P + G' D_g G + B D_b B
    [ A   0  ] [u2] = [ w̄_y ]        D_g = diag(z_l/s_l + z_u/s_u)
                                      D_b = diag(z_bl/s_bl + z_bu/s_bu)

— the same quasi-definite structure the IPM factors each iteration
(kkt_system.hpp:161-193 with ρ = δ = 0), solved here with the TPU-f64
signed-Cholesky kernel (ops/ldlt.py) plus iterative refinement against the
unregularized saddle operator.  ∂F/∂θ is never formed: θ̄ comes from one
``jax.vjp`` of F in θ.

Weak/degenerate active constraints (z ≈ s ≈ 0) are genuinely
non-differentiable points of the solution map; the slack floor below picks
a subgradient there, as all implicit-diff QP layers do (OptNet, Amos &
Kolter 2017).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .ops import ldlt
from .types import BasicVars, QPData, Settings

# Active slacks are clamped below at this floor before forming z/s weights.
# At a tightly active constraint the IPM leaves s ~ mu/z (1e-18 scale), whose
# true weight z/s would overflow f64 conditioning; flooring at 1e-8 caps the
# weight at ~1e8 z — "infinite enough" that the active constraint behaves as
# an equality in the derivative to O(1e-8), while the saddle factorization
# stays well inside f64.  The same clamp appears in every implicit-diff QP
# layer (OptNet et al.); weakly-active points are non-differentiable anyway.
SLACK_FLOOR = 1e-8


def _kkt_residual(data: QPData, x, y, z_l, z_u, z_bl, z_bu):
    """The stationary KKT map F(θ, w) (module docstring).  Plain jnp on the
    QPData fields so ``jax.vjp`` in θ yields every parameter cotangent."""
    dt = x.dtype
    zero = jnp.zeros((), dt)
    B = data.x_b_scaling
    Gx = data.G @ x
    Bx = B * x
    F1 = (
        data.P @ x
        + data.c
        + data.A.T @ y
        + data.G.T @ (z_u - z_l)
        + B * (jnp.where(data.xu_mask, z_bu, zero)
               - jnp.where(data.xl_mask, z_bl, zero))
    )
    F2 = data.A @ x - data.b
    F3l = jnp.where(data.hl_mask, z_l * (Gx - data.h_l), z_l)
    F3u = jnp.where(data.hu_mask, z_u * (data.h_u - Gx), z_u)
    F4l = jnp.where(data.xl_mask, z_bl * (Bx - data.x_l), z_bl)
    F4u = jnp.where(data.xu_mask, z_bu * (data.x_u - Bx), z_bu)
    return F1, F2, F3l, F3u, F4l, F4u


def _saddle_solve(H, A, r1, r2, refine: int = 2):
    """Solve [H A'; A 0][u1;u2] = [r1;r2] via the signed-Cholesky kernel on
    the (tiny-)regularized quasi-definite matrix, with `refine` rounds of
    iterative refinement against the exact unregularized operator."""
    n = H.shape[-1]
    p = A.shape[-2]
    dt = H.dtype
    N = n + p
    K0 = jnp.concatenate(
        [
            jnp.concatenate([H, A.T], axis=1),
            jnp.concatenate([A, jnp.zeros((p, p), dt)], axis=1),
        ],
        axis=0,
    )
    Np = ldlt.padded_dim(N)
    signs = ldlt.kkt_signs(n, p, 0, Np, dt)
    # scale the static regularization by the PROBLEM's magnitude, not by
    # max|H|: H carries the ~1e8 active-constraint weights, and a reg
    # proportional to those would drown the O(1) blocks it must protect.
    scale = 1.0 + jnp.max(jnp.abs(A)) if p > 0 else jnp.asarray(1.0, dt)
    reg = jnp.asarray(1e-11, dt) * scale
    Kp = ldlt.pad_quasidef(K0, Np) + jnp.diag(reg * signs)
    L, Linvs = ldlt.signed_cholesky(Kp, signs)

    rhs = jnp.concatenate([r1, r2])
    rhs_p = jnp.concatenate([rhs, jnp.zeros((Np - N,), dt)])
    K0p = ldlt.pad_quasidef(K0, Np)
    u = ldlt.signed_solve(L, Linvs, signs, rhs_p)
    for _ in range(refine):
        r = rhs_p - K0p @ u
        # padding rows: K0p has identity there and u stays 0, residual 0
        u = u + ldlt.signed_solve(L, Linvs, signs, r)
    return u[:n], u[n:N]


def _clamped_slacks(data: QPData, x):
    """Recompute primal slacks from x, masked to 1 at inactive bounds and
    floored for the z/s weights."""
    dt = x.dtype
    one = jnp.ones((), dt)
    Gx = data.G @ x
    Bx = data.x_b_scaling * x
    floor = jnp.asarray(SLACK_FLOOR, dt)
    cl = lambda v: jnp.maximum(v, floor)
    s_l = jnp.where(data.hl_mask, cl(Gx - data.h_l), one)
    s_u = jnp.where(data.hu_mask, cl(data.h_u - Gx), one)
    s_bl = jnp.where(data.xl_mask, cl(Bx - data.x_l), one)
    s_bu = jnp.where(data.xu_mask, cl(data.x_u - Bx), one)
    return s_l, s_u, s_bl, s_bu


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def solve_qp_diff(
    data: QPData, settings: Settings = Settings(), cone: bool = True
) -> BasicVars:
    """Solve the QP and return (x, y, z_l, z_u, z_bl, z_bu) with a custom
    VJP: gradients w.r.t. every QPData field flow through the solution by
    implicit differentiation of the KKT conditions.

    ``data`` must be a canonicalized QPData (api.prepare_data); ``settings``
    is static.  ``cone`` mirrors api.has_cone — pass False only for
    equality-constrained problems (it cannot be derived from traced masks).
    Composes with jit / vmap / grad.  Solve to tight tolerances
    (eps_abs <= 1e-10) for accurate gradients: the implicit-diff error is
    O(solve tolerance).
    """
    return _diff_fwd(data, settings, cone)[0]


def _diff_fwd(data: QPData, settings: Settings, cone: bool):
    from . import ruiz, solver

    with jax.default_matmul_precision("highest"):
        sdata, sc = ruiz.equilibrate(
            data,
            max_iter=settings.preconditioner_iter,
            scale_cost=settings.preconditioner_scale_cost,
        )
        res = solver.solve_scaled(sdata, sc, settings, cone)
    out = BasicVars(res.x, res.y, res.z_l, res.z_u, res.z_bl, res.z_bu)
    return out, (data, out)


def _diff_bwd(settings: Settings, cone: bool, saved, wbar: BasicVars):
    data, w = saved
    dt = w.x.dtype
    zero = jnp.zeros((), dt)
    x = w.x
    B = data.x_b_scaling
    s_l, s_u, s_bl, s_bu = _clamped_slacks(data, x)

    # masked dual/slack ratios (0 where the bound is inactive: z == 0 there)
    w_l = jnp.where(data.hl_mask, w.z_l / s_l, zero)
    w_u = jnp.where(data.hu_mask, w.z_u / s_u, zero)
    w_bl = jnp.where(data.xl_mask, w.z_bl / s_bl, zero)
    w_bu = jnp.where(data.xu_mask, w.z_bu / s_bu, zero)

    H = (
        data.P
        + data.G.T @ (data.G * (w_l + w_u)[:, None])
        + jnp.diag(B * B * (w_bl + w_bu))
    )
    # move the w̄_z parts of the eliminated rows to the RHS
    r1 = (
        wbar.x
        - data.G.T @ (w_l * wbar.z_l)
        + data.G.T @ (w_u * wbar.z_u)
        - B * (w_bl * wbar.z_bl)
        + B * (w_bu * wbar.z_bu)
    )
    u1, u2 = _saddle_solve(H, data.A, r1, wbar.y)

    Gu1 = data.G @ u1
    Bu1 = B * u1
    u3l = jnp.where(data.hl_mask, (wbar.z_l + Gu1) / s_l, wbar.z_l)
    u3u = jnp.where(data.hu_mask, (wbar.z_u - Gu1) / s_u, wbar.z_u)
    u4l = jnp.where(data.xl_mask, (wbar.z_bl + Bu1) / s_bl, wbar.z_bl)
    u4u = jnp.where(data.xu_mask, (wbar.z_bu - Bu1) / s_bu, wbar.z_bu)

    _, vjp_theta = jax.vjp(
        lambda d: _kkt_residual(d, x, w.y, w.z_l, w.z_u, w.z_bl, w.z_bu),
        data,
    )
    (data_bar,) = vjp_theta((-u1, -u2, -u3l, -u3u, -u4l, -u4u))
    return (data_bar,)


solve_qp_diff.defvjp(_diff_fwd, _diff_bwd)


def qp_layer(
    P,
    c,
    A=None,
    b=None,
    G=None,
    h_l=None,
    h_u=None,
    x_l=None,
    x_u=None,
    settings: Settings | None = None,
):
    """Convenience OptNet-style layer: canonicalize once (host side), return
    a differentiable ``solve(data) -> x`` plus the prepared QPData pytree.

    >>> solve, data = qp_layer(P, c, G=G, h_u=h)
    >>> grads = jax.grad(lambda d: solve(d).sum(), allow_int=True)(data)

    (``allow_int=True`` because QPData carries bool mask leaves; their
    cotangents are float0.)  Alternatively differentiate w.r.t. individual
    fields via ``dataclasses.replace(data, c=...)``.
    """
    from .api import has_cone, prepare_data

    settings = settings or Settings()
    data = prepare_data(P, c, A, b, G, h_l, h_u, x_l, x_u, dtype=settings.dtype)
    cone = has_cone(data)

    def solve(d: QPData):
        return solve_qp_diff(d, settings, cone).x

    return solve, data
