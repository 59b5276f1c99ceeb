"""Ruiz equilibration, device-side and jit-compatible.

Re-design of dense::RuizEquilibration (reference
/root/reference/include/piqp/dense/preconditioner.hpp:26-438) as pure
functions over :class:`piqp_tpu.types.QPData`.

The reference iterates up to ``preconditioner_iter`` times, each time scaling
the full KKT matrix

    [ P  A' G' D ]
    [ A  0  0  0 ]
    [ G  0  0  0 ]
    [ D  0  0  0 ]

by the inverse square roots of its column infinity norms, where D is the
diagonal box-scaling matrix (preconditioner.hpp:85-110).  We express each
iteration as fused vectorized max-reductions + rank-1 scalings, and run the
loop as ``lax.while_loop`` with the same early-exit criterion (max deviation
of the iteration scaling from 1 below epsilon, preconditioner.hpp:79-82).
"""

from __future__ import annotations

from functools import singledispatch

import jax
import jax.numpy as jnp
from jax import lax

from .types import QPData, Scaling

MIN_SCALING = 1e-4
MAX_SCALING = 1e4


def _limit_scaling(d: jax.Array) -> jax.Array:
    """Mirror of limit_scaling (preconditioner.hpp:420-437): values below
    MIN_SCALING are reset to 1 (not clamped!), values above MAX_SCALING are
    clamped."""
    d = jnp.where(d < MIN_SCALING, 1.0, d)
    return jnp.where(d > MAX_SCALING, MAX_SCALING, d)


def _inf_norm_cols(M: jax.Array) -> jax.Array:
    """Infinity norm of each column of M; 0 for empty M."""
    return jnp.max(jnp.abs(M), axis=0, initial=0.0)


def _inf_norm_rows(M: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(M), axis=1, initial=0.0)


@singledispatch
def equilibrate(data, max_iter: int = 10, scale_cost: bool = False,
                epsilon: float = 1e-3):
    """Ruiz-equilibrate; dispatches on the data representation."""
    raise NotImplementedError(type(data))


@singledispatch
def apply_scaling(data, s: Scaling):
    """Apply a previously-computed scaling to fresh (unscaled) data
    (preconditioner.hpp:176-205, the reuse_prev_scaling path)."""
    raise NotImplementedError(type(data))


@equilibrate.register
def _equilibrate_dense(
    data: QPData,
    max_iter: int = 10,
    scale_cost: bool = False,
    epsilon: float = 1e-3,
) -> tuple[QPData, Scaling]:
    """Compute and apply Ruiz scaling (preconditioner.hpp:64-222, fresh path).

    Returns the scaled problem and the accumulated :class:`Scaling` (the
    reference's c/delta/delta_b), such that the scaled data equals

        P <- c * Dx P Dx,  c_vec <- c * Dx c_vec,
        A <- Dy A Dx,      b <- Dy b,
        G <- Dz G Dx,      h <- Dz h,
        x_b_scaling <- Db * Dx * x_b_scaling,  x_l/x_u <- Db x_l/x_u.
    """
    dtype = data.P.dtype

    def one_pass(carry):
        d, cost, P, cvec, A, b, G, h_l, h_u, x_l, x_u, xb, i, _ = carry

        # column norms of the full KKT matrix (preconditioner.hpp:93-109)
        norm_x = jnp.maximum(_inf_norm_cols(P), xb)
        norm_x = jnp.maximum(norm_x, _inf_norm_cols(A))
        norm_x = jnp.maximum(norm_x, _inf_norm_cols(G))
        norm_y = _inf_norm_rows(A)
        norm_z = _inf_norm_rows(G)
        norm_b = xb

        dx = 1.0 / jnp.sqrt(_limit_scaling(norm_x))
        dy = 1.0 / jnp.sqrt(_limit_scaling(norm_y))
        dz = 1.0 / jnp.sqrt(_limit_scaling(norm_z))
        db = 1.0 / jnp.sqrt(_limit_scaling(norm_b))

        P = dx[:, None] * P * dx[None, :]
        cvec = cvec * dx
        A = dy[:, None] * A * dx[None, :]
        G = dz[:, None] * G * dx[None, :]
        xb = xb * db * dx

        d = (d[0] * dx, d[1] * dy, d[2] * dz, d[3] * db)

        if scale_cost:
            # preconditioner.hpp:148-169
            n = P.shape[0]
            gamma = jnp.sum(_inf_norm_cols(P)) / jnp.asarray(n, dtype)
            gamma = _limit_scaling(gamma)
            gamma = jnp.maximum(gamma, jnp.max(jnp.abs(cvec), initial=0.0))
            gamma = 1.0 / _limit_scaling(gamma)
            P = P * gamma
            cvec = cvec * gamma
            cost = cost * gamma

        # convergence measure of this pass (preconditioner.hpp:79-82)
        measure = jnp.maximum(
            jnp.max(jnp.abs(1.0 - dx), initial=0.0),
            jnp.maximum(
                jnp.max(jnp.abs(1.0 - dy), initial=0.0),
                jnp.maximum(
                    jnp.max(jnp.abs(1.0 - dz), initial=0.0),
                    jnp.max(jnp.abs(1.0 - db), initial=0.0),
                ),
            ),
        )
        return (d, cost, P, cvec, A, b, G, h_l, h_u, x_l, x_u, xb, i + 1, measure)

    n, p, m = data.n, data.p, data.m
    d0 = (
        jnp.ones(n, dtype),
        jnp.ones(p, dtype),
        jnp.ones(m, dtype),
        jnp.ones(n, dtype),
    )
    carry = (
        d0,
        jnp.asarray(1.0, dtype),
        data.P,
        data.c,
        data.A,
        data.b,
        data.G,
        data.h_l,
        data.h_u,
        data.x_l,
        data.x_u,
        data.x_b_scaling,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(jnp.inf, dtype),
    )

    def cond(carry):
        i, measure = carry[-2], carry[-1]
        return jnp.logical_and(i < max_iter, measure > epsilon)

    carry = lax.while_loop(cond, one_pass, carry)
    d, cost, P, cvec, A, b, G, h_l, h_u, x_l, x_u, xb = carry[:12]
    dx, dy, dz, db = d

    # scale bounds (preconditioner.hpp:207-221); inactive entries are 0 so
    # scaling them is a no-op.
    b = b * dy
    h_l = h_l * dz
    h_u = h_u * dz
    x_l = x_l * db
    x_u = x_u * db

    scaled = data.replace(
        P=P, c=cvec, A=A, b=b, G=G, h_l=h_l, h_u=h_u, x_l=x_l, x_u=x_u,
        x_b_scaling=xb,
    )
    return scaled, Scaling(c=cost, d_x=dx, d_y=dy, d_z=dz, d_b=db)


@apply_scaling.register
def _apply_scaling_dense(data: QPData, s: Scaling) -> QPData:
    P = s.c * (s.d_x[:, None] * data.P * s.d_x[None, :])
    cvec = s.c * data.c * s.d_x
    A = s.d_y[:, None] * data.A * s.d_x[None, :]
    G = s.d_z[:, None] * data.G * s.d_x[None, :]
    xb = data.x_b_scaling * s.d_b * s.d_x
    return data.replace(
        P=P,
        c=cvec,
        A=A,
        b=data.b * s.d_y,
        G=G,
        h_l=data.h_l * s.d_z,
        h_u=data.h_u * s.d_z,
        x_l=data.x_l * s.d_b,
        x_u=data.x_u * s.d_b,
        x_b_scaling=xb,
    )
