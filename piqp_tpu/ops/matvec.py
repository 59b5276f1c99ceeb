"""Problem-structure matvecs (the backend's eval_* surface,
/root/reference/include/piqp/kkt_solver_base.hpp:21-44).

Single-dispatch on the data representation so block-structured backends
(multistage) provide linear-in-horizon implementations while the dense
backend uses plain GEMVs.  Dispatch happens at trace time (zero runtime
cost under jit).  The reference fuses A*xn with A'*xt for BLASFEO's gemv_nt;
XLA fuses on its own, so the ops are kept separate and composable.
"""

from __future__ import annotations

from functools import singledispatch

import jax.numpy as jnp

from ..types import QPData


@singledispatch
def P_x(data, x):
    """P @ x."""
    raise NotImplementedError(type(data))


@singledispatch
def P_diag(data):
    """Diagonal of P (static-regularization sizing, kkt_system.hpp:195-207)."""
    raise NotImplementedError(type(data))


@singledispatch
def A_x(data, x):
    """A @ x -> (p,)."""
    raise NotImplementedError(type(data))


@singledispatch
def AT_y(data, y):
    """A.T @ y -> (n,)."""
    raise NotImplementedError(type(data))


@singledispatch
def G_x(data, x):
    """G @ x -> (m,)."""
    raise NotImplementedError(type(data))


@singledispatch
def GT_z(data, z):
    """G.T @ z -> (n,)."""
    raise NotImplementedError(type(data))


@singledispatch
def abs_data(data):
    """Same data object with the matrix blocks replaced by their absolute
    values.  Running the eval_* matvecs on it with |v| gives the
    cancellation denominators for Farkas-certificate validation
    (solver._certificate_qualities).  XLA hoists the abs() of the constant
    problem data out of the IPM while_loop."""
    raise NotImplementedError(type(data))


# --- dense implementations -------------------------------------------------

@P_x.register
def _(data: QPData, x):
    return data.P @ x


@P_diag.register
def _(data: QPData):
    return jnp.diagonal(data.P)


@A_x.register
def _(data: QPData, x):
    return data.A @ x


@AT_y.register
def _(data: QPData, y):
    return data.A.T @ y


@G_x.register
def _(data: QPData, x):
    return data.G @ x


@GT_z.register
def _(data: QPData, z):
    return data.G.T @ z


@abs_data.register
def _(data: QPData):
    return data.replace(
        P=jnp.abs(data.P), A=jnp.abs(data.A), G=jnp.abs(data.G)
    )
