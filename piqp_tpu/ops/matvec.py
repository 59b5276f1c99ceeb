"""Problem-structure matvecs (the backend's eval_* surface,
/root/reference/include/piqp/kkt_solver_base.hpp:21-44).

Single-dispatch on the data representation so block-structured backends
(multistage) can provide linear-in-horizon implementations while the dense
backend uses plain GEMVs.  Dispatch happens at trace time (zero runtime
cost under jit).
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
def A_xn_AT_xt(data, xn, xt):
    """(A @ xn, A.T @ xt) — the fused pair the reference evaluates together
    (dense/kkt.hpp:117-123)."""
    raise NotImplementedError(type(data))


@singledispatch
def G_xn_GT_xt(data, xn, xt):
    """(G @ xn, G.T @ xt)."""
    raise NotImplementedError(type(data))


@P_x.register
def _(data: QPData, x):
    return data.P @ x


@A_xn_AT_xt.register
def _(data: QPData, xn, xt):
    if data.p == 0:
        return jnp.zeros(0, x_dtype(data)), jnp.zeros_like(xn)
    return data.A @ xn, data.A.T @ xt


@G_xn_GT_xt.register
def _(data: QPData, xn, xt):
    if data.m == 0:
        return jnp.zeros(0, x_dtype(data)), jnp.zeros_like(xn)
    return data.G @ xn, data.G.T @ xt


def x_dtype(data):
    return data.P.dtype
