"""Batched QP solving — the TPU headline capability.

The reference is a single-problem, single-core library; its throughput story
is SIMD + OpenMP (SURVEY.md section 2.10).  On TPU the natural analog is
*batching*: every solver stage is a pure function over pytrees, so ``vmap``
turns it into a batched solver where the condensed-KKT Cholesky becomes a
batched factorization on the MXU, and ``jax.sharding`` splits the batch
across devices (data-parallel over ICI).

All problems in a batch share shapes (n, p, m); masks may differ per
problem (different active bounds), but all problems must either have cone
constraints or none (the dispatch is static).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import ruiz, solver
from .api import _route_backend, prepare_data
from .types import BasicVars, QPData, Result, Settings


def prepare_batch(problems: Sequence[dict], dtype=jnp.float64) -> QPData:
    """Stack a sequence of problem dicts (keys P, c, A, b, G, h_l, h_u,
    x_l, x_u) into one batched QPData with a leading batch axis."""
    datas = [prepare_data(**prob, dtype=dtype) for prob in problems]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *datas)


@partial(jax.jit, static_argnames=("settings", "cone"))
def _solve_batch_jit(
    data: QPData, settings: Settings, cone: bool, warm=None
) -> Result:
    def one(d, w):
        sdata, sc = ruiz.equilibrate(
            d,
            max_iter=settings.preconditioner_iter,
            scale_cost=settings.preconditioner_scale_cost,
        )
        return solver.solve_scaled(sdata, sc, settings, cone, w)

    # see api._solve_fresh: f32 matmuls need full-precision accumulation
    with jax.default_matmul_precision("highest"):
        if warm is None:
            return jax.vmap(lambda d: one(d, None))(data)
        return jax.vmap(one)(data, warm)


def warm_from_result(res: Result) -> BasicVars:
    """Extract the warm-start iterates (x, y, z_*) from a previous
    ``Result`` (batched or single)."""
    return BasicVars(
        x=res.x, y=res.y, z_l=res.z_l, z_u=res.z_u,
        z_bl=res.z_bl, z_bu=res.z_bu,
    )


def _solve_batch_chunked(
    data: QPData, settings: Settings, cone: bool, chunk: int, warm=None
) -> Result:
    """Host-level loop of jit dispatches over ``chunk``-sized sub-batches.

    One executable compiles (per chunk shape); the loop issues async
    dispatches back-to-back, so device utilization matches the monolithic
    vmap.  Exists because very large single-dispatch batches trip
    per-kernel faults in some TPU runtimes, and nesting the vmap inside
    ``lax.map`` reproduces the same fault (nested control-flow issue);
    plain re-dispatch is the robust path.
    """
    B = data.c.shape[0]
    outs = []
    for s in range(0, B, chunk):
        part = jax.tree.map(lambda x: x[s:s + chunk], data)
        wpart = (
            None if warm is None
            else jax.tree.map(lambda x: x[s:s + chunk], warm)
        )
        outs.append(_solve_batch_jit(part, settings, cone, wpart))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def solve_batch(
    data: QPData,
    settings: Settings = Settings(),
    cone: bool = True,
    sharding: Optional[jax.sharding.Sharding] = None,
    chunk: int = 0,
    warm: Optional[object] = None,
) -> Result:
    """Solve a batch of QPs (leading axis on every leaf of ``data``).

    ``sharding``: optional sharding for the batch axis; pass a
    ``NamedSharding(mesh, P('batch'))`` to scale across devices.  The solve
    is embarrassingly parallel over the batch — XLA inserts no collectives.

    ``chunk``: when nonzero and smaller than the batch, the solve is issued
    as back-to-back jit dispatches of ``chunk``-sized sub-batches (see
    ``_solve_batch_chunked``); throughput is unchanged for compute-bound
    configs while the per-dispatch working set stays bounded.

    ``warm``: optional warm-start iterates — a previous batched ``Result``
    or a batched ``BasicVars`` — for MPC/SQP re-solves after small data
    updates.  Typically cuts the iteration count several-fold (no reference
    analog: the reference always cold-starts).
    """
    data = _route_backend(data, settings)
    if isinstance(warm, Result):
        warm = warm_from_result(warm)
    if sharding is not None:
        data = jax.device_put(data, sharding)
        if warm is not None:
            warm = jax.device_put(warm, sharding)
    B = data.c.shape[0]
    if chunk and B > chunk:
        return _solve_batch_chunked(data, settings, cone, chunk, warm)
    return _solve_batch_jit(data, settings, cone, warm)
