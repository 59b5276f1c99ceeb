"""User-facing API.

- :func:`prepare_data`: canonicalize user matrices into a :class:`QPData`
  pytree (the analog of dense::Data construction + disable_inf_constraints,
  /root/reference/include/piqp/dense/data.hpp:55-212).
- :func:`solve_dense` / :func:`solve_prepared`: one-shot functional solves.
- :class:`DenseSolver`: stateful wrapper mirroring piqp::DenseSolver
  (solver.hpp:1262-1291): settings / setup / update / solve / result.

The functional layer is pure JAX: jit once per (shape, settings); update +
re-solve hits the compiled cache with zero retracing (the analog of the
reference's allocation-free update path, solver.hpp:218-308).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import ruiz, solver
from .types import (
    PIQP_INF,
    FullKKTQPData,
    Info,
    KKTBackend,
    QPData,
    Result,
    Scaling,
    Settings,
    Status,
    identity_scaling,
)


def _route_backend(data: QPData, settings: Settings) -> QPData:
    """Re-wrap the data in the representation matching settings.kkt_solver
    (the representation type IS the backend selector; see kkt.py)."""
    import dataclasses

    if settings.kkt_solver == KKTBackend.dense_lu and type(data) is QPData:
        return FullKKTQPData(
            **{f.name: getattr(data, f.name) for f in dataclasses.fields(QPData)}
        )
    return data


def _as_2d(M, rows, cols, dtype):
    if M is None:
        return np.zeros((rows, cols), dtype=dtype)
    M = np.asarray(M, dtype=dtype)
    if M.shape != (rows, cols):
        raise ValueError(f"expected shape {(rows, cols)}, got {M.shape}")
    return M


def _as_1d(v, size, dtype, fill):
    if v is None:
        return np.full(size, fill, dtype=dtype)
    v = np.asarray(v, dtype=dtype)
    if v.shape != (size,):
        raise ValueError(f"expected shape {(size,)}, got {v.shape}")
    return v


def prepare_data(
    P,
    c,
    A=None,
    b=None,
    G=None,
    h_l=None,
    h_u=None,
    x_l=None,
    x_u=None,
    dtype=jnp.float64,
) -> QPData:
    """Canonicalize a QP into the internal masked representation.

    Mirrors the reference data layer semantics:
      - only the upper triangle of P is used and symmetrized
        (solver.hpp:182: ``P.triangularView<Upper>()``);
      - bounds with magnitude >= 1e30 (PIQP_INF) are inactive
        (dense/data.hpp:100-142);
      - rows of G with neither bound get zeroed with fake bounds [-1, 1]
        (``disable_inf_constraints``, dense/data.hpp:144-169).
    """
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    P = np.asarray(P, dtype=np_dtype)
    if P.ndim != 2 or P.shape[0] != P.shape[1]:
        raise ValueError("P must be square")
    n = P.shape[0]
    # use upper triangle only, symmetrize (matches reference semantics)
    P_utri = np.triu(P)
    P_full = P_utri + np.triu(P, 1).T

    c = _as_1d(c, n, np_dtype, 0.0)

    p = 0 if A is None else np.asarray(A).shape[0]
    m = 0 if G is None else np.asarray(G).shape[0]
    A = _as_2d(A, p, n, np_dtype)
    b = _as_1d(b, p, np_dtype, 0.0)
    G = _as_2d(G, m, n, np_dtype)
    if m > 0 and h_l is None and h_u is None:
        raise ValueError("h_l or h_u should be provided when G is given")
    h_l = _as_1d(h_l, m, np_dtype, -np.inf)
    h_u = _as_1d(h_u, m, np_dtype, np.inf)
    x_l = _as_1d(x_l, n, np_dtype, -np.inf)
    x_u = _as_1d(x_u, n, np_dtype, np.inf)

    hl_mask = h_l > -PIQP_INF
    hu_mask = h_u < PIQP_INF

    # disable_inf_constraints (dense/data.hpp:144-169)
    dead = ~hl_mask & ~hu_mask
    if dead.any():
        G = G.copy()
        G[dead, :] = 0.0
        h_l = np.where(dead, -1.0, h_l)
        h_u = np.where(dead, 1.0, h_u)
        hl_mask = h_l > -PIQP_INF
        hu_mask = h_u < PIQP_INF

    xl_mask = x_l > -PIQP_INF
    xu_mask = x_u < PIQP_INF

    # inactive entries hold exact zeros (see types.py)
    h_l = np.where(hl_mask, h_l, 0.0)
    h_u = np.where(hu_mask, h_u, 0.0)
    x_l = np.where(xl_mask, x_l, 0.0)
    x_u = np.where(xu_mask, x_u, 0.0)

    return QPData(
        P=jnp.asarray(P_full),
        c=jnp.asarray(c),
        A=jnp.asarray(A),
        b=jnp.asarray(b),
        G=jnp.asarray(G),
        h_l=jnp.asarray(h_l),
        h_u=jnp.asarray(h_u),
        x_l=jnp.asarray(x_l),
        x_u=jnp.asarray(x_u),
        x_b_scaling=jnp.ones(n, dtype),
        hl_mask=jnp.asarray(hl_mask),
        hu_mask=jnp.asarray(hu_mask),
        xl_mask=jnp.asarray(xl_mask),
        xu_mask=jnp.asarray(xu_mask),
    )


def has_cone(data: QPData) -> bool:
    """Static dispatch flag: any inequality or bound constraints present
    (the reference's ``m + n_x_l + n_x_u > 0`` gate, solver.hpp:504)."""
    return bool(
        data.m > 0
        or bool(np.asarray(jnp.any(data.xl_mask)))
        or bool(np.asarray(jnp.any(data.xu_mask)))
    )


@partial(jax.jit, static_argnames=("settings", "cone"))
def _solve_fresh(data: QPData, settings: Settings, cone: bool):
    """Equilibrate + solve; returns (result, scaling)."""
    # float32 matmuls on TPU default to bfloat16 passes — catastrophic for a
    # factorization-based solver; force full-precision accumulation (f64 is
    # unaffected).
    with jax.default_matmul_precision("highest"):
        sdata, sc = ruiz.equilibrate(
            data,
            max_iter=settings.preconditioner_iter,
            scale_cost=settings.preconditioner_scale_cost,
        )
        return solver.solve_scaled(sdata, sc, settings, cone), sc


@partial(jax.jit, static_argnames=("settings", "cone"))
def _solve_reuse(data: QPData, sc: Scaling, settings: Settings, cone: bool):
    with jax.default_matmul_precision("highest"):
        sdata = ruiz.apply_scaling(data, sc)
        return solver.solve_scaled(sdata, sc, settings, cone)


def solve_prepared(
    data: QPData, settings: Settings = Settings(), scaling: Optional[Scaling] = None
) -> Result:
    """Functional solve of a prepared problem. jit/vmap-compatible building
    block (use `_solve_fresh` pieces directly for full control)."""
    data = _route_backend(data, settings)
    cone = has_cone(data)
    if scaling is not None:
        return _solve_reuse(data, scaling, settings, cone)
    result, _ = _solve_fresh(data, settings, cone)
    return result


def solve_dense(
    P, c, A=None, b=None, G=None, h_l=None, h_u=None, x_l=None, x_u=None,
    settings: Settings = Settings(),
) -> Result:
    """One-shot dense QP solve (functional analog of
    DenseSolver::setup+solve)."""
    data = prepare_data(
        P, c, A, b, G, h_l, h_u, x_l, x_u, dtype=settings.jnp_dtype
    )
    return solve_prepared(data, settings)


class DenseSolver:
    """Stateful solver mirroring piqp::DenseSolver (solver.hpp:1262-1291).

    Usage:
        solver = DenseSolver()
        solver.settings = Settings(eps_abs=1e-9)   # or mutate attributes
        solver.setup(P, c, A, b, G, h_l, h_u, x_l, x_u)
        status = solver.solve()
        x = solver.result.x
        solver.update(P=P2, h_u=h_u2)
        status = solver.solve()
    """

    def __init__(self, settings: Settings = Settings()):
        self.settings = settings
        self._raw: dict = {}
        self._data: Optional[QPData] = None
        self._scaling: Optional[Scaling] = None
        self._result: Optional[Result] = None
        self._first_run = True
        self._setup_time = 0.0
        self._update_time = 0.0

    # -- setup / update -----------------------------------------------------

    def setup(self, P, c, A=None, b=None, G=None, h_l=None, h_u=None,
              x_l=None, x_u=None) -> None:
        t0 = time.perf_counter()
        self._raw = dict(P=P, c=c, A=A, b=b, G=G, h_l=h_l, h_u=h_u,
                         x_l=x_l, x_u=x_u)
        self._data = prepare_data(
            P, c, A, b, G, h_l, h_u, x_l, x_u, dtype=self.settings.jnp_dtype
        )
        self._scaling = None
        self._first_run = True
        self._setup_time = time.perf_counter() - t0

    def update(self, P=None, c=None, A=None, b=None, G=None, h_l=None,
               h_u=None, x_l=None, x_u=None) -> None:
        """Update problem data in place (solver.hpp:218-308).  Shapes must
        match the setup call; the compiled solve is reused without
        retracing."""
        if self._data is None:
            raise RuntimeError("Solver not setup yet")
        t0 = time.perf_counter()
        updates = dict(P=P, c=c, A=A, b=b, G=G, h_l=h_l, h_u=h_u,
                       x_l=x_l, x_u=x_u)
        for k, v in updates.items():
            if v is not None:
                self._raw[k] = v
        self._data = prepare_data(
            **self._raw, dtype=self.settings.jnp_dtype
        )
        matrices_changed = any(updates[k] is not None for k in ("P", "A", "G"))
        if not (self.settings.preconditioner_reuse_on_update or not matrices_changed):
            self._scaling = None  # recompute Ruiz on next solve
        self._update_time = time.perf_counter() - t0

    # -- solve --------------------------------------------------------------

    def solve(self) -> Status:
        if self._data is None:
            raise RuntimeError("Solver not setup yet")
        if not self.settings.verify():
            dummy = jax.tree.map(jnp.asarray, _invalid_info(self.settings))
            self._result = dummy
            return Status.INVALID_SETTINGS

        if self.settings.verbose:
            self._print_header()

        data = _route_backend(self._data, self.settings)
        cone = has_cone(data)
        t0 = time.perf_counter()
        if self._scaling is None or not self.settings.preconditioner_reuse_on_update:
            result, sc = _solve_fresh(data, self.settings, cone)
            self._scaling = sc
        else:
            result = _solve_reuse(data, self._scaling, self.settings, cone)
        result = jax.block_until_ready(result)
        solve_time = time.perf_counter() - t0

        self._result = result
        self._solve_time = solve_time
        if self.settings.compute_timings:
            # host-side timing mirror of Info's timing fields
            # (results.hpp:83-88); per-phase device timings require a
            # profiler trace and are reported as 0 here.
            info = result.info
            info.setup_time = self._setup_time
            info.update_time = self._update_time
            info.solve_time = solve_time
            info.kkt_factor_time = 0.0
            info.kkt_solve_time = 0.0
            info.run_time = (
                self._setup_time if self._first_run else self._update_time
            ) + solve_time
        self._first_run = False
        status = Status(int(result.info.status))
        if self.settings.verbose:
            print(f"\nstatus:               {status.name.lower()}")
            print(f"number of iterations: {int(result.info.iter)}")
            print(f"objective:            {float(result.info.primal_obj):.5e}")
        return status

    def _print_header(self):
        from . import __version__

        print("----------------------------------------------------------")
        print(f"              piqp_tpu v{__version__} (TPU-native)        ")
        print("----------------------------------------------------------")
        d = self._data
        print(f"variables n = {d.n}, equality constraints p = {d.p}, "
              f"inequality constraints m = {d.m}")
        print()
        print("iter  prim_obj       dual_obj       duality_gap   prim_res"
              "      dual_res      rho         delta       mu          "
              "p_step   d_step")

    @property
    def result(self) -> Result:
        if self._result is None:
            raise RuntimeError("No solve has been performed yet")
        return self._result


def _invalid_info(settings: Settings):
    from .types import init_info, zero_vars

    # placeholder result carrying only the status
    info = init_info(settings, settings.jnp_dtype)
    info = info.replace(
        status=jnp.asarray(int(Status.INVALID_SETTINGS), jnp.int32)
    )
    v = zero_vars(0, 0, 0, settings.jnp_dtype)
    return Result(
        x=v.x, y=v.y, z_l=v.z_l, z_u=v.z_u, z_bl=v.z_bl, z_bu=v.z_bu,
        s_l=v.s_l, s_u=v.s_u, s_bl=v.s_bl, s_bu=v.s_bu, info=info,
    )
