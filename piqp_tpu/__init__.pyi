"""Typing stubs for the piqp_tpu public API (analog of the reference's
interfaces/python/piqp/__init__.pyi)."""

import enum
from typing import Any, Optional, Sequence

import jax
import jax.sharding

ArrayLike = Any  # numpy array, jax array, or nested sequence
SparseLike = Any  # scipy.sparse matrix or dense ArrayLike

PIQP_INF: float
__version__: str

class Status(enum.IntEnum):
    SOLVED = ...
    MAX_ITER_REACHED = ...
    PRIMAL_INFEASIBLE = ...
    DUAL_INFEASIBLE = ...
    NUMERICS = ...
    UNSOLVED = ...
    INVALID_SETTINGS = ...
    RUNNING = ...

def status_to_string(status: int | Status) -> str: ...

class KKTBackend(enum.Enum):
    dense_cholesky = ...
    dense_lu = ...
    dense_ldlt = ...
    multistage = ...
    sparse_host = ...
    @classmethod
    def from_piqp(cls, name: str) -> "KKTBackend": ...

class Settings:
    rho_init: float
    delta_init: float
    eps_abs: float
    eps_rel: float
    check_duality_gap: bool
    eps_duality_gap_abs: float
    eps_duality_gap_rel: float
    infeasibility_threshold: float
    reg_lower_limit: float
    reg_finetune_lower_limit: float
    reg_finetune_primal_update_threshold: int
    reg_finetune_dual_update_threshold: int
    max_iter: int
    max_factor_retires: int
    preconditioner_scale_cost: bool
    preconditioner_reuse_on_update: bool
    preconditioner_iter: int
    tau: float
    kkt_solver: KKTBackend
    iterative_refinement_always_enabled: bool
    iterative_refinement_eps_abs: float
    iterative_refinement_eps_rel: float
    iterative_refinement_max_iter: int
    iterative_refinement_min_improvement_rate: float
    iterative_refinement_static_regularization_eps: float
    iterative_refinement_static_regularization_rel: Optional[float]
    verbose: bool
    compute_timings: bool
    dtype: str
    mixed_precision: bool
    mixed_precision_mu_switch: float
    mixed_phase_a_patience: int
    pallas_kernels: bool | None
    dense_routing_max_n: Optional[int]
    refine_mu_factor: float
    refine_static_passes: int
    verify_certificates: bool
    warm_start_mu: float
    centrality_correctors: int
    def __init__(self, **kwargs: Any) -> None: ...
    def verify(self) -> bool: ...
    def static_reg_rel(self) -> float: ...
    @property
    def jnp_dtype(self) -> Any: ...

class Info:
    status: jax.Array
    iter: jax.Array
    rho: jax.Array
    delta: jax.Array
    mu: jax.Array
    sigma: jax.Array
    primal_step: jax.Array
    dual_step: jax.Array
    primal_res: jax.Array
    primal_res_rel: jax.Array
    dual_res: jax.Array
    dual_res_rel: jax.Array
    primal_res_reg: jax.Array
    primal_res_reg_rel: jax.Array
    dual_res_reg: jax.Array
    dual_res_reg_rel: jax.Array
    primal_prox_inf: jax.Array
    dual_prox_inf: jax.Array
    prev_primal_res: jax.Array
    prev_dual_res: jax.Array
    primal_obj: jax.Array
    dual_obj: jax.Array
    duality_gap: jax.Array
    duality_gap_rel: jax.Array
    factor_retires: jax.Array
    reg_limit: jax.Array
    no_primal_update: jax.Array
    no_dual_update: jax.Array
    setup_time: jax.Array
    update_time: jax.Array
    solve_time: jax.Array
    kkt_factor_time: jax.Array
    kkt_solve_time: jax.Array
    run_time: jax.Array
    def replace(self, **kwargs: Any) -> "Info": ...

class Result:
    x: jax.Array
    y: jax.Array
    z_l: jax.Array
    z_u: jax.Array
    z_bl: jax.Array
    z_bu: jax.Array
    s_l: jax.Array
    s_u: jax.Array
    s_bl: jax.Array
    s_bu: jax.Array
    info: Info
    def replace(self, **kwargs: Any) -> "Result": ...

class QPData:
    n: int
    p: int
    m: int
    P: jax.Array
    c: jax.Array
    A: jax.Array
    b: jax.Array
    G: jax.Array
    h_l: jax.Array
    h_u: jax.Array
    x_l: jax.Array
    x_u: jax.Array
    def replace(self, **kwargs: Any) -> "QPData": ...

class Scaling:
    d_x: jax.Array
    d_y: jax.Array
    d_z: jax.Array
    c: jax.Array
    def replace(self, **kwargs: Any) -> "Scaling": ...

class StageQPData:
    T: int
    D: int
    def replace(self, **kwargs: Any) -> "StageQPData": ...

class ShardedStageQPData:
    def replace(self, **kwargs: Any) -> "ShardedStageQPData": ...

class DenseSolver:
    settings: Settings
    def __init__(self, settings: Settings = ...) -> None: ...
    def setup(
        self,
        P: ArrayLike,
        c: ArrayLike,
        A: Optional[ArrayLike] = ...,
        b: Optional[ArrayLike] = ...,
        G: Optional[ArrayLike] = ...,
        h_l: Optional[ArrayLike] = ...,
        h_u: Optional[ArrayLike] = ...,
        x_l: Optional[ArrayLike] = ...,
        x_u: Optional[ArrayLike] = ...,
    ) -> None: ...
    def update(
        self,
        P: Optional[ArrayLike] = ...,
        c: Optional[ArrayLike] = ...,
        A: Optional[ArrayLike] = ...,
        b: Optional[ArrayLike] = ...,
        G: Optional[ArrayLike] = ...,
        h_l: Optional[ArrayLike] = ...,
        h_u: Optional[ArrayLike] = ...,
        x_l: Optional[ArrayLike] = ...,
        x_u: Optional[ArrayLike] = ...,
    ) -> None: ...
    def solve(self, warm_start: bool = ...) -> Status: ...
    @property
    def result(self) -> Result: ...

class SparseSolver:
    settings: Settings
    def __init__(
        self, settings: Settings = ..., multistage_fallback: bool = ...,
        host_kkt_mode: str = ...,
    ) -> None: ...
    def setup(
        self,
        P: SparseLike,
        c: ArrayLike,
        A: Optional[SparseLike] = ...,
        b: Optional[ArrayLike] = ...,
        G: Optional[SparseLike] = ...,
        h_l: Optional[ArrayLike] = ...,
        h_u: Optional[ArrayLike] = ...,
        x_l: Optional[ArrayLike] = ...,
        x_u: Optional[ArrayLike] = ...,
    ) -> None: ...
    def update(
        self,
        P: Optional[SparseLike] = ...,
        c: Optional[ArrayLike] = ...,
        A: Optional[SparseLike] = ...,
        b: Optional[ArrayLike] = ...,
        G: Optional[SparseLike] = ...,
        h_l: Optional[ArrayLike] = ...,
        h_u: Optional[ArrayLike] = ...,
        x_l: Optional[ArrayLike] = ...,
        x_u: Optional[ArrayLike] = ...,
    ) -> None: ...
    def solve(self, warm_start: bool = ...) -> Status: ...
    @property
    def result(self) -> Result: ...

def prepare_data(
    P: ArrayLike,
    c: ArrayLike,
    A: Optional[ArrayLike] = ...,
    b: Optional[ArrayLike] = ...,
    G: Optional[ArrayLike] = ...,
    h_l: Optional[ArrayLike] = ...,
    h_u: Optional[ArrayLike] = ...,
    x_l: Optional[ArrayLike] = ...,
    x_u: Optional[ArrayLike] = ...,
    dtype: Any = ...,
) -> QPData: ...
def has_cone(data: QPData) -> bool: ...
def solve_dense(
    P: ArrayLike,
    c: ArrayLike,
    A: Optional[ArrayLike] = ...,
    b: Optional[ArrayLike] = ...,
    G: Optional[ArrayLike] = ...,
    h_l: Optional[ArrayLike] = ...,
    h_u: Optional[ArrayLike] = ...,
    x_l: Optional[ArrayLike] = ...,
    x_u: Optional[ArrayLike] = ...,
    settings: Settings = ...,
) -> Result: ...
def solve_prepared(
    data: QPData,
    settings: Settings = ...,
    scaling: Optional[Scaling] = ...,
    warm: Optional[Any] = ...,
) -> Result: ...
def prepare_batch(problems: Sequence[dict], dtype: Any = ...) -> QPData: ...
def solve_batch(
    data: QPData,
    settings: Settings = ...,
    cone: bool = ...,
    sharding: Optional[jax.sharding.Sharding] = ...,
    chunk: int = ...,
    warm: Optional[Any] = ...,
) -> Result: ...
def shard_horizon(
    data: StageQPData,
    mesh: jax.sharding.Mesh,
    axis: str = ...,
    pad: bool = ...,
) -> ShardedStageQPData: ...
def solve_horizon_sharded(
    data: StageQPData,
    mesh: jax.sharding.Mesh,
    axis: str = ...,
    settings: Settings = ...,
    has_cone: bool = ...,
    warm: Optional[Any] = ...,
) -> Result: ...
def solve_qp_diff(
    data: QPData, settings: Settings = ..., cone: bool = ...
) -> Any: ...
def qp_layer(
    P: Any,
    c: Any,
    A: Any = ...,
    b: Any = ...,
    G: Any = ...,
    h_l: Any = ...,
    h_u: Any = ...,
    x_l: Any = ...,
    x_u: Any = ...,
    settings: Optional[Settings] = ...,
) -> tuple[Any, QPData]: ...
def solve_batch_compact(
    data: QPData,
    settings: Settings = ...,
    cone: bool = ...,
    chunk: int = ...,
    warm: Optional[Any] = ...,
    phase1_iters: Optional[int] = ...,
) -> Result: ...
def solve_batch_sqp(
    data: QPData,
    settings: Settings = ...,
    cone: bool = ...,
    rounds: int = ...,
    warm: Optional[Any] = ...,
    c_rounds: Optional[Any] = ...,
) -> tuple[Any, Any, Any]: ...
def warm_from_result(res: Result) -> Any: ...
