"""Symbol-level parity with the reference Python bindings.

The lists below are transcribed from the reference's pybind11 module
(/root/reference/interfaces/python/src/piqp_python.cpp:31-137): every
name a reference Python user can touch must exist here with the same
spelling, so `piqp_tpu` is a drop-in surface.
"""

import dataclasses

from piqp_tpu.types import Info, KKTBackend, Result, Settings, Status

# piqp_python.cpp:31-38 (PIQP_ prefix dropped — our enum IS the namespace)
REF_STATUS = [
    "SOLVED", "MAX_ITER_REACHED", "PRIMAL_INFEASIBLE", "DUAL_INFEASIBLE",
    "NUMERICS", "UNSOLVED", "INVALID_SETTINGS",
]

# piqp_python.cpp:41-76
REF_INFO = [
    "status", "iter", "rho", "delta", "mu", "sigma", "primal_step",
    "dual_step", "primal_res", "primal_res_rel", "dual_res", "dual_res_rel",
    "primal_res_reg", "primal_res_reg_rel", "dual_res_reg",
    "dual_res_reg_rel", "primal_prox_inf", "dual_prox_inf",
    "prev_primal_res", "prev_dual_res", "primal_obj", "dual_obj",
    "duality_gap", "duality_gap_rel", "factor_retires", "reg_limit",
    "no_primal_update", "no_dual_update", "setup_time", "update_time",
    "solve_time", "kkt_factor_time", "kkt_solve_time", "run_time",
]

# piqp_python.cpp:78-89
REF_RESULT = [
    "x", "y", "z_l", "z_u", "z_bl", "z_bu", "s_l", "s_u", "s_bl", "s_bu",
    "info",
]

# piqp_python.cpp:91-98
REF_KKT_SOLVERS = [
    "dense_cholesky", "sparse_ldlt", "sparse_ldlt_eq_cond",
    "sparse_ldlt_ineq_cond", "sparse_ldlt_cond", "sparse_multistage",
]

# piqp_python.cpp:100-137
REF_SETTINGS = [
    "rho_init", "delta_init", "eps_abs", "eps_rel", "check_duality_gap",
    "eps_duality_gap_abs", "eps_duality_gap_rel", "infeasibility_threshold",
    "reg_lower_limit", "reg_finetune_lower_limit",
    "reg_finetune_primal_update_threshold",
    "reg_finetune_dual_update_threshold", "max_iter", "max_factor_retires",
    "preconditioner_scale_cost", "preconditioner_reuse_on_update",
    "preconditioner_iter", "tau", "kkt_solver",
    "iterative_refinement_always_enabled", "iterative_refinement_eps_abs",
    "iterative_refinement_eps_rel", "iterative_refinement_max_iter",
    "iterative_refinement_min_improvement_rate",
    "iterative_refinement_static_regularization_eps",
    "iterative_refinement_static_regularization_rel", "verbose",
    "compute_timings",
]


def test_status_values():
    assert not [s for s in REF_STATUS if not hasattr(Status, s)]


def test_info_fields():
    fields = {f.name for f in dataclasses.fields(Info)}
    assert not [f for f in REF_INFO if f not in fields]


def test_result_fields():
    fields = {f.name for f in dataclasses.fields(Result)}
    assert not [f for f in REF_RESULT if f not in fields]


def test_kkt_solver_names_map():
    for name in REF_KKT_SOLVERS:
        assert isinstance(KKTBackend.from_piqp(name), KKTBackend), name


def test_settings_fields():
    fields = {f.name for f in dataclasses.fields(Settings)}
    assert not [f for f in REF_SETTINGS if f not in fields]


def test_solver_surface():
    from piqp_tpu import DenseSolver, SparseSolver

    for cls in (DenseSolver, SparseSolver):
        for name in ("setup", "update", "solve", "result", "settings"):
            assert hasattr(cls, name) or name in ("result",), (cls, name)
