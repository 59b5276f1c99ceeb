/* C interface implementation: embeds the CPython runtime and drives
 * piqp_tpu.DenseSolver / piqp_tpu.SparseSolver.  See piqp_tpu_c.h for the
 * contract; the surface mirrors the reference's opaque-workspace C API
 * (/root/reference/interfaces/c/include/piqp.h:21-43, full settings/info
 * structs from piqp_typedef.h:77-175) re-designed around an embedded
 * interpreter instead of template instantiations.
 *
 * Only the limited + stable parts of the CPython API are used (no numpy
 * C API): C buffers cross into Python as memoryviews wrapped by
 * numpy.frombuffer, and results cross back through PyObject_GetBuffer on
 * numpy.ascontiguousarray output.
 */
#include "piqp_tpu_c.h"

#include <Python.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static char g_err[1024] = "";

static void set_err_from_python()
{
    PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
    PyErr_Fetch(&type, &value, &tb);
    if (value) {
        PyObject* s = PyObject_Str(value);
        if (s) {
            snprintf(g_err, sizeof(g_err), "%s", PyUnicode_AsUTF8(s));
            Py_DECREF(s);
        }
    } else {
        snprintf(g_err, sizeof(g_err), "unknown python error");
    }
    Py_XDECREF(type);
    Py_XDECREF(value);
    Py_XDECREF(tb);
}

const char* piqp_tpu_last_error(void) { return g_err; }

static bool ensure_python()
{
    if (Py_IsInitialized()) return true;
    Py_InitializeEx(0);
    return Py_IsInitialized();
}

struct piqp_tpu_workspace {
    PyObject* solver = nullptr; /* DenseSolver or SparseSolver instance */
    int n = 0, p = 0, m = 0;
    bool is_sparse = false;
    piqp_tpu_settings settings; /* C mirror of the active settings */
    /* C-owned copies of the last result */
    std::vector<double> x, y, z_l, z_u, z_bl, z_bu, s_l, s_u, s_bl, s_bu;
    piqp_tpu_info info;
    bool solved_once = false;
};

void piqp_tpu_settings_default(piqp_tpu_settings* s)
{
    memset(s, 0, sizeof(*s));
    s->rho_init = 1e-6;
    s->delta_init = 1e-4;
    s->eps_abs = 1e-8;
    s->eps_rel = 1e-9;
    s->check_duality_gap = 1;
    s->eps_duality_gap_abs = 1e-8;
    s->eps_duality_gap_rel = 1e-9;
    s->infeasibility_threshold = 0.9;
    s->reg_lower_limit = 1e-10;
    s->reg_finetune_lower_limit = 1e-13;
    s->reg_finetune_primal_update_threshold = 7;
    s->reg_finetune_dual_update_threshold = 7;
    s->max_iter = 250;
    s->max_factor_retires = 10;
    s->preconditioner_scale_cost = 0;
    s->preconditioner_reuse_on_update = 0;
    s->preconditioner_iter = 10;
    s->tau = 0.99;
    s->kkt_solver = PIQP_TPU_DENSE_CHOLESKY;
    s->iterative_refinement_always_enabled = 0;
    s->iterative_refinement_eps_abs = 1e-12;
    s->iterative_refinement_eps_rel = 1e-12;
    s->iterative_refinement_max_iter = 10;
    s->iterative_refinement_min_improvement_rate = 5.0;
    s->iterative_refinement_static_regularization_eps = 1e-8;
    s->iterative_refinement_static_regularization_rel = -1.0; /* default */
    s->verbose = 0;
    s->compute_timings = 0;
    s->use_float32 = 0;
    s->mixed_precision = 0;
    s->pallas_kernels = 0;
    s->refine_mu_factor = 1e-2;
    s->refine_static_passes = 1;
    s->mixed_phase_a_patience = 12;
}

static const char* backend_name(piqp_tpu_kkt_solver k)
{
    switch (k) {
        case PIQP_TPU_SPARSE_LDLT: return "sparse_host";
        case PIQP_TPU_SPARSE_MULTISTAGE: return "multistage";
        case PIQP_TPU_DENSE_LU: return "dense_lu";
        case PIQP_TPU_DENSE_LDLT: return "dense_ldlt";
        /* the elimination-level variants all condense to the same n-by-n
         * device system (PARITY.md section 2.5) */
        case PIQP_TPU_DENSE_CHOLESKY:
        case PIQP_TPU_SPARSE_LDLT_EQ_COND:
        case PIQP_TPU_SPARSE_LDLT_INEQ_COND:
        case PIQP_TPU_SPARSE_LDLT_COND:
        default: return "dense_cholesky";
    }
}

/* Build a piqp_tpu.Settings instance from the C struct. */
static PyObject* build_settings(PyObject* mod, const piqp_tpu_settings* s)
{
    PyObject* cls = PyObject_GetAttrString(mod, "Settings");
    if (!cls) return nullptr;
    PyObject* backend_cls = PyObject_GetAttrString(mod, "KKTBackend");
    PyObject* backend =
        backend_cls
            ? PyObject_GetAttrString(backend_cls, backend_name(s->kkt_solver))
            : nullptr;
    Py_XDECREF(backend_cls);
    if (!backend) {
        Py_DECREF(cls);
        return nullptr;
    }

    PyObject* kw = PyDict_New();
    bool ok = kw != nullptr;
    auto set_f = [&](const char* name, double v) {
        if (!ok) return;
        PyObject* o = PyFloat_FromDouble(v);
        ok = o && PyDict_SetItemString(kw, name, o) == 0;
        Py_XDECREF(o);
    };
    auto set_i = [&](const char* name, long v) {
        if (!ok) return;
        PyObject* o = PyLong_FromLong(v);
        ok = o && PyDict_SetItemString(kw, name, o) == 0;
        Py_XDECREF(o);
    };
    auto set_b = [&](const char* name, int v) {
        if (!ok) return;
        ok = PyDict_SetItemString(kw, name, v ? Py_True : Py_False) == 0;
    };
    set_f("rho_init", s->rho_init);
    set_f("delta_init", s->delta_init);
    set_f("eps_abs", s->eps_abs);
    set_f("eps_rel", s->eps_rel);
    set_b("check_duality_gap", s->check_duality_gap);
    set_f("eps_duality_gap_abs", s->eps_duality_gap_abs);
    set_f("eps_duality_gap_rel", s->eps_duality_gap_rel);
    set_f("infeasibility_threshold", s->infeasibility_threshold);
    set_f("reg_lower_limit", s->reg_lower_limit);
    set_f("reg_finetune_lower_limit", s->reg_finetune_lower_limit);
    set_i("reg_finetune_primal_update_threshold",
          s->reg_finetune_primal_update_threshold);
    set_i("reg_finetune_dual_update_threshold",
          s->reg_finetune_dual_update_threshold);
    set_i("max_iter", s->max_iter);
    set_i("max_factor_retires", s->max_factor_retires);
    set_b("preconditioner_scale_cost", s->preconditioner_scale_cost);
    set_b("preconditioner_reuse_on_update", s->preconditioner_reuse_on_update);
    set_i("preconditioner_iter", s->preconditioner_iter);
    set_f("tau", s->tau);
    if (ok) ok = PyDict_SetItemString(kw, "kkt_solver", backend) == 0;
    set_b("iterative_refinement_always_enabled",
          s->iterative_refinement_always_enabled);
    set_f("iterative_refinement_eps_abs", s->iterative_refinement_eps_abs);
    set_f("iterative_refinement_eps_rel", s->iterative_refinement_eps_rel);
    set_i("iterative_refinement_max_iter", s->iterative_refinement_max_iter);
    set_f("iterative_refinement_min_improvement_rate",
          s->iterative_refinement_min_improvement_rate);
    set_f("iterative_refinement_static_regularization_eps",
          s->iterative_refinement_static_regularization_eps);
    if (s->iterative_refinement_static_regularization_rel >= 0)
        set_f("iterative_refinement_static_regularization_rel",
              s->iterative_refinement_static_regularization_rel);
    set_b("verbose", s->verbose);
    set_b("compute_timings", s->compute_timings);
    if (s->use_float32 && ok) {
        PyObject* o = PyUnicode_FromString("float32");
        ok = o && PyDict_SetItemString(kw, "dtype", o) == 0;
        Py_XDECREF(o);
    }
    set_b("mixed_precision", s->mixed_precision);
    set_b("pallas_kernels", s->pallas_kernels);
    set_f("refine_mu_factor", s->refine_mu_factor);
    set_i("refine_static_passes", s->refine_static_passes);
    set_i("mixed_phase_a_patience", s->mixed_phase_a_patience);

    Py_DECREF(backend);
    PyObject* settings_obj = nullptr;
    if (ok) {
        PyObject* empty = PyTuple_New(0);
        settings_obj = empty ? PyObject_Call(cls, empty, kw) : nullptr;
        Py_XDECREF(empty);
    }
    Py_XDECREF(kw);
    Py_DECREF(cls);
    return settings_obj;
}

/* numpy.frombuffer over a read-only C buffer, reshaped to (rows, cols)
 * when cols >= 0, else left 1-D of length rows. */
static PyObject* np_wrap(PyObject* np, const double* ptr, int rows, int cols)
{
    if (!ptr) Py_RETURN_NONE;
    Py_ssize_t count = (Py_ssize_t)rows * (cols >= 0 ? cols : 1);
    PyObject* mv = PyMemoryView_FromMemory(
        (char*)ptr, count * (Py_ssize_t)sizeof(double), PyBUF_READ);
    if (!mv) return nullptr;
    PyObject* arr = PyObject_CallMethod(np, "frombuffer", "Os", mv, "float64");
    Py_DECREF(mv);
    if (!arr) return nullptr;
    if (cols >= 0) {
        PyObject* shaped =
            PyObject_CallMethod(arr, "reshape", "ii", rows, cols);
        Py_DECREF(arr);
        return shaped;
    }
    return arr;
}

/* scipy.sparse.csc_matrix((x, i, p), shape=(m, n)) over borrowed buffers
 * (copy=True via np.array so the scipy object owns its data). */
static PyObject* csc_wrap(PyObject* np, PyObject* spmod,
                          const piqp_tpu_csc* M)
{
    if (!M) Py_RETURN_NONE;
    PyObject* vals = np_wrap(np, M->x, M->nnz, -1);
    PyObject* mv_i = PyMemoryView_FromMemory(
        (char*)M->i, (Py_ssize_t)M->nnz * (Py_ssize_t)sizeof(int), PyBUF_READ);
    PyObject* mv_p = PyMemoryView_FromMemory(
        (char*)M->p, ((Py_ssize_t)M->n + 1) * (Py_ssize_t)sizeof(int),
        PyBUF_READ);
    PyObject* idx =
        mv_i ? PyObject_CallMethod(np, "frombuffer", "Os", mv_i, "int32")
             : nullptr;
    PyObject* ptr =
        mv_p ? PyObject_CallMethod(np, "frombuffer", "Os", mv_p, "int32")
             : nullptr;
    Py_XDECREF(mv_i);
    Py_XDECREF(mv_p);
    PyObject* out = nullptr;
    if (vals && idx && ptr) {
        PyObject* triple = Py_BuildValue("(OOO)", vals, idx, ptr);
        PyObject* shape = Py_BuildValue("(ii)", M->m, M->n);
        PyObject* args = triple ? Py_BuildValue("(O)", triple) : nullptr;
        PyObject* kw = shape ? Py_BuildValue("{s:O,s:O}", "shape", shape,
                                             "copy", Py_True)
                             : nullptr;
        PyObject* cls =
            PyObject_GetAttrString(spmod, "csc_matrix");
        if (cls && args && kw) out = PyObject_Call(cls, args, kw);
        Py_XDECREF(cls);
        Py_XDECREF(kw);
        Py_XDECREF(args);
        Py_XDECREF(shape);
        Py_XDECREF(triple);
    }
    Py_XDECREF(vals);
    Py_XDECREF(idx);
    Py_XDECREF(ptr);
    return out;
}

static bool build_kwargs(PyObject* np, PyObject* kwargs,
                         const piqp_tpu_dense_data* d)
{
    struct Field {
        const char* name;
        const double* ptr;
        int rows;
        int cols;
    } fields[] = {
        {"P", d->P, d->n, d->n},   {"c", d->c, d->n, -1},
        {"A", d->A, d->p, d->n},   {"b", d->b, d->p, -1},
        {"G", d->G, d->m, d->n},   {"h_l", d->h_l, d->m, -1},
        {"h_u", d->h_u, d->m, -1}, {"x_l", d->x_l, d->n, -1},
        {"x_u", d->x_u, d->n, -1},
    };
    for (const Field& f : fields) {
        if (!f.ptr || f.rows == 0) continue;
        PyObject* arr = np_wrap(np, f.ptr, f.rows, f.cols);
        if (!arr) return false;
        int rc = PyDict_SetItemString(kwargs, f.name, arr);
        Py_DECREF(arr);
        if (rc != 0) return false;
    }
    return true;
}

static bool build_kwargs_sparse(PyObject* np, PyObject* spmod,
                                PyObject* kwargs,
                                const piqp_tpu_sparse_data* d)
{
    struct MField {
        const char* name;
        const piqp_tpu_csc* M;
    } mats[] = {{"P", d->P}, {"A", d->A}, {"G", d->G}};
    for (const MField& f : mats) {
        if (!f.M) continue;
        PyObject* mat = csc_wrap(np, spmod, f.M);
        if (!mat) return false;
        int rc = PyDict_SetItemString(kwargs, f.name, mat);
        Py_DECREF(mat);
        if (rc != 0) return false;
    }
    struct VField {
        const char* name;
        const double* ptr;
        int rows;
    } vecs[] = {
        {"c", d->c, d->n},     {"b", d->b, d->p},   {"h_l", d->h_l, d->m},
        {"h_u", d->h_u, d->m}, {"x_l", d->x_l, d->n}, {"x_u", d->x_u, d->n},
    };
    for (const VField& f : vecs) {
        if (!f.ptr || f.rows == 0) continue;
        PyObject* arr = np_wrap(np, f.ptr, f.rows, -1);
        if (!arr) return false;
        int rc = PyDict_SetItemString(kwargs, f.name, arr);
        Py_DECREF(arr);
        if (rc != 0) return false;
    }
    return true;
}

/* shared setup driver: builds the solver object and runs setup(**kwargs) */
static piqp_tpu_workspace* setup_common(const char* solver_cls,
                                        const piqp_tpu_settings* settings,
                                        bool sparse, const void* data,
                                        int n, int p, int m)
{
    if (!ensure_python()) {
        snprintf(g_err, sizeof(g_err), "python init failed");
        return nullptr;
    }
    PyObject* mod = PyImport_ImportModule("piqp_tpu");
    PyObject* np = mod ? PyImport_ImportModule("numpy") : nullptr;
    PyObject* spmod =
        (np && sparse) ? PyImport_ImportModule("scipy.sparse") : nullptr;
    if (!mod || !np || (sparse && !spmod)) {
        set_err_from_python();
        Py_XDECREF(spmod);
        Py_XDECREF(np);
        Py_XDECREF(mod);
        return nullptr;
    }

    piqp_tpu_settings defaults;
    if (!settings) {
        piqp_tpu_settings_default(&defaults);
        settings = &defaults;
    }
    PyObject* py_settings = build_settings(mod, settings);
    PyObject* solver =
        py_settings ? PyObject_CallMethod(mod, solver_cls, "O", py_settings)
                    : nullptr;
    Py_XDECREF(py_settings);

    bool ok = solver != nullptr;
    if (ok) {
        PyObject* kwargs = PyDict_New();
        ok = kwargs &&
             (sparse ? build_kwargs_sparse(
                           np, spmod, kwargs,
                           (const piqp_tpu_sparse_data*)data)
                     : build_kwargs(np, kwargs,
                                    (const piqp_tpu_dense_data*)data));
        if (ok) {
            PyObject* setup = PyObject_GetAttrString(solver, "setup");
            PyObject* empty = PyTuple_New(0);
            PyObject* r =
                (setup && empty) ? PyObject_Call(setup, empty, kwargs)
                                 : nullptr;
            ok = r != nullptr;
            Py_XDECREF(r);
            Py_XDECREF(setup);
            Py_XDECREF(empty);
        }
        Py_XDECREF(kwargs);
    }
    Py_XDECREF(spmod);
    Py_DECREF(np);
    Py_DECREF(mod);
    if (!ok) {
        set_err_from_python();
        Py_XDECREF(solver);
        return nullptr;
    }

    piqp_tpu_workspace* w = new piqp_tpu_workspace();
    w->solver = solver;
    w->n = n;
    w->p = p;
    w->m = m;
    w->is_sparse = sparse;
    w->settings = *settings;
    memset(&w->info, 0, sizeof(w->info));
    w->info.status = -9; /* UNSOLVED */
    return w;
}

piqp_tpu_workspace* piqp_tpu_setup_dense(const piqp_tpu_dense_data* data,
                                         const piqp_tpu_settings* settings)
{
    return setup_common("DenseSolver", settings, false, data, data->n,
                        data->p, data->m);
}

piqp_tpu_workspace* piqp_tpu_setup_sparse(const piqp_tpu_sparse_data* data,
                                          const piqp_tpu_settings* settings)
{
    return setup_common("SparseSolver", settings, true, data, data->n,
                        data->p, data->m);
}

static int update_common(piqp_tpu_workspace* w, bool sparse, const void* data)
{
    PyObject* np = PyImport_ImportModule("numpy");
    PyObject* spmod =
        (np && sparse) ? PyImport_ImportModule("scipy.sparse") : nullptr;
    if (!np || (sparse && !spmod)) {
        set_err_from_python();
        Py_XDECREF(spmod);
        Py_XDECREF(np);
        return -1;
    }
    PyObject* kwargs = PyDict_New();
    bool ok = kwargs &&
              (sparse ? build_kwargs_sparse(np, spmod, kwargs,
                                            (const piqp_tpu_sparse_data*)data)
                      : build_kwargs(np, kwargs,
                                     (const piqp_tpu_dense_data*)data));
    if (ok) {
        PyObject* upd = PyObject_GetAttrString(w->solver, "update");
        PyObject* empty = PyTuple_New(0);
        PyObject* r =
            (upd && empty) ? PyObject_Call(upd, empty, kwargs) : nullptr;
        ok = r != nullptr;
        Py_XDECREF(r);
        Py_XDECREF(upd);
        Py_XDECREF(empty);
    }
    Py_XDECREF(kwargs);
    Py_XDECREF(spmod);
    Py_DECREF(np);
    if (!ok) {
        set_err_from_python();
        return -1;
    }
    return 0;
}

int piqp_tpu_update_dense(piqp_tpu_workspace* w,
                          const piqp_tpu_dense_data* data)
{
    return update_common(w, false, data);
}

int piqp_tpu_update_sparse(piqp_tpu_workspace* w,
                           const piqp_tpu_sparse_data* data)
{
    return update_common(w, true, data);
}

int piqp_tpu_update_settings(piqp_tpu_workspace* w,
                             const piqp_tpu_settings* settings)
{
    PyObject* mod = PyImport_ImportModule("piqp_tpu");
    if (!mod) {
        set_err_from_python();
        return -1;
    }
    PyObject* py_settings = build_settings(mod, settings);
    Py_DECREF(mod);
    if (!py_settings) {
        set_err_from_python();
        return -1;
    }
    int rc = PyObject_SetAttrString(w->solver, "settings", py_settings);
    Py_DECREF(py_settings);
    if (rc != 0) {
        set_err_from_python();
        return -1;
    }
    w->settings = *settings;
    return 0;
}

int piqp_tpu_get_settings(piqp_tpu_workspace* w, piqp_tpu_settings* out)
{
    if (!w || !out) return -1;
    *out = w->settings;
    return 0;
}

/* copy a python vector-like (array attribute) into out; resizes out. */
static bool copy_vec(PyObject* np, PyObject* obj, std::vector<double>& out)
{
    PyObject* arr =
        PyObject_CallMethod(np, "ascontiguousarray", "Os", obj, "float64");
    if (!arr) return false;
    Py_buffer view;
    if (PyObject_GetBuffer(arr, &view, PyBUF_CONTIG_RO) != 0) {
        Py_DECREF(arr);
        return false;
    }
    size_t count = (size_t)(view.len / (Py_ssize_t)sizeof(double));
    out.resize(count);
    memcpy(out.data(), view.buf, (size_t)view.len);
    PyBuffer_Release(&view);
    Py_DECREF(arr);
    return true;
}

static int solve_impl(piqp_tpu_workspace* w, int warm_start)
{
    PyObject* status =
        warm_start
            ? PyObject_CallMethod(w->solver, "solve", "i", 1)
            : PyObject_CallMethod(w->solver, "solve", nullptr);
    if (!status) {
        set_err_from_python();
        return -100;
    }
    /* Status is an IntEnum-like; PyNumber_Long handles both */
    long code = -100;
    {
        PyObject* num = PyNumber_Long(status);
        if (num) {
            code = PyLong_AsLong(num);
            Py_DECREF(num);
        } else {
            PyErr_Clear();
        }
    }
    Py_DECREF(status);

    /* snapshot the result into C-owned buffers */
    PyObject* np = PyImport_ImportModule("numpy");
    PyObject* res = PyObject_GetAttrString(w->solver, "result");
    bool ok = np && res;
    struct Pull {
        const char* name;
        std::vector<double>* dst;
    } pulls[] = {
        {"x", &w->x},       {"y", &w->y},       {"z_l", &w->z_l},
        {"z_u", &w->z_u},   {"z_bl", &w->z_bl}, {"z_bu", &w->z_bu},
        {"s_l", &w->s_l},   {"s_u", &w->s_u},   {"s_bl", &w->s_bl},
        {"s_bu", &w->s_bu},
    };
    for (const Pull& pu : pulls) {
        if (!ok) break;
        PyObject* v = PyObject_GetAttrString(res, pu.name);
        ok = v && copy_vec(np, v, *pu.dst);
        Py_XDECREF(v);
    }
    if (ok) {
        PyObject* info = PyObject_GetAttrString(res, "info");
        if (info) {
            /* PyNumber_Long/Float return NEW references; hold and release
               them.  Missing attributes (backend-dependent) leave the C
               default and clear the pending exception. */
            auto pull_long = [&](const char* name, int* dst) {
                PyObject* a = PyObject_GetAttrString(info, name);
                if (!a) {
                    PyErr_Clear();
                    return;
                }
                PyObject* num = PyNumber_Long(a);
                if (num) {
                    *dst = (int)PyLong_AsLong(num);
                    Py_DECREF(num);
                } else {
                    PyErr_Clear();
                }
                Py_DECREF(a);
            };
            auto pull_double = [&](const char* name, double* dst) {
                PyObject* a = PyObject_GetAttrString(info, name);
                if (!a) {
                    PyErr_Clear();
                    return;
                }
                PyObject* num = PyNumber_Float(a);
                if (num) {
                    *dst = PyFloat_AsDouble(num);
                    Py_DECREF(num);
                } else {
                    PyErr_Clear();
                }
                Py_DECREF(a);
            };
            piqp_tpu_info* I = &w->info;
            memset(I, 0, sizeof(*I));
            pull_long("status", &I->status);
            pull_long("iter", &I->iter);
            pull_double("rho", &I->rho);
            pull_double("delta", &I->delta);
            pull_double("mu", &I->mu);
            pull_double("sigma", &I->sigma);
            pull_double("primal_step", &I->primal_step);
            pull_double("dual_step", &I->dual_step);
            pull_double("primal_res", &I->primal_res);
            pull_double("primal_res_rel", &I->primal_res_rel);
            pull_double("dual_res", &I->dual_res);
            pull_double("dual_res_rel", &I->dual_res_rel);
            pull_double("primal_res_reg", &I->primal_res_reg);
            pull_double("primal_res_reg_rel", &I->primal_res_reg_rel);
            pull_double("dual_res_reg", &I->dual_res_reg);
            pull_double("dual_res_reg_rel", &I->dual_res_reg_rel);
            pull_double("primal_prox_inf", &I->primal_prox_inf);
            pull_double("dual_prox_inf", &I->dual_prox_inf);
            pull_double("prev_primal_res", &I->prev_primal_res);
            pull_double("prev_dual_res", &I->prev_dual_res);
            pull_double("primal_obj", &I->primal_obj);
            pull_double("dual_obj", &I->dual_obj);
            pull_double("duality_gap", &I->duality_gap);
            pull_double("duality_gap_rel", &I->duality_gap_rel);
            pull_long("factor_retires", &I->factor_retires);
            pull_double("reg_limit", &I->reg_limit);
            pull_long("no_primal_update", &I->no_primal_update);
            pull_long("no_dual_update", &I->no_dual_update);
            pull_double("setup_time", &I->setup_time);
            pull_double("update_time", &I->update_time);
            pull_double("solve_time", &I->solve_time);
            pull_double("kkt_factor_time", &I->kkt_factor_time);
            pull_double("kkt_solve_time", &I->kkt_solve_time);
            pull_double("run_time", &I->run_time);
            Py_DECREF(info);
        } else {
            PyErr_Clear();
        }
    }
    Py_XDECREF(res);
    Py_XDECREF(np);
    if (!ok) {
        set_err_from_python();
        return -100;
    }
    w->info.status = (int)code;
    w->solved_once = true;
    return (int)code;
}

int piqp_tpu_solve(piqp_tpu_workspace* w) { return solve_impl(w, 0); }

int piqp_tpu_solve_warm(piqp_tpu_workspace* w)
{
    return solve_impl(w, w->solved_once ? 1 : 0);
}

int piqp_tpu_get_result(piqp_tpu_workspace* w, piqp_tpu_result* out)
{
    if (!w->solved_once) {
        snprintf(g_err, sizeof(g_err), "no solve performed yet");
        return -1;
    }
    out->x = w->x.data();
    out->y = w->y.data();
    out->z_l = w->z_l.data();
    out->z_u = w->z_u.data();
    out->z_bl = w->z_bl.data();
    out->z_bu = w->z_bu.data();
    out->s_l = w->s_l.data();
    out->s_u = w->s_u.data();
    out->s_bl = w->s_bl.data();
    out->s_bu = w->s_bu.data();
    out->info = w->info;
    /* legacy round-1 fields */
    out->status = w->info.status;
    out->iter = w->info.iter;
    out->primal_obj = w->info.primal_obj;
    out->primal_res = w->info.primal_res;
    out->dual_res = w->info.dual_res;
    return 0;
}

void piqp_tpu_free(piqp_tpu_workspace* w)
{
    if (!w) return;
    Py_XDECREF(w->solver);
    delete w;
}
