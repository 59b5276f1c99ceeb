/* C interface implementation: embeds the CPython runtime and drives
 * piqp_tpu.DenseSolver.  See piqp_tpu_c.h for the contract; the surface
 * mirrors the reference's opaque-workspace C API
 * (/root/reference/interfaces/c/src/piqp.cpp:58+) re-designed around an
 * embedded interpreter instead of template instantiations.
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
    PyObject* solver = nullptr;  /* piqp_tpu.DenseSolver instance */
    int n = 0, p = 0, m = 0;
    /* C-owned copies of the last result */
    std::vector<double> x, y, z_l, z_u, z_bl, z_bu;
    int status = -9, iter = 0;
    double primal_obj = 0, primal_res = 0, dual_res = 0;
};

void piqp_tpu_settings_default(piqp_tpu_settings* s)
{
    s->eps_abs = 1e-8;
    s->eps_rel = 1e-9;
    s->max_iter = 250;
    s->infeasibility_threshold = 0.9;
    s->verbose = 0;
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

piqp_tpu_workspace* piqp_tpu_setup_dense(const piqp_tpu_dense_data* data,
                                         const piqp_tpu_settings* settings)
{
    if (!ensure_python()) {
        snprintf(g_err, sizeof(g_err), "python init failed");
        return nullptr;
    }
    PyObject* mod = PyImport_ImportModule("piqp_tpu");
    if (!mod) {
        set_err_from_python();
        return nullptr;
    }
    PyObject* np = PyImport_ImportModule("numpy");
    if (!np) {
        set_err_from_python();
        Py_DECREF(mod);
        return nullptr;
    }

    piqp_tpu_settings defaults;
    if (!settings) {
        piqp_tpu_settings_default(&defaults);
        settings = &defaults;
    }
    PyObject* py_settings = nullptr;
    {
        PyObject* cls = PyObject_GetAttrString(mod, "Settings");
        PyObject* kw = Py_BuildValue(
            "{s:d,s:d,s:i,s:d,s:O}", "eps_abs", settings->eps_abs, "eps_rel",
            settings->eps_rel, "max_iter", settings->max_iter,
            "infeasibility_threshold", settings->infeasibility_threshold,
            "verbose", settings->verbose ? Py_True : Py_False);
        PyObject* empty = PyTuple_New(0);
        py_settings = cls ? PyObject_Call(cls, empty, kw) : nullptr;
        Py_XDECREF(cls);
        Py_XDECREF(kw);
        Py_XDECREF(empty);
    }
    if (!py_settings) {
        set_err_from_python();
        Py_DECREF(np);
        Py_DECREF(mod);
        return nullptr;
    }

    PyObject* solver =
        PyObject_CallMethod(mod, "DenseSolver", "O", py_settings);
    Py_DECREF(py_settings);
    if (!solver) {
        set_err_from_python();
        Py_DECREF(np);
        Py_DECREF(mod);
        return nullptr;
    }

    PyObject* kwargs = PyDict_New();
    bool ok = kwargs && build_kwargs(np, kwargs, data);
    if (ok) {
        PyObject* setup = PyObject_GetAttrString(solver, "setup");
        PyObject* empty = PyTuple_New(0);
        PyObject* r = setup ? PyObject_Call(setup, empty, kwargs) : nullptr;
        ok = r != nullptr;
        Py_XDECREF(r);
        Py_XDECREF(setup);
        Py_XDECREF(empty);
    }
    Py_XDECREF(kwargs);
    Py_DECREF(np);
    Py_DECREF(mod);
    if (!ok) {
        set_err_from_python();
        Py_DECREF(solver);
        return nullptr;
    }

    piqp_tpu_workspace* w = new piqp_tpu_workspace();
    w->solver = solver;
    w->n = data->n;
    w->p = data->p;
    w->m = data->m;
    return w;
}

int piqp_tpu_update_dense(piqp_tpu_workspace* w,
                          const piqp_tpu_dense_data* data)
{
    PyObject* np = PyImport_ImportModule("numpy");
    if (!np) {
        set_err_from_python();
        return -1;
    }
    PyObject* kwargs = PyDict_New();
    bool ok = kwargs && build_kwargs(np, kwargs, data);
    if (ok) {
        PyObject* upd = PyObject_GetAttrString(w->solver, "update");
        PyObject* empty = PyTuple_New(0);
        PyObject* r = upd ? PyObject_Call(upd, empty, kwargs) : nullptr;
        ok = r != nullptr;
        Py_XDECREF(r);
        Py_XDECREF(upd);
        Py_XDECREF(empty);
    }
    Py_XDECREF(kwargs);
    Py_DECREF(np);
    if (!ok) {
        set_err_from_python();
        return -1;
    }
    return 0;
}

int piqp_tpu_solve(piqp_tpu_workspace* w)
{
    PyObject* status = PyObject_CallMethod(w->solver, "solve", nullptr);
    if (!status) {
        set_err_from_python();
        return -100;
    }
    long code = PyLong_AsLong(status);
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
               them (they leaked once per solve before round 2). */
            auto pull_long = [&](const char* name, long* dst) {
                PyObject* a = PyObject_GetAttrString(info, name);
                if (!a) return;
                PyObject* num = PyNumber_Long(a);
                if (num) {
                    *dst = PyLong_AsLong(num);
                    Py_DECREF(num);
                }
                Py_DECREF(a);
            };
            auto pull_double = [&](const char* name, double* dst) {
                PyObject* a = PyObject_GetAttrString(info, name);
                if (!a) return;
                PyObject* num = PyNumber_Float(a);
                if (num) {
                    *dst = PyFloat_AsDouble(num);
                    Py_DECREF(num);
                }
                Py_DECREF(a);
            };
            long it = w->iter;
            pull_long("iter", &it);
            w->iter = (int)it;
            pull_double("primal_obj", &w->primal_obj);
            pull_double("primal_res", &w->primal_res);
            pull_double("dual_res", &w->dual_res);
            Py_DECREF(info);
        }
    }
    Py_XDECREF(res);
    Py_XDECREF(np);
    if (!ok) {
        set_err_from_python();
        return -100;
    }
    w->status = (int)code;
    return (int)code;
}

int piqp_tpu_get_result(piqp_tpu_workspace* w, piqp_tpu_result* out)
{
    if (w->x.empty() && w->n > 0) {
        snprintf(g_err, sizeof(g_err), "no solve performed yet");
        return -1;
    }
    out->x = w->x.data();
    out->y = w->y.data();
    out->z_l = w->z_l.data();
    out->z_u = w->z_u.data();
    out->z_bl = w->z_bl.data();
    out->z_bu = w->z_bu.data();
    out->status = w->status;
    out->iter = w->iter;
    out->primal_obj = w->primal_obj;
    out->primal_res = w->primal_res;
    out->dual_res = w->dual_res;
    return 0;
}

void piqp_tpu_free(piqp_tpu_workspace* w)
{
    if (!w) return;
    Py_XDECREF(w->solver);
    delete w;
}
