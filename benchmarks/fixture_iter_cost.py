"""In-graph per-iteration cost of the multistage vs dense backends on the
SQP fixtures (VERDICT r4 item 4's breakdown clause).

Method: k-loop differencing through `max_iter` — jit the full solve at two
iteration caps and attribute (t(M2) - t(M1)) / (M2 - M1) as the marginal
in-graph cost of one IPM iteration; the dispatch floor, init, and
residual-readback costs cancel in the difference.  Dispatch floor is also
measured directly (trivial-op dispatch) for context.

Usage: python benchmarks/fixture_iter_cost.py [fixture] [backend]
  (no args: both fixtures x both backends, fresh meaning per process is
   NOT preserved — prefer one cell per invocation on the tunneled TPU)
Prints one JSON line per cell.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from piqp_tpu import Settings, solve_prepared
from piqp_tpu import multistage as ms
from piqp_tpu.api import prepare_data
from piqp_tpu.utils.io import load_mat

DATA = "/root/reference/tests/data"
M1, M2 = 4, 12  # iteration caps for the differencing


def _dense_prob(prob):
    def todense(M):
        return M.toarray() if hasattr(M, "toarray") else M

    return {k: (todense(v) if k in ("P", "A", "G") else v)
            for k, v in prob.items() if v is not None}


def time_caps(data, settings):
    outs = []
    for cap in (M1, M2):
        s = dataclasses.replace(settings, max_iter=cap)
        res = solve_prepared(data, s)  # compile
        np.asarray(res.x)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = solve_prepared(data, s)
            np.asarray(res.x)
            best = min(best, time.perf_counter() - t0)
        outs.append((best, int(res.info.iter)))
    (t1, i1), (t2, i2) = outs
    if i2 == i1:
        return None, (t1, i1, t2, i2)
    return (t2 - t1) / (i2 - i1), (t1, i1, t2, i2)


def dispatch_floor():
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a + 1.0)
    np.asarray(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def run_cell(name, backend):
    prob = load_mat(f"{DATA}/{name}.mat", sparse=True)
    settings = Settings(mixed_precision=True)
    if backend == "multistage":
        data, _ = ms.from_sparse(**prob)
        shape = dict(T=data.T, D=data.D, Da=data.Da)
    else:
        data = prepare_data(**_dense_prob(prob))
        shape = dict(n=data.n, p=data.p, m=data.m)
    per_iter, raw = time_caps(data, settings)
    print(json.dumps(dict(
        fixture=name, backend=backend, device=str(jax.devices()[0]),
        **shape,
        iter_ms=(round(per_iter * 1e3, 2) if per_iter else None),
        caps=dict(t1_s=round(raw[0], 4), i1=raw[1],
                  t2_s=round(raw[2], 4), i2=raw[3]),
        dispatch_floor_ms=round(dispatch_floor() * 1e3, 1),
    )), flush=True)


def main():
    if len(sys.argv) == 3:
        run_cell(sys.argv[1], sys.argv[2])
        return
    for name in ("scenario_mpc", "chain_mass_sqp"):
        for backend in ("multistage", "dense"):
            run_cell(name, backend)


if __name__ == "__main__":
    main()
