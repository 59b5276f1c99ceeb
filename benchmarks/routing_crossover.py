"""Measure the sparse->dense routing crossover (Settings.dense_routing_max_n).

SparseSolver routes unstructured sparse problems either to the device dense
condensed backend (densify; mixed-precision Cholesky on the MXU) or to the
host sparse backend (SuperLU), with the cap SparseSolver.DENSE_ROUTING_MAX_N
deciding by problem size (SURVEY.md section 7 design delta 3's routing
rule).  This benchmark measures both routes on the same problems so the cap
is a recorded number per runtime rather than folklore.

Problems mirror the reference's dense-vs-sparse benchmark
(/root/reference/benchmarks/src/dense_sparse_solver_benchmark.cpp:17-56):
sparse strongly-convex QPs, n_eq = n_ineq = dim/2, sparsity 0.1.

Usage:
  python benchmarks/routing_crossover.py             # full sweep (subprocess
                                                     # per point: tunnel rule
                                                     # 'one config per process')
  python benchmarks/routing_crossover.py --one N ROUTE   # internal

Prints one JSON line per (n, route) plus a summary with the measured
crossover; the sweep also writes benchmarks/routing_crossover.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SIZES = (128, 256, 512, 1024, 2048)
TIMEOUT_S = {128: 600, 256: 600, 512: 900, 1024: 1200, 2048: 1800}


def run_one(n: int, route: str):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/tests/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from piqp_tpu import KKTBackend, Settings, Status
    from piqp_tpu.sparse import SparseSolver
    from piqp_tpu.utils.random import sparse_strongly_convex_qp

    prob = sparse_strongly_convex_qp(n, n // 2, n // 2, seed=42)
    if route == "device":
        settings = Settings(
            kkt_solver=KKTBackend.dense_cholesky,
            dense_routing_max_n=10**9,
            mixed_precision=True,
        )
    else:
        settings = Settings(kkt_solver=KKTBackend.sparse_host)

    s = SparseSolver(settings)
    s.setup(**prob)
    # warmup (compile + first dispatch), then timed warm-cache solves;
    # completion via the result readback inside solve()
    s.solve()
    best = float("inf")
    for _ in range(2 if n >= 1024 else 3):
        t0 = time.perf_counter()
        status = s.solve()
        best = min(best, time.perf_counter() - t0)
    res = s.result
    dev = "host-cpu" if route == "host" else str(
        __import__("jax").devices()[0])
    print(json.dumps(dict(
        n=n, route=route, solve_s=round(best, 4),
        status=int(status), iters=int(res.info.iter),
        solved=bool(int(status) == int(Status.SOLVED)),
        device=dev,
    )), flush=True)


def sweep():
    rows = []
    for n in SIZES:
        for route in ("device", "host"):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--one", str(n), route]
            env = dict(os.environ)
            if route == "host":
                env.pop("PALLAS_AXON_POOL_IPS", None)
                env["JAX_PLATFORMS"] = "cpu"
            try:
                out = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=TIMEOUT_S[n], cwd="/root/repo", env=env,
                )
            except subprocess.TimeoutExpired:
                print(json.dumps(dict(n=n, route=route,
                                      error="timeout")), flush=True)
                continue
            row = None
            for line in reversed(out.stdout.strip().splitlines()):
                try:
                    row = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if row is None:
                print(json.dumps(dict(
                    n=n, route=route,
                    error=(out.stderr or out.stdout)[-300:],
                )), flush=True)
                continue
            print(json.dumps(row), flush=True)
            rows.append(row)

    # crossover = largest n where the device route still wins
    crossover = 0
    for n in SIZES:
        dev = next((r for r in rows
                    if r["n"] == n and r["route"] == "device"
                    and r.get("solved")), None)
        host = next((r for r in rows
                     if r["n"] == n and r["route"] == "host"
                     and r.get("solved")), None)
        if dev and host and dev["solve_s"] <= host["solve_s"]:
            crossover = n
    summary = dict(summary=True, crossover_n=crossover, rows=rows)
    print(json.dumps(dict(summary=True, crossover_n=crossover)), flush=True)
    with open("/root/repo/benchmarks/routing_crossover.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), sys.argv[3])
    else:
        sweep()
