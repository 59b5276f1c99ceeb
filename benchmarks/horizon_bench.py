"""BASELINE config 4: N=100-stage block-tridiagonal MPC QP through the
multistage (Riccati/Schur-analog) backend, plus the horizon-sharded run.

Usage:
  python benchmarks/horizon_bench.py            # single-device latency
  python benchmarks/horizon_bench.py --mesh     # 8-way horizon-sharded
                                                # (virtual CPU mesh unless
                                                # real chips are present)

Prints one JSON line per mode.  Timing rules for the tunneled axon TPU
runtime (docs/performance.md): uploads before dispatches, readback
completion barriers, fresh process per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 100  # the BASELINE config-4 horizon


def _reexec_cpu_mesh():
    """Re-exec with a scrubbed environment: the container's sitecustomize
    registers the axon PJRT plugin at interpreter startup (before main()
    runs), so in-process env edits are too late — a dead tunnel would hang
    this process before the first line of user code."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env["_PIQP_MESH_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    mesh_mode = "--mesh" in sys.argv
    if (mesh_mode and os.environ.get("PALLAS_AXON_POOL_IPS")
            and not os.environ.get("_PIQP_MESH_REEXEC")):
        # no multi-chip hardware in this environment: the sharded mode
        # runs on the virtual 8-device CPU mesh (semantics + scaling shape,
        # not absolute perf)
        _reexec_cpu_mesh()

    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from piqp_tpu import Settings, Status, solve_prepared
    from piqp_tpu import multistage as ms

    sdata = ms.random_multistage_qp(T=T, D=8, Da=4, ra=4, rg=4, seed=4)

    if mesh_mode:
        from jax.sharding import Mesh
        from piqp_tpu.parallel.horizon import solve_horizon_sharded

        mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
        res = solve_horizon_sharded(sdata, mesh, "sp")
        np.asarray(res.x)
        t0 = time.perf_counter()
        res = solve_horizon_sharded(sdata, mesh, "sp")
        np.asarray(res.x)
        cold_dt = time.perf_counter() - t0

        # warm-started MPC re-solve after a cost shift
        sdata2 = sdata.replace(c=sdata.c * 1.01)
        resw = solve_horizon_sharded(sdata2, mesh, "sp", warm=res)  # compile
        np.asarray(resw.x)
        t0 = time.perf_counter()
        resw = solve_horizon_sharded(sdata2, mesh, "sp", warm=res)
        np.asarray(resw.x)
        warm_dt = time.perf_counter() - t0
        print(json.dumps(dict(
            mode="horizon_sharded", T=T, devices=len(mesh.devices.ravel()),
            platform=jax.default_backend(),
            status=int(res.info.status), iters=int(res.info.iter),
            solve_ms=round(cold_dt * 1e3, 2),
            warm_status=int(resw.info.status),
            warm_iters=int(resw.info.iter),
            warm_solve_ms=round(warm_dt * 1e3, 2),
        )))
        return

    sdata = jax.device_put(sdata)
    jax.block_until_ready(sdata)
    res = solve_prepared(sdata)  # warmup/compile
    np.asarray(res.x)
    assert int(res.info.status) == Status.SOLVED, int(res.info.status)

    t0 = time.perf_counter()
    res = solve_prepared(sdata)
    np.asarray(res.x)
    cold_ms = (time.perf_counter() - t0) * 1e3

    # warm-started re-solve after an MPC-style cost shift
    sdata2 = sdata.replace(c=sdata.c * 1.01)
    resw = solve_prepared(sdata2, warm=res)  # compile (warm variant)
    np.asarray(resw.x)
    t0 = time.perf_counter()
    resw = solve_prepared(sdata2, warm=res)
    np.asarray(resw.x)
    warm_ms = (time.perf_counter() - t0) * 1e3

    print(json.dumps(dict(
        mode="single_device", T=T, platform=jax.default_backend(),
        device=str(jax.devices()[0]),
        status=int(res.info.status), iters=int(res.info.iter),
        solve_ms=round(cold_ms, 2),
        warm_status=int(resw.info.status), warm_iters=int(resw.info.iter),
        warm_solve_ms=round(warm_ms, 2),
    )))


if __name__ == "__main__":
    main()
