"""Benchmark driver.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement: warm solve latency on the reference's own SQP benchmark
fixture (chain_mass_sqp, n=1849 — benchmarks/src/sqp_benchmarks.cpp), run
through the dense condensed device backend with two-phase mixed precision
(f32 MXU factors while the barrier is loose, f64 endgame; identical
eps_abs=1e-8 accuracy, see docs/backends.md).  vs_baseline divides the
sequential CPU dense solve time of the same problem (XLA-CPU Cholesky —
Eigen-class, the stand-in for the reference's single-core solve; the
reference repo publishes no absolute numbers, BASELINE.md `published: {}`)
by the device time.

Timing methodology for the tunneled axon TPU runtime (v0.54):
  - every timed region ends with a full device->host readback
    (np.asarray) — on this runtime jax.block_until_ready can return
    before the dispatch finishes, under-reporting by orders of magnitude;
  - all uploads happen before the first dispatch (interleaving transfers
    with large-executable dispatches faults the device);
  - median of 3 warm repetitions.

Context recorded in extra: this tunnel executes large IPM executables at
~20-40 GFLOP/s effective regardless of precision or batch shape (measured
across n=64..2048, f32/f64), orders of magnitude below v5e silicon peak;
absolute numbers reflect the tunnel, not the architecture.  The batched
path (batch.solve_batch) and the n=64/256 shape sweeps live in
benchmarks/dense_bench.py.
"""

import json
import time

import numpy as np

import jax

import piqp_tpu
from piqp_tpu import Settings, Status
from piqp_tpu.api import prepare_data, _solve_fresh
from piqp_tpu.utils.io import load_mat

FIXTURE = "/root/reference/tests/data/chain_mass_sqp.mat"
REPS = 3


def _timed_solve(data, settings):
    t0 = time.perf_counter()
    res, _ = _solve_fresh(data, settings, True)
    np.asarray(res.x)  # completion barrier (see module docstring)
    return time.perf_counter() - t0, res


def main():
    prob = load_mat(FIXTURE)
    settings = Settings(mixed_precision=True)

    data = jax.device_put(prepare_data(**prob))
    jax.block_until_ready(data)

    _, res = _timed_solve(data, settings)  # warmup/compile
    assert int(res.info.status) == Status.SOLVED, int(res.info.status)

    ts = []
    for _ in range(REPS):
        dt, res = _timed_solve(data, settings)
        assert int(res.info.status) == Status.SOLVED
        ts.append(dt)
    dev_t = float(np.median(ts))

    # host sparse backend for context (SuperLU exploits the fixture's
    # sparsity; reported in extra, not the baseline — the baseline is the
    # same dense algorithm on CPU)
    from piqp_tpu.hostsparse import solve_sparse_host
    from piqp_tpu.utils.io import load_mat as _lm
    sp_prob = _lm(FIXTURE, sparse=True)
    t0 = time.perf_counter()
    rh = solve_sparse_host(**sp_prob)
    host_t = time.perf_counter() - t0
    assert rh.info.status == int(Status.SOLVED)

    # sequential CPU dense baseline (same problem, same algorithm, f64)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cdata = jax.device_put(jax.tree.map(np.asarray, data), cpu)
        _, rc = _timed_solve(cdata, Settings())  # warmup/compile
        assert int(rc.info.status) == Status.SOLVED
        cts = []
        for _ in range(2):
            dt, rc = _timed_solve(cdata, Settings())
            assert int(rc.info.status) == Status.SOLVED
            cts.append(dt)
    cpu_t = float(np.median(cts))

    print(
        json.dumps(
            {
                "metric": "sqp_fixture_chain_mass_n1849_solve_latency",
                "value": round(dev_t * 1e3, 1),
                "unit": "ms",
                "vs_baseline": round(cpu_t / dev_t, 3),
                "extra": {
                    "device_mixed_ms": round(dev_t * 1e3, 1),
                    "cpu_dense_f64_ms": round(cpu_t * 1e3, 1),
                    "host_sparse_ms": round(host_t * 1e3, 1),
                    "iters": int(res.info.iter),
                    "eps_abs": 1e-8,
                    "device": str(jax.devices()[0]),
                    "note": "tunnel executes at ~20-40 GFLOP/s effective; "
                            "see module docstring",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
