"""Benchmark driver: batched dense QP throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement (BASELINE.md config 2): a batch of dense strongly convex QPs
(n=64, p=16, m=32) solved to eps_abs=1e-8 with the vmapped solver on the
default device (TPU when present).

Baseline (vs_baseline denominator): the same problems solved one-at-a-time
on the host CPU backend — a fair stand-in for the reference's single-core
Eigen/C++ solve (the reference repo publishes no absolute numbers;
BASELINE.md records `published: {}`), since XLA-CPU dense Cholesky runs at
Eigen-class speed.  vs_baseline therefore reports the aggregate-throughput
multiple the TPU framework delivers over a sequential CPU solve of the same
algorithm.

Batch size note: the tunneled TPU runtime in this environment (axon PJRT
plugin v0.54) reproducibly faults when host->device transfers interleave
with dispatches of the large IPM executable, or when a single f64 dispatch
exceeds ~256 problems of this size (batch 512+, n=64 faults even as the
first dispatch; batch 256 is solid).  The bench therefore uses the proven
pattern — upload once, then warmup + timed dispatches back-to-back at
BATCH=256.  Throughput is compute-bound and flat in batch size from ~128
up, so the metric is representative of larger fleets.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import piqp_tpu
from piqp_tpu import Settings
from piqp_tpu.batch import _solve_batch_jit, prepare_batch
from piqp_tpu.utils.random import dense_strongly_convex_qp

BATCH = 256
N, P, M = 64, 16, 32
CPU_SAMPLE = 8  # problems for the sequential CPU baseline


def make_batch(batch, start_seed=0):
    return prepare_batch(
        [
            dense_strongly_convex_qp(N, P, M, seed=start_seed + i)
            for i in range(batch)
        ]
    )


def main():
    settings = Settings()

    # --- accelerator sustained batched throughput: several distinct
    # pre-uploaded batches dispatched back-to-back (the serving pattern —
    # keep the device fed).  A single blocking dispatch under-reports by
    # the ~0.5 ms host dispatch latency, which at ~0.35 ms/batch of
    # compute would halve the number.  All uploads happen before the
    # first dispatch (the tunnel faults when transfers interleave with
    # large-executable dispatches, see module docstring).
    NB = 4
    batches = [
        jax.device_put(make_batch(BATCH, start_seed=1000 * b))
        for b in range(NB)
    ]
    jax.block_until_ready(batches)

    res = _solve_batch_jit(batches[0], settings, True)  # warmup/compile
    jax.block_until_ready(res)

    t0 = time.perf_counter()
    outs = [_solve_batch_jit(b, settings, True) for b in batches]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    throughput = NB * BATCH / dt
    n_solved = sum(int(jnp.sum(o.info.status == 1)) for o in outs)
    data = batches[0]

    # --- sequential CPU baseline (single problem at a time)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        small = [
            jax.device_put(jax.tree.map(lambda x: x[i], data), cpu)
            for i in range(CPU_SAMPLE)
        ]
        from piqp_tpu.api import _solve_fresh

        r, _ = _solve_fresh(small[0], settings, True)  # warmup/compile
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for d in small:
            r, _ = _solve_fresh(d, settings, True)
            jax.block_until_ready(r)
        cpu_dt = time.perf_counter() - t0
    cpu_throughput = CPU_SAMPLE / cpu_dt

    print(
        json.dumps(
            {
                "metric": f"batched_dense_qp_throughput_b{BATCH}_n{N}",
                "value": round(throughput, 2),
                "unit": "solves/s",
                "vs_baseline": round(throughput / cpu_throughput, 3),
                "extra": {
                    "solved": n_solved,
                    "batch": BATCH,
                    "batches": 4,
                    "n": N,
                    "cpu_sequential_solves_per_s": round(cpu_throughput, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
