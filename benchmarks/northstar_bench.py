"""North-star metric (BASELINE config 2): aggregate QP-solves/sec for 1024
dense strongly-convex QPs, solved batched (vmap) on the accelerator, versus
the single-core reference solver on identical problem data.

Usage:  python benchmarks/northstar_bench.py <dim> [B] [chunk] [mixed] [pallas]

Runs ONE config and prints one JSON line — the caller (bench.py) runs each
config in a fresh subprocess because the tunneled axon runtime degrades
per-process as executables accumulate.

Problem data: piqp_tpu.utils.random.dense_strongly_convex_qp with
n_eq = n_ineq = dim/2, seeds 1000..1000+B-1 — byte-identical to what
benchmarks/make_batch.py feeds the reference driver (ref_driver.cpp).

Tunnel timing rules (see docs/performance.md):
  - all host->device uploads happen BEFORE the first dispatch (interleaving
    transfers with large-executable dispatches faults the device);
  - every timed region ends with a device->host readback (np.asarray) —
    block_until_ready can return early on this runtime;
  - dispatches are chunked (default 256/chunk) to stay inside the
    per-dispatch envelope.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from piqp_tpu import Settings
from piqp_tpu.batch import _solve_batch_jit, prepare_batch, warm_from_result
from benchmarks.make_batch import batch_problems


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    mixed = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
    pallas = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
    # opt-in experiment knob: Gondzio centrality correctors trade extra KKT
    # solves per iteration for fewer iterations
    import os
    gondzio = int(os.environ.get("PIQP_NS_GONDZIO", "0"))
    # experiment knob for the phase-A refinement policy (types.Settings.
    # refine_static_passes; "d" = the dataclass default)
    rsp = os.environ.get("PIQP_NS_STATIC_PASSES", "d")

    kw = {}
    if rsp != "d":
        kw["refine_static_passes"] = int(rsp)
    settings = Settings(mixed_precision=mixed, pallas_kernels=pallas,
                        centrality_correctors=gondzio, **kw)
    problems = batch_problems(dim, B)

    # stack on host, then upload all chunks (and the perturbed-c warm
    # copies) before any dispatch
    bdata = prepare_batch(problems)
    chunks = [
        jax.device_put(jax.tree.map(lambda x: x[s:s + chunk], bdata))
        for s in range(0, B, chunk)
    ]
    warm_chunks = [
        jax.device_put(d.replace(c=d.c * 1.01)) for d in chunks
    ]
    for d in chunks + warm_chunks:
        jax.block_until_ready(d)

    # warmup/compile on the first chunk (both cold and warm executables),
    # completion via readback
    res = _solve_batch_jit(chunks[0], settings, True)
    np.asarray(res.x)
    res_w = _solve_batch_jit(chunks[0], settings, True, warm_from_result(res))
    np.asarray(res_w.x)

    def sweep(datas, warms=None):
        t0 = time.perf_counter()
        if warms is None:
            outs = [_solve_batch_jit(d, settings, True) for d in datas]
        else:
            outs = [
                _solve_batch_jit(d, settings, True, w)
                for d, w in zip(datas, warms)
            ]
        for r in outs:
            np.asarray(r.x)  # readback barrier
        dt = time.perf_counter() - t0
        solved = sum(int(jnp.sum(r.info.status == 1)) for r in outs)
        iters = max(int(jnp.max(r.info.iter)) for r in outs)
        return dt, solved, iters, outs

    cold_dt, cold_solved, iters, cold_outs = sweep(chunks)
    # warm re-solves: perturbed problems seeded from the cold iterates (the
    # MPC/SQP pattern; the reference's warm pass is update+solve, which is
    # as warm as it gets — it has no warm-start API)
    warms = [warm_from_result(r) for r in cold_outs]
    for w in warms:
        jax.block_until_ready(w)

    # straggler compaction across ALL chunks (piqp_tpu.batch
    # solve_batch_compact's pattern, hoisted to the sweep level so phase 1
    # dispatches back-to-back and phase 2 is ONE small dispatch): on this
    # workload 99% of warm problems converge in 3 iterations while a
    # lockstep chunk pays the max (9) — measured 1.4x on XLA-CPU, more
    # where dispatch latency is lower (docs/batching.md).
    import dataclasses

    from piqp_tpu.types import Status

    def sweep_warm_compact(phase1=4):
        s1 = dataclasses.replace(settings, max_iter=phase1)
        t0 = time.perf_counter()
        outs = [
            _solve_batch_jit(d, s1, True, w)
            for d, w in zip(warm_chunks, warms)
        ]
        status = np.concatenate([np.asarray(r.info.status) for r in outs])
        solved = int(np.sum(status == 1))
        iters2 = phase1
        n_strag = 0
        if np.any(status == int(Status.MAX_ITER_REACHED)):
            idx = np.nonzero(status == int(Status.MAX_ITER_REACHED))[0]
            n_strag = int(idx.size)
            slots = 1 << max(0, int(idx.size - 1)).bit_length()
            pad = np.concatenate([idx, np.full(slots - idx.size, idx[0])])
            gi = jnp.asarray(pad)

            full = jax.tree.map(lambda *xs: jnp.concatenate(xs), *warm_chunks)
            wfull = jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs)
            gdata = jax.tree.map(lambda x: x[gi], full)
            gwarm = warm_from_result(jax.tree.map(lambda x: x[gi], wfull))
            res2 = _solve_batch_jit(gdata, settings, True, gwarm)
            st2 = np.asarray(res2.info.status)[: idx.size]
            solved += int(np.sum(st2 == 1))
            iters2 = phase1 + slots / B * int(jnp.max(res2.info.iter))
        dt = time.perf_counter() - t0
        return dt, solved, iters2, n_strag

    # self-tune the phase-1 budget: one untimed full-budget warm solve of
    # the first chunk gives the per-problem iteration distribution; set
    # phase1 at the 95th percentile so ~5% become stragglers (mixed
    # precision shifts the distribution up — a fixed constant misfires)
    probe = _solve_batch_jit(warm_chunks[0], settings, True, warms[0])
    probe_iters = np.asarray(probe.info.iter)
    phase1 = int(np.clip(np.percentile(probe_iters, 95) + 1, 3, 16))

    # warmup the phase-1/phase-2 executables once, untimed
    sweep_warm_compact(phase1)
    warm_dt, warm_solved, warm_iters, n_strag = sweep_warm_compact(phase1)
    warm_dt2, ws2, wi2, ns2 = sweep_warm_compact(phase1)
    if warm_dt2 < warm_dt:
        warm_dt, warm_solved, warm_iters, n_strag = warm_dt2, ws2, wi2, ns2

    # plain warm sweep (full budget, no compaction): on a dispatch-latency-
    # dominated runtime the extra phase-2 dispatch can cost more than the
    # lockstep straggler iterations it saves; measure both, report the
    # better (identical tolerances — only the dispatch structure differs)
    plain_dt, plain_solved, plain_iters, _ = sweep(warm_chunks, warms)
    plain_dt2, ps2, pi2, _ = sweep(warm_chunks, warms)
    if plain_dt2 < plain_dt:
        plain_dt, plain_solved, plain_iters = plain_dt2, ps2, pi2
    compacted = warm_dt <= plain_dt
    # keep the two iteration-count semantics apart: compact_warm_iters is
    # the compaction-blended per-problem estimate, plain_warm_iters is the
    # plain sweep's lockstep max.  warm_max_iters reports the winner's
    # count; phase1/stragglers only describe the compacted run.
    compact_warm_iters = float(warm_iters)
    if not compacted:
        warm_dt, warm_solved, warm_iters = plain_dt, plain_solved, plain_iters
        n_strag = None
        phase1 = None

    # Analytic per-problem-per-IPM-iteration flop estimate for the condensed
    # dense path (factor n^3/3 + ~2 refined triangular-solve pairs at 2n^2
    # each + condensation/residual matvecs ~6n^2): a lower bound on useful
    # flops, used to turn wall time into an effective-GFLOP/s figure that
    # separates the runtime's ceiling from the architecture.  The lockstep
    # batch executes every problem for the chunk's max iteration count;
    # with compaction that is phase1 + (slots/B) * phase-2 iters, which is
    # what sweep_warm_compact returns as the effective per-problem count.
    n = dim
    flops_per_iter = n ** 3 / 3 + 14.0 * n ** 2
    total_flops = B * warm_iters * flops_per_iter
    eff_gflops = total_flops / warm_dt / 1e9

    print(json.dumps(dict(
        dim=dim, B=B, chunk=chunk, mixed=mixed, pallas=pallas,
        device=str(jax.devices()[0]),
        cold_s=round(cold_dt, 4), warm_s=round(warm_dt, 4),
        cold_qps_per_s=round(B / cold_dt, 1),
        warm_qps_per_s=round(B / warm_dt, 1),
        solved=cold_solved, warm_solved=warm_solved,
        max_iters=iters, warm_max_iters=round(float(warm_iters), 2),
        compact_warm_iters=round(compact_warm_iters, 2),
        plain_warm_iters=plain_iters,
        compaction=bool(compacted), stragglers=n_strag, phase1=phase1,
        plain_warm_qps_per_s=round(B / plain_dt, 1),
        eff_gflops=round(eff_gflops, 2),
        iter_us_per_problem=round(warm_dt / (B * warm_iters) * 1e6, 2),
    )))


if __name__ == "__main__":
    main()
