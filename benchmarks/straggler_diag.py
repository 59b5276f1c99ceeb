"""Diagnose the B=1024 cold stragglers (docs/performance.md round 5).

After the f32-matvec phase A, 2 of the 1024 north-star problems stopped
converging cold ON THE TPU (the identical batch solves clean on XLA-CPU),
and the phase-A patience guard did not rescue them — so the plateau is
either not in phase A or not caught by the no-progress counters.  This
script isolates them and solves just those problems under a config
matrix, printing final (status, iter, mu, residuals) per config.

Usage: python benchmarks/straggler_diag.py [B] [dim]
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

from piqp_tpu import Settings
from piqp_tpu.batch import _solve_batch_jit, prepare_batch
from benchmarks.make_batch import batch_problems


def report(label, res, idx=None):
    st = np.asarray(res.info.status)
    it = np.asarray(res.info.iter)
    mu = np.asarray(res.info.mu)
    pr = np.asarray(res.info.primal_res)
    dr = np.asarray(res.info.dual_res)
    print(json.dumps(dict(
        config=label,
        idx=(idx.tolist() if idx is not None else None),
        status=st.tolist(), iters=it.tolist(),
        mu=[float(f"{v:.3e}") for v in mu],
        primal_res=[float(f"{v:.3e}") for v in pr],
        dual_res=[float(f"{v:.3e}") for v in dr],
    )), flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    base = Settings(mixed_precision=True, pallas_kernels=True)
    bdata = prepare_batch(batch_problems(dim, B))
    jax.block_until_ready(bdata)

    # find the stragglers with the current default config
    res = _solve_batch_jit(bdata, base, True)
    st = np.asarray(res.info.status)
    bad = np.nonzero(st != 1)[0]
    print(json.dumps(dict(config="find", B=B, unsolved=bad.tolist(),
                          statuses=st[bad].tolist(),
                          iters=np.asarray(res.info.iter)[bad].tolist(),
                          mu=[float(f"{v:.3e}")
                              for v in np.asarray(res.info.mu)[bad]])),
          flush=True)
    if bad.size == 0:
        print(json.dumps(dict(config="summary", verdict="no stragglers")))
        return

    # pad the straggler set to a stable small batch
    idx = np.concatenate([bad, np.full(max(0, 4 - bad.size), bad[0])])[:4]
    gi = jnp.asarray(idx)
    gdata = jax.tree.map(lambda x: x[gi], bdata)
    jax.block_until_ready(gdata)

    configs = [
        ("mixed_default", base),
        ("mixed_adaptive_refine",
         dataclasses.replace(base, refine_static_passes=-1)),
        ("mixed_no_patience",
         dataclasses.replace(base, mixed_phase_a_patience=0)),
        ("mixed_early_switch",
         dataclasses.replace(base, mixed_precision_mu_switch=1e-3)),
        ("f64_pure",
         dataclasses.replace(base, mixed_precision=False)),
        ("mixed_no_pallas",
         dataclasses.replace(base, pallas_kernels=False)),
    ]
    for label, s in configs:
        t0 = time.perf_counter()
        r = _solve_batch_jit(gdata, s, True)
        jax.block_until_ready(r.x)
        report(f"{label} ({time.perf_counter() - t0:.1f}s)", r, idx)


if __name__ == "__main__":
    main()
