"""In-graph kernel rates on the accelerator (dispatch overhead removed).

The tunneled runtime charges a large per-dispatch cost (docs/performance.md),
so wall-clock kernel timings conflate the chip with the transport.  This
harness loops each kernel k times INSIDE one jitted executable with a data
dependence between iterations, times the same executable at two k values,
and differences them: (t_hi - t_lo) / (k_hi - k_lo) is the marginal
in-graph cost of one kernel execution — the closest observable to the
chip's own rate through this tunnel.

Kernels:
  - xla_chol:   jnp.linalg.cholesky on a (B, n, n) SPD batch
  - pallas:     ops/pallas_chol.cholesky_with_inverse (factor + fused L^-1;
                nominal flops counted as factor-only, so its GFLOP/s is
                an UNDERestimate)
  - matmul:     batched (B,n,n) @ (B,n,n) — the MXU reference point

Usage: python benchmarks/kernel_roofline.py [f32|f64]
Prints one JSON line per (kernel, B, n).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from piqp_tpu.ops.pallas_chol import cholesky_with_inverse
from piqp_tpu.ops import ldlt

K_LO, K_HI = 4, 32


def _spd_batch(B, n, dtype):
    rng = np.random.default_rng(7)
    A = rng.standard_normal((B, n, n))
    K = A @ np.swapaxes(A, 1, 2) + n * np.eye(n)
    return jnp.asarray(K, dtype=dtype)


def _looped(fn, k):
    """k data-dependent executions of fn inside one executable."""

    def run(K):
        def body(i, c):
            # keep SPD: a vanishing multiple of the previous output feeds
            # the next input, forcing sequential execution without
            # changing what the kernel computes
            return fn(K + 1e-30 * c)

        return lax.fori_loop(0, k, body, K)

    return jax.jit(run)


def _time(g, K, reps=3):
    r = g(K)
    np.asarray(r)  # warm + readback barrier
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(g(K))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(name, fn, B, n, dtype, flops_per_exec):
    K = _spd_batch(B, n, dtype)
    t_lo = _time(_looped(fn, K_LO), K)
    t_hi = _time(_looped(fn, K_HI), K)
    per_exec = max((t_hi - t_lo) / (K_HI - K_LO), 1e-12)
    print(json.dumps(dict(
        kernel=name, B=B, n=n, dtype=str(jnp.dtype(dtype).name),
        in_graph_ms=round(per_exec * 1e3, 3),
        us_per_problem=round(per_exec / B * 1e6, 2),
        gflops=round(flops_per_exec / per_exec / 1e9, 1),
        dispatch_floor_ms=round(
            (t_lo - K_LO * per_exec) / 1.0 * 1e3, 1),
        device=str(jax.devices()[0]),
    )), flush=True)


def main():
    dtype = jnp.float64 if (len(sys.argv) > 1 and sys.argv[1] == "f64") \
        else jnp.float32

    def pallas_L(K):
        # cholesky_with_inverse is a custom_vmap: the Pallas kernel engages
        # under vmap (the fleet regime), matching the production call path
        return jax.vmap(cholesky_with_inverse)(K)[0]

    def rank1_chol_L(K):
        # ops/ldlt.py blocked signed Cholesky with all-positive signs =
        # plain Cholesky built from rank-1 VPU updates + MXU GEMMs only —
        # no lax.linalg.cholesky, which is the op whose f64 lowering is
        # pathologically slow on this TPU runtime (see results)
        n = K.shape[-1]
        signs = jnp.ones((n,), K.dtype)
        return jax.vmap(lambda k: ldlt.signed_cholesky(k, signs)[0])(K)

    def trisolve(K):
        # L x = b batched; measures lax.linalg.triangular_solve in-graph
        b = K[..., :1]
        L = jnp.tril(K)
        y = lax.linalg.triangular_solve(L, b, left_side=True, lower=True)
        return K + 1e-30 * y  # keep carry shape

    for B, n in ((256, 64), (32, 256)):
        chol_flops = B * n ** 3 / 3
        mm_flops = B * 2 * n ** 3
        measure("xla_chol", jnp.linalg.cholesky, B, n, dtype, chol_flops)
        measure("rank1_chol", rank1_chol_L, B, n, dtype, chol_flops)
        measure("trisolve", trisolve, B, n, dtype, B * n ** 2)
        if dtype == jnp.float32:  # compiled Mosaic path is f32-native
            measure("pallas_cholinv", pallas_L, B, n, dtype, chol_flops)
        measure("matmul", lambda K: K @ K, B, n, dtype, mm_flops)


if __name__ == "__main__":
    main()
