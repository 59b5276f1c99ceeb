"""TPU validation battery — run on the real chip after tunnel outages.

Health-checks the device, then exercises every round-2 device-facing
feature once and prints one JSON line per step (timings follow the
tunnel rules from docs/performance.md: readback barriers, fresh process
recommended per heavy config).

Usage:  python benchmarks/tpu_validation.py [step]
        steps: health ldlt pallas diff all   (default: all)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _emit(step, **kw):
    print(json.dumps(dict(step=step, **kw)), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp

    dev = str(jax.devices()[0])

    if which in ("health", "all"):
        t0 = time.perf_counter()
        x = np.asarray(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
        _emit("health", device=dev, ok=bool(x[0, 0] == 256.0),
              s=round(time.perf_counter() - t0, 3))

    from piqp_tpu import Settings, solve_dense
    from piqp_tpu.types import KKTBackend, Status

    if which in ("ldlt", "all"):
        # f64 signed Cholesky on device — the capability LU lacks there
        from piqp_tpu.utils.io import load_mat

        prob = load_mat("/root/reference/tests/data/robot_arm_sqp.mat")
        t0 = time.perf_counter()
        res = solve_dense(
            **prob, settings=Settings(kkt_solver=KKTBackend.dense_ldlt)
        )
        xs = np.asarray(res.x)
        _emit("dense_ldlt_f64_robot_arm", device=dev,
              status=int(res.info.status),
              solved=int(res.info.status) == int(Status.SOLVED),
              iters=int(res.info.iter),
              s=round(time.perf_counter() - t0, 2))

    if which in ("pallas", "all"):
        # batched signed Pallas kernel, compiled Mosaic f32
        from piqp_tpu.ops.pallas_chol import (
            signed_cholesky_with_inverse, signed_inv_solve,
        )

        rng = np.random.default_rng(0)
        N, npos, B = 128, 80, 16
        Ks = []
        for _ in range(B):
            Mp = rng.standard_normal((npos, npos))
            Mn = rng.standard_normal((N - npos, N - npos))
            Bc = rng.standard_normal((N - npos, npos))
            K = np.block([
                [Mp @ Mp.T + npos * np.eye(npos), Bc.T],
                [Bc, -(Mn @ Mn.T + (N - npos) * np.eye(N - npos))],
            ])
            Ks.append(K)
        Ks = jnp.asarray(np.stack(Ks), jnp.float32)
        s = jnp.asarray(
            np.concatenate([np.ones(npos), -np.ones(N - npos)]), jnp.float32
        )
        bvec = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
        t0 = time.perf_counter()
        L, Linv = jax.vmap(lambda K: signed_cholesky_with_inverse(K, s))(Ks)
        x = jax.vmap(lambda li, b: signed_inv_solve(li, s, b))(Linv, bvec)
        xs = np.asarray(x)
        resid = float(np.max(np.abs(
            np.einsum("bij,bj->bi", np.asarray(Ks), xs) - np.asarray(bvec)
        )))
        _emit("pallas_signed_chol_f32", device=dev, max_residual=resid,
              ok=resid < 1e-2, s=round(time.perf_counter() - t0, 2))

    if which in ("diff", "all"):
        import jax as _jax

        from piqp_tpu import qp_layer

        P = np.array([[6.0, 0.0], [0.0, 4.0]])
        c = np.array([-1.0, -4.0])
        t0 = time.perf_counter()
        solve, data = qp_layer(
            P, c, A=np.array([[1.0, -2.0]]), b=np.array([0.0])
        )
        g = _jax.grad(lambda d: solve(d).sum(), allow_int=True)(data)
        gc = np.asarray(g.c)
        _emit("diff_layer", device=dev, grad_c=[round(float(v), 4) for v in gc],
              ok=bool(abs(gc[0] + 0.2143) < 1e-3),
              s=round(time.perf_counter() - t0, 2))


if __name__ == "__main__":
    main()
