"""Batched scenario solving: a fleet of perturbed QPs solved in one
vmapped dispatch, optionally sharded over all available devices
(the scenario-MPC / portfolio-sweep usage pattern).

Run: python examples/batch_example.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from piqp_tpu import Settings
from piqp_tpu.batch import prepare_batch, solve_batch
from piqp_tpu.utils.random import dense_strongly_convex_qp


def main():
    B = 64
    base = dense_strongly_convex_qp(32, 8, 16, seed=0)
    rng = np.random.default_rng(1)
    scenarios = []
    for _ in range(B):
        s = dict(base)
        s["c"] = base["c"] + 0.1 * rng.standard_normal(base["c"].shape)
        scenarios.append(s)

    data = prepare_batch(scenarios)

    # optional: shard the batch over every device (no-op on one device)
    devs = jax.devices()
    sharding = None
    if len(devs) > 1 and B % len(devs) == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(devs), ("dp",))
        sharding = NamedSharding(mesh, P("dp"))

    res = solve_batch(data, Settings(), sharding=sharding)
    status = np.asarray(res.info.status)
    iters = np.asarray(res.info.iter)
    objs = np.asarray(res.info.primal_obj)
    print(f"{int((status == 1).sum())}/{B} solved on {len(devs)} device(s); "
          f"iters: mean {iters.mean():.1f} max {iters.max()}")
    print(f"objective spread: [{objs.min():.4f}, {objs.max():.4f}]")

    # lockstep batches pay the max iteration count; two-phase straggler
    # compaction removes the waste at identical tolerances
    # (docs/batching.md)
    from piqp_tpu.batch import solve_batch_compact

    res_c = solve_batch_compact(data, Settings(), phase1_iters=int(np.median(iters)) + 1)
    assert np.array_equal(np.asarray(res_c.info.status), status)
    print(f"compacted: {int((np.asarray(res_c.info.status) == 1).sum())}/{B} "
          f"solved, same tolerances, max lockstep depth "
          f"{int(np.median(iters)) + 1} instead of {iters.max()}")


if __name__ == "__main__":
    main()
