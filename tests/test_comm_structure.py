"""Communication-structure assertions on the compiled sharded executables.

The horizon-sharded factorization's claim (docs/multistage.md, README):
cross-chip traffic is a partitioned-Schur exchange whose VOLUME AND COUNT
are independent of the horizon length T — stages scale, communication
doesn't.  Rather than timing a virtual mesh (meaningless on one core),
these tests inspect the compiled HLO and count collective ops: the count
must not grow with T, and the pure-batch (dp) executable must contain no
collectives at all beyond result reductions.

(The single-process analog of the reference's "allocation-free hot loop"
guarantee — a structural property checked at compile time, not a timing.)
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from piqp_tpu import Settings
from piqp_tpu import multistage as ms
from piqp_tpu.parallel import shard_horizon
from piqp_tpu.parallel.horizon import _solve_sharded_jit

_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|collective-permute|all-to-all|reduce-scatter)\b"
)


def _collective_count(hlo_text: str) -> int:
    # count op INSTANCES (lines defining a collective op), not mentions
    n = 0
    for line in hlo_text.splitlines():
        if "=" in line and _COLLECTIVE_RE.search(line.split("=", 1)[1][:80]):
            n += 1
    return n


def _sharded_hlo(T: int, ndev: int = 8) -> str:
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("sp",))
    sdata = ms.random_multistage_qp(T=T, D=4, Da=2, ra=2, rg=2, seed=0)
    sh = shard_horizon(sdata, mesh, "sp")
    settings = Settings()
    with mesh:
        lowered = _solve_sharded_jit.lower(sh, settings, True, None)
        return lowered.compile().as_text()


@pytest.mark.parametrize("ndev", [8])
def test_horizon_shard_collectives_independent_of_T(ndev):
    counts = {}
    for T in (16, 32, 64):
        counts[T] = _collective_count(_sharded_hlo(T, ndev))
    assert counts[16] > 0, "sharded solve must actually communicate"
    assert counts[16] == counts[32] == counts[64], (
        f"collective count must not grow with the horizon: {counts}"
    )


def test_batch_sharding_moves_no_data():
    """Data-parallel fleets are embarrassingly parallel: every collective
    in the dp-sharded vmapped solve is a scalar pred[] all-reduce (the
    lockstep while_loop's global termination predicate) — zero cross-chip
    DATA movement; each problem lives on one chip end to end."""
    from functools import partial

    from piqp_tpu import ruiz, solver
    from piqp_tpu.batch import prepare_batch
    from piqp_tpu.utils.random import dense_strongly_convex_qp

    ndev = 8
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("dp",))
    data = prepare_batch(
        [dense_strongly_convex_qp(12, 4, 6, seed=i) for i in range(ndev)]
    )

    def shard_leaf(x):
        return jax.device_put(
            x, NamedSharding(mesh, PS("dp", *([None] * (x.ndim - 1))))
        )

    data = jax.tree.map(shard_leaf, data)
    settings = Settings()

    def batched(d):
        def one(di):
            sdata, sc = ruiz.equilibrate(
                di, max_iter=settings.preconditioner_iter,
                scale_cost=settings.preconditioner_scale_cost,
            )
            return solver.solve_scaled(sdata, sc, settings, True)

        return jax.vmap(one)(d)

    with mesh:
        hlo = jax.jit(batched).lower(data).compile().as_text()
    data_moving = []
    for line in hlo.splitlines():
        if "=" not in line:
            continue
        rhs = line.split("=", 1)[1]
        if _COLLECTIVE_RE.search(rhs[:80]) and "pred[] all-reduce" not in rhs:
            data_moving.append(line.strip()[:120])
    assert not data_moving, (
        "dp fleet must move no data across chips:\n" + "\n".join(data_moving)
    )
