"""Model-predictive control example: a double-integrator tracking problem
built directly as stage blocks, solved with the multistage backend, then
re-solved in a warm loop as the reference trajectory shifts (the SQP/MPC
usage pattern, reference docs/_pages/multistage.md).

Run: python examples/mpc_example.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import piqp_tpu
from piqp_tpu import Status, solve_prepared
from piqp_tpu import multistage as ms

# double integrator: state (pos, vel), control accel; stage var = (x, u)
T = 32          # horizon
dt = 0.1
D = 3           # per-stage variables: pos, vel, accel

A_dyn = np.array([[1.0, dt], [0.0, 1.0]])
B_dyn = np.array([[0.5 * dt**2], [dt]])

Q = np.diag([10.0, 1.0])
R = np.array([[0.1]])


def build(x_ref):
    # quadratic cost per stage: (x - x_ref)' Q (x - x_ref) + u' R u
    Pd = np.zeros((T, D, D))
    Pd[:, :2, :2] = Q
    Pd[:, 2:, 2:] = R
    c = np.zeros((T, D))
    c[:, :2] = -Q @ x_ref
    # dynamics: x_{t+1} = A x_t + B u_t  ->  [A B] z_t - [I 0] z_{t+1} = 0
    A1 = np.zeros((T, 2, D))
    A1[:, :, :2] = A_dyn
    A1[:, :, 2:] = B_dyn
    A2 = np.zeros((T, 2, D))
    A2[:, :, :2] = -np.eye(2)
    A2[T - 1] = 0.0  # no successor for the last stage
    b = np.zeros((T, 2))
    # initial condition via the first stage's bounds
    x_l = np.full(T * D, -np.inf)
    x_u = np.full(T * D, np.inf)
    x0 = np.array([1.0, 0.0])
    x_l[0:2] = x_u[0:2] = x0
    # control limits
    x_l[2::D] = -2.0
    x_u[2::D] = 2.0
    return ms.from_stage_blocks(
        Pd, None, None, None, c.reshape(-1),
        A1=A1, A2=A2, Ag=None, b=b.reshape(-1),
        x_l=x_l, x_u=x_u,
    )


def main():
    x_ref = np.zeros(2)  # drive to the origin
    sdata = build(x_ref)
    res = solve_prepared(sdata)
    assert int(res.info.status) == Status.SOLVED
    xs = np.asarray(res.x)[: T * sdata.D].reshape(T, sdata.D)
    print(f"solved in {int(res.info.iter)} iterations")
    print("positions:", np.round(xs[:8, 0], 3), "...")
    print("controls: ", np.round(xs[:8, 2], 3), "...")

    # warm MPC loop: shift the reference, re-solve seeded from the previous
    # iterates (compiled solve reused; warm start cuts the iteration count)
    for k in range(3):
        x_ref = x_ref + np.array([0.1, 0.0])
        res = solve_prepared(build(x_ref), warm=res)
        print(f"step {k}: status={int(res.info.status)} "
              f"iters={int(res.info.iter)} (warm-started)")


if __name__ == "__main__":
    main()
