"""Differentiable-MPC example: tune a controller's cost weights by
gradient descent THROUGH the QP solver.

A condensed finite-horizon LQR-with-constraints problem is solved as a
dense QP; the loss is the closed-form tracking error of the resulting
trajectory against an expert trajectory.  `piqp_tpu.solve_qp_diff` makes
the argmin differentiable (implicit differentiation of the KKT system,
docs/differentiation.md), so `jax.grad` reaches the cost weights — the
learned-MPC / inverse-optimal-control pattern, impossible with the C++
reference.

Run: python examples/diff_mpc_example.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from piqp_tpu import Settings, prepare_data, solve_qp_diff

# double integrator, condensed over the horizon: decision vars = controls
T = 16
dt = 0.1
A_dyn = np.array([[1.0, dt], [0.0, 1.0]])
B_dyn = np.array([[0.5 * dt**2], [dt]])
x0 = np.array([1.0, 0.0])

# x_t = A^t x0 + sum_k A^(t-1-k) B u_k  ->  X = F x0 + G U
F = np.zeros((2 * T, 2))
Gm = np.zeros((2 * T, T))
Ak = np.eye(2)
for t in range(T):
    Ak = Ak @ A_dyn
    F[2 * t : 2 * t + 2] = Ak
    Aj = np.eye(2)
    for k in range(t, -1, -1):
        Gm[2 * t : 2 * t + 2, k : k + 1] = Aj @ B_dyn
        Aj = Aj @ A_dyn

u_max = 2.0
TIGHT = Settings(eps_abs=1e-11, eps_rel=1e-12)


def qp_of_weights(q_pos, q_vel, r):
    """Condensed QP in U: min 0.5 U'(G'QG + R)U + (F x0)'QG U, |U| <= u_max."""
    Q = jnp.kron(jnp.eye(T), jnp.diag(jnp.array([q_pos, q_vel])))
    P = Gm.T @ Q @ Gm + r * jnp.eye(T)
    c = Gm.T @ Q @ (F @ x0)
    return P, c


# expert: weights (25, 2, 0.05); learner starts at (5, 5, 0.5)
def controls(q_pos, q_vel, r, data_template):
    P, c = qp_of_weights(q_pos, q_vel, r)
    d = dataclasses.replace(data_template, P=P, c=c)
    return solve_qp_diff(d, TIGHT, True).x


def main():
    P0, c0 = qp_of_weights(5.0, 5.0, 0.5)
    data = prepare_data(
        np.asarray(P0), np.asarray(c0),
        x_l=-u_max * np.ones(T), x_u=u_max * np.ones(T),
    )

    u_expert = controls(25.0, 2.0, 0.05, data)
    x_expert = jnp.asarray(Gm) @ u_expert + jnp.asarray(F @ x0)

    def loss(theta):
        u = controls(jnp.exp(theta[0]), jnp.exp(theta[1]), jnp.exp(theta[2]), data)
        x = jnp.asarray(Gm) @ u + jnp.asarray(F @ x0)
        return jnp.mean((x - x_expert) ** 2) + 1e-3 * jnp.mean((u - u_expert) ** 2)

    import optax

    # NOTE: the weights are identifiable only up to a joint scale (scaling
    # (q_pos, q_vel, r) together leaves the argmin unchanged), so the check
    # is behavioral — the learned controller reproduces the expert
    # trajectory — not weight recovery.
    theta = jnp.log(jnp.array([5.0, 5.0, 0.5]))
    opt = optax.adam(0.15)
    state = opt.init(theta)
    vg = jax.jit(jax.value_and_grad(loss))
    print("step  loss        weights (q_pos, q_vel, r)")
    for it in range(120):
        val, g = vg(theta)
        upd, state = opt.update(g, state)
        theta = theta + upd
        if it % 15 == 0 or it == 119:
            w = np.exp(np.asarray(theta))
            print(f"{it:4d}  {float(val):.3e}  {w.round(3)}")

    final = float(vg(theta)[0])
    assert final < 1e-6, final
    print("recovered expert behavior through the solver: loss", final)


def structured():
    """Part 2 — the same pattern through the STRUCTURED backend: gradients
    land directly on the stage-cost blocks Pd of a multistage QP, and the
    adjoint solve reuses the block-tridiagonal factorization (O(T) backward;
    docs/differentiation.md)."""
    from piqp_tpu import multistage as ms
    from piqp_tpu import solve_qp_diff

    sdata = ms.random_multistage_qp(T=8, D=3, Da=2, ra=1, rg=2, seed=0)
    target = jnp.ones(sdata.c.shape[0])

    def loss(Pd_scale):
        d = dataclasses.replace(sdata, Pd=sdata.Pd * Pd_scale)
        x = solve_qp_diff(d, TIGHT_S, True).x
        return jnp.mean((x - 0.05 * target) ** 2)

    g = jax.grad(loss)(1.0)
    print(f"structured: dL/d(stage-cost scale) = {float(g):+.4f} "
          f"(adjoint via the block-tridiagonal factorization)")
    assert np.isfinite(float(g))


TIGHT_S = Settings(eps_abs=1e-11, eps_rel=1e-12)

if __name__ == "__main__":
    main()
    structured()
