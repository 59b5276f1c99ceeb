"""Ruiz equilibration tests — mirrors preconditioner_test.cpp: scaling then
unscaling is the identity; scaled matrices are well-equilibrated."""

import jax.numpy as jnp
import numpy as np

from piqp_tpu import prepare_data
from piqp_tpu.ruiz import apply_scaling, equilibrate
from piqp_tpu.utils.random import dense_strongly_convex_qp


def test_scale_unscale_identity():
    prob = dense_strongly_convex_qp(12, 4, 8, seed=9)
    data = prepare_data(**prob)
    scaled, sc = equilibrate(data, max_iter=10)

    dx_inv = 1.0 / np.asarray(sc.d_x)
    c_inv = 1.0 / float(sc.c)

    P_back = c_inv * dx_inv[:, None] * np.asarray(scaled.P) * dx_inv[None, :]
    np.testing.assert_allclose(P_back, np.asarray(data.P), rtol=1e-12)

    A_back = (1.0 / np.asarray(sc.d_y))[:, None] * np.asarray(scaled.A) * dx_inv[None, :]
    np.testing.assert_allclose(A_back, np.asarray(data.A), rtol=1e-12)

    b_back = np.asarray(scaled.b) / np.asarray(sc.d_y)
    np.testing.assert_allclose(b_back, np.asarray(data.b), rtol=1e-12)

    hl_back = np.asarray(scaled.h_l) / np.asarray(sc.d_z)
    np.testing.assert_allclose(hl_back, np.asarray(data.h_l), rtol=1e-12)

    xl_back = np.asarray(scaled.x_l) / np.asarray(sc.d_b)
    np.testing.assert_allclose(xl_back, np.asarray(data.x_l), rtol=1e-12)


def test_equilibrated_norms():
    prob = dense_strongly_convex_qp(20, 5, 10, seed=11)
    # make it badly scaled
    prob["P"] *= 1e4
    prob["A"] *= 1e-3
    data = prepare_data(**prob)
    scaled, _ = equilibrate(data, max_iter=10)

    # KKT column norms should be near 1 after equilibration
    K_cols = np.maximum(
        np.abs(np.asarray(scaled.P)).max(axis=0),
        np.maximum(
            np.abs(np.asarray(scaled.A)).max(axis=0, initial=0),
            np.abs(np.asarray(scaled.G)).max(axis=0, initial=0),
        ),
    )
    assert K_cols.max() < 2.0
    assert K_cols.min() > 0.1


def test_apply_scaling_matches_equilibrate():
    prob = dense_strongly_convex_qp(10, 3, 6, seed=13)
    data = prepare_data(**prob)
    scaled, sc = equilibrate(data, max_iter=10)
    scaled2 = apply_scaling(data, sc)
    for name in ("P", "c", "A", "b", "G", "h_l", "h_u", "x_l", "x_u", "x_b_scaling"):
        np.testing.assert_allclose(
            np.asarray(getattr(scaled2, name)),
            np.asarray(getattr(scaled, name)),
            rtol=1e-12, atol=1e-14, err_msg=name,
        )


def test_masks_preserved():
    prob = dense_strongly_convex_qp(10, 2, 6, seed=17)
    data = prepare_data(**prob)
    scaled, _ = equilibrate(data)
    np.testing.assert_array_equal(np.asarray(scaled.hl_mask), np.asarray(data.hl_mask))
    np.testing.assert_array_equal(np.asarray(scaled.xu_mask), np.asarray(data.xu_mask))
    # inactive entries stay exactly zero
    assert np.all(np.asarray(scaled.h_l)[~np.asarray(data.hl_mask)] == 0)
