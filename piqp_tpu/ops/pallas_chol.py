"""Pallas TPU kernel: batched Cholesky factorization with fused triangular
inverse.

This is the TPU-native replacement for the reference's blocked dense
LDL^T/LLT kernel (/root/reference/include/piqp/dense/ldlt_no_pivot.hpp:
279-354 — unblocked kernel + blocked driver) in the regime the north star
targets: a *vmapped fleet* of small/medium condensed KKT systems
(n = 16..256, B = hundreds..thousands), where the per-IPM-iteration cost is
one batched factorization plus several batched triangular solves.

Design (TPU-first, not a port):

- One pallas_call grid instance factors a tile of ``TB`` problems held
  entirely in VMEM, vectorizing every step ACROSS the batch tile: step j
  performs a masked rank-1 update of the (TB, n, n) workspace on the VPU.
  There is no panel/block decomposition — for n <= 256 the whole matrix
  tile sits in VMEM, so the blocked structure of the CPU kernel (which
  exists to keep panels in L1/L2 cache) is unnecessary.

- The kernel *fuses the triangular inverse* into the factor loop: at step
  j, row j of L^-1 is produced by forward substitution against rows < j
  (one batched matvec on the MXU).  Every subsequent triangular solve
  becomes a pair of batched GEMMs (x = L^-T (L^-1 b)) — MXU work with no
  sequential dependence — instead of a latency-bound substitution sweep.
  This trades the substitution's backward stability for MXU throughput;
  the solver's always-on iterative refinement (kkt.py
  _solve_condensed_refined) recovers the accuracy, exactly as it does for
  the f32 mixed-precision factors this path is designed for.

- Interpreter mode runs the identical kernel on CPU (tests, virtual-mesh
  dryruns); compiled Mosaic runs on TPU.  f64 is supported in interpreter
  mode only (TPU Mosaic is f32-native) — the device path is the
  mixed-precision f32 route, which is where the MXU speed lives.

Exposed as ``cholesky_with_inverse`` (a custom_vmap primitive): unbatched
calls fall back to XLA's cholesky + triangular_solve-against-identity;
vmapped calls (batch.solve_batch's regime) hit the Pallas kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# index maps must return i32 under jax_enable_x64: i64 block offsets fail
# Mosaic legalization ('func.return (i32, i64, i64)') on the real TPU.
# A numpy scalar (not jnp: traced-Array constants captured by an index-map
# lambda are rejected by pallas_call's closure-constant check) keeps the
# dtype i32 on both the compiled and interpret paths.
_I0 = np.int32(0)

# problems per grid instance; amortizes the n sequential steps across a
# VMEM-resident tile of the batch
_TB = 8
# VMEM budget guard: 3 buffers of TB*n*n*4 bytes must fit comfortably
_MAX_PALLAS_N = 256


def _chol_inv_kernel(a_ref, l_ref, linv_ref, *, n: int):
    """Factor a (TB, n, n) tile: L (lower Cholesky) and Linv = L^-1.

    Per step j (lax.fori_loop, j = 0..n-1):
      d      = sqrt(W[:, j, j])                    (W = running workspace)
      lcol   = W[:, :, j] / d  masked to rows >= j
      W     -= lcol lcol^T     masked to cols > j  (rank-1, VPU)
      Linv_j = (e_j - L[j, :j] Linv[:j, :]) / d    (batched matvec, MXU)
    Upper-triangle garbage is masked on read and zeroed at the end.

    Mosaic constraint (real-TPU lowering): dynamic indices into the lane
    (last) dimension must be 128-aligned, so ``pl.ds(j, 1)`` loads/stores
    are unlowerable.  Column/row j are instead extracted with masked
    lane/sublane reductions and written back with masked full-tile
    read-modify-write stores; the transpose lcol -> lcol^T is avoided by
    reading row j of the (symmetric) trailing block instead.  All O(n^2)
    per step, same asymptotics as the rank-1 update itself.
    """
    dt = l_ref.dtype
    row_ids = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)  # (1, n, 1)
    col_ids = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)  # (1, 1, n)
    zero = jnp.zeros((), dt)

    l_ref[:] = a_ref[:]
    linv_ref[:] = jnp.zeros_like(linv_ref)

    def step(j, _):
        W = l_ref[:]
        is_row_j = row_ids == j
        is_col_j = col_ids == j
        # row j (pre-update): cols < j hold final L entries; cols >= j
        # mirror column j because the trailing block stays symmetric
        rowj = jnp.sum(jnp.where(is_row_j, W, zero), axis=1, keepdims=True)
        d2 = jnp.sum(jnp.where(is_col_j, rowj, zero), axis=2, keepdims=True)
        dinv = lax.rsqrt(d2)
        col = jnp.sum(jnp.where(is_col_j, W, zero), axis=2, keepdims=True)
        lcol = jnp.where(row_ids >= j, col * dinv, zero)  # (TB, n, 1)
        # transpose-free outer product: lcol^T restricted to cols > j
        lcolT = jnp.where(col_ids > j, rowj * dinv, zero)  # (TB, 1, n)
        W = W - lcol * lcolT
        W = jnp.where(is_col_j, jnp.broadcast_to(lcol, W.shape), W)
        l_ref[:] = W
        # fused forward substitution: row j of Linv
        lrow = jnp.where(col_ids < j, rowj, zero)
        acc = lax.dot_general(
            lrow, linv_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dt,
        )  # (TB, 1, n)
        ej = jnp.where(is_col_j, jnp.ones((), dt), zero)
        newrow = (ej - acc) * dinv
        linv_ref[:] = jnp.where(
            is_row_j, jnp.broadcast_to(newrow, W.shape), linv_ref[:]
        )
        return jnp.int32(0)

    # int32 loop bounds: under x64 an int64 induction variable forces an
    # i32->i64 convert in the kernel, which this Mosaic lowering cannot
    # emit (infinite _convert_helper recursion on the axon plugin)
    lax.fori_loop(jnp.int32(0), jnp.int32(n), step, jnp.int32(0))
    # zero strict upper triangle of L (cholesky contract)
    l_ref[:] = jnp.where(col_ids > row_ids, jnp.zeros((), dt), l_ref[:])


def _pallas_chol_inv_batched(K: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, n, n) -> (L, Linv), padding B up to a multiple of the tile."""
    B, n, _ = K.shape
    tb = _TB if n <= 128 else 2
    pad = (-B) % tb
    if pad:
        # padded slots factor the identity (finite, cheap)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), (pad, n, n))
        K = jnp.concatenate([K, eye], axis=0)
    Bp = K.shape[0]

    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(_chol_inv_kernel, n=n),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, n, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, n, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, n, n), K.dtype),
            jax.ShapeDtypeStruct((Bp, n, n), K.dtype),
        ),
        interpret=interpret,
    )(K)
    L, Linv = out
    if pad:
        L, Linv = L[:B], Linv[:B]
    return L, Linv


def _chol_inv_xla(K: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unbatched / oversized fallback: XLA cholesky + explicit inverse."""
    L = jnp.linalg.cholesky(K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    Linv = lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True
    )
    return L, Linv


def _chol_inv_rank1(K: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f64-on-accelerator route.  The TPU runtime lowers f64
    lax.linalg.cholesky / triangular_solve ~100x slower than f64 GEMMs
    (measured: 570 us vs 8.5 us per n=64 problem in-graph,
    benchmarks/kernel_roofline.py), so build the factor AND its inverse
    from rank-1 VPU updates + MXU GEMMs instead: the blocked signed
    Cholesky of ops/ldlt.py with all-positive signs IS a plain Cholesky
    (2.6x faster at n=64, 7.4x at n=256), and the fused block inverses
    expand to the full L^-1 by block forward substitution (GEMMs only)."""
    from . import ldlt

    n = K.shape[-1]
    # the f64 VPU work of the blocked build scales as n * bs^2, so small
    # blocks win big at small n (measured (B=256, n=64): bs=16 -> 28 us
    # per problem vs bs=64 -> 221 us; (32, 256): bs=32 best) while the
    # extra per-block GEMMs stay cheap on the f64 MXU path
    bs = 16 if n <= 128 else 32
    Np = ldlt.padded_dim(n, bs)
    # identity padding decouples: chol(K + I-block) = chol(K) + I-block,
    # so slicing back to n x n is exact
    Kp = ldlt.pad_quasidef(K, Np)
    signs = jnp.ones((Np,), K.dtype)
    L, Linv = _signed_inv_xla(Kp, signs, block=bs)
    return L[:n, :n], Linv[:n, :n]


def _chol_inv_fallback(K: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Route non-Pallas factorizations by measured hardware behavior:
    f32 XLA cholesky is fine everywhere; f64 (and other dtypes) on TPU
    takes the rank-1/GEMM build that avoids XLA's pathological f64
    cholesky/triangular_solve TPU lowerings.  GPU keeps the XLA route
    (cusolver's f64 cholesky is fast)."""
    if K.dtype != jnp.float32 and jax.default_backend() == "tpu":
        return _chol_inv_rank1(K)
    return _chol_inv_xla(K)


@jax.custom_batching.custom_vmap
def cholesky_with_inverse(K: jax.Array) -> tuple[jax.Array, jax.Array]:
    """L = chol(K) and Linv = L^-1 for one (n, n) SPD matrix.

    Under vmap (the batched-fleet regime) this dispatches to the Pallas
    kernel; unbatched it uses XLA (f32) or the rank-1/GEMM build (f64 on
    an accelerator).  Solves then become GEMMs: K^-1 v = Linv^T (Linv v).
    """
    return _chol_inv_fallback(K)


@cholesky_with_inverse.def_vmap
def _cholesky_with_inverse_vmap(axis_size, in_batched, K):
    (k_batched,) = in_batched
    if not k_batched:
        K = jnp.broadcast_to(K, (axis_size,) + K.shape)
    n = K.shape[-1]
    # TPU Mosaic is float32-native; other dtypes (or oversized / nested-vmap
    # shapes) take the XLA route.  CPU runs the kernel in interpreter mode
    # for any dtype.
    kernel_ok = (
        K.ndim == 3
        and K.shape[-2] == n
        and n <= _MAX_PALLAS_N
        and (
            (K.dtype == jnp.float32 and jax.default_backend() == "tpu")
            or jax.default_backend() == "cpu"  # interpret mode, any dtype
        )
    )
    if kernel_ok:
        out = _pallas_chol_inv_batched(K)
    else:
        out = jax.vmap(_chol_inv_fallback)(K)
    return out, (True, True)


def inv_solve(Linv: jax.Array, v: jax.Array) -> jax.Array:
    """K^-1 v via the precomputed triangular inverse: two GEMM/matvecs
    (the batched-triangular-solve replacement; MXU-shaped, no sequential
    substitution).  Shapes: Linv (..., n, n), v (..., n)."""
    y = jnp.einsum("...ij,...j->...i", Linv, v)
    return jnp.einsum("...ji,...j->...i", Linv, y)


# ---------------------------------------------------------------------------
# fused variant: factor + inverse + apply — the cyclic-reduction chain-step
# kernel (multistage.cr_chain_factor).  One VMEM round trip produces the
# odd-block factor, its triangular inverse AND the three substitution
# operators X = Do^-1 [S_in | S_out^T | Eo^T]; the level's remaining work
# (Schur-product einsums) is pure batched GEMM that XLA fuses.  This is the
# batched analog of the reference's per-stage potrf+trsm BLASFEO panel
# calls (multistage_kkt.hpp:1253-1352, utils/blasfeo_wrapper.hpp:21-120):
# instead of pipelining panels of ONE recursion, it executes the whole
# level's independent block set at once and keeps every intermediate in
# VMEM.
# ---------------------------------------------------------------------------

def _chol_inv_apply_kernel(a_ref, rhs_ref, l_ref, linv_ref, y_ref, *, n: int):
    """(TB, n, n) factor+inverse, then Y = K^-1 RHS for a stacked
    (TB, n, R) right-hand block — the two substitution GEMMs run against
    the VMEM-resident Linv with no HBM round trip."""
    _chol_inv_kernel(a_ref, l_ref, linv_ref, n=n)
    dt = l_ref.dtype
    z = lax.dot_general(
        linv_ref[:], rhs_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=dt,
    )  # Linv @ RHS            (TB, n, R)
    y_ref[:] = lax.dot_general(
        linv_ref[:], z,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=dt,
    )  # Linv^T @ (Linv @ RHS) (TB, n, R)


def _pallas_chol_inv_apply_batched(K, RHS):
    """(B, n, n), (B, n, R) -> (L, Linv, Y = K^-1 RHS)."""
    B, n, _ = K.shape
    R = RHS.shape[-1]
    tb = _TB if n <= 128 else 2
    pad = (-B) % tb
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), (pad, n, n))
        K = jnp.concatenate([K, eye], axis=0)
        RHS = jnp.concatenate(
            [RHS, jnp.zeros((pad, n, R), RHS.dtype)], axis=0
        )
    Bp = K.shape[0]

    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(_chol_inv_apply_kernel, n=n),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, n, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n, R), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, n, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n, R), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, n, n), K.dtype),
            jax.ShapeDtypeStruct((Bp, n, n), K.dtype),
            jax.ShapeDtypeStruct((Bp, n, R), K.dtype),
        ),
        interpret=interpret,
    )(K, RHS)
    L, Linv, Y = out
    if pad:
        L, Linv, Y = L[:B], Linv[:B], Y[:B]
    return L, Linv, Y


def _chol_inv_apply_fallback(K, RHS):
    L, Linv = _chol_inv_fallback(K)
    Y = Linv.T @ (Linv @ RHS)
    return L, Linv, Y


@jax.custom_batching.custom_vmap
def cholesky_inverse_apply(K, RHS):
    """L = chol(K), Linv = L^-1 and Y = K^-1 RHS for one (n, n) SPD matrix
    and an (n, R) right-hand block.

    Under vmap (the CR level's odd-block set) this dispatches to the fused
    Pallas kernel — factor, inverse and both substitution GEMMs in one
    VMEM-resident pass.  Unbatched (or nested-vmap / oversized / f64-on-
    TPU) it composes the existing fallbacks."""
    return _chol_inv_apply_fallback(K, RHS)


@cholesky_inverse_apply.def_vmap
def _cholesky_inverse_apply_vmap(axis_size, in_batched, K, RHS):
    k_batched, r_batched = in_batched
    if not k_batched:
        K = jnp.broadcast_to(K, (axis_size,) + K.shape)
    if not r_batched:
        RHS = jnp.broadcast_to(RHS, (axis_size,) + RHS.shape)
    n = K.shape[-1]
    kernel_ok = (
        K.ndim == 3
        and K.shape[-2] == n
        and RHS.ndim == 3
        and n <= _MAX_PALLAS_N
        and (
            (K.dtype == jnp.float32 and jax.default_backend() == "tpu")
            or jax.default_backend() == "cpu"  # interpret mode, any dtype
        )
    )
    if kernel_ok:
        out = _pallas_chol_inv_apply_batched(K, RHS)
    else:
        out = jax.vmap(_chol_inv_apply_fallback)(K, RHS)
    return out, (True, True, True)


# ---------------------------------------------------------------------------
# signed variant: K = L S L^T for quasi-definite K (the batched Pallas path
# of the dense_ldlt backend; blocked single-problem version in ops/ldlt.py)
# ---------------------------------------------------------------------------

def _signed_chol_inv_kernel(a_ref, s_ref, l_ref, linv_ref, *, n: int):
    """Factor a (TB, n, n) quasi-definite tile: K = L S L^T with
    S = diag(signs), signs in {+1, -1} shared across the tile.  Identical
    loop structure to ``_chol_inv_kernel`` with the sign woven into the
    pivot, the column scaling (1/s = s) and the rank-1 downdate."""
    dt = l_ref.dtype
    row_ids = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    col_ids = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    zero = jnp.zeros((), dt)

    l_ref[:] = a_ref[:]
    linv_ref[:] = jnp.zeros_like(linv_ref)
    s_row = s_ref[:]  # (1, 1, n), static load

    def step(j, _):
        W = l_ref[:]
        is_row_j = row_ids == j
        is_col_j = col_ids == j
        sj = jnp.sum(jnp.where(is_col_j, s_row, zero), axis=2, keepdims=True)
        # row j (pre-update): cols < j final, cols >= j mirror column j
        # (trailing block symmetric); see _chol_inv_kernel for the Mosaic
        # lane-dimension constraint this formulation satisfies
        rowj = jnp.sum(jnp.where(is_row_j, W, zero), axis=1, keepdims=True)
        d2 = sj * jnp.sum(
            jnp.where(is_col_j, rowj, zero), axis=2, keepdims=True
        )  # > 0 when quasi-definite
        dinv = lax.rsqrt(d2)
        col = jnp.sum(jnp.where(is_col_j, W, zero), axis=2, keepdims=True)
        # l_ij = W_ij / (s_j d) = W_ij * dinv * s_j
        lcol = jnp.where(row_ids >= j, col * dinv * sj, zero)
        # upd_ik = lcol_i lcol_k s_j; lcol_k read transpose-free from row j
        lcolT = jnp.where(col_ids > j, rowj * dinv, zero)  # = lcol^T * s_j
        W = W - lcol * lcolT
        W = jnp.where(is_col_j, jnp.broadcast_to(lcol, W.shape), W)
        l_ref[:] = W
        lrow = jnp.where(col_ids < j, rowj, zero)
        acc = lax.dot_general(
            lrow, linv_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dt,
        )
        ej = jnp.where(is_col_j, jnp.ones((), dt), zero)
        newrow = (ej - acc) * dinv
        linv_ref[:] = jnp.where(
            is_row_j, jnp.broadcast_to(newrow, W.shape), linv_ref[:]
        )
        return jnp.int32(0)

    # int32 loop bounds: under x64 an int64 induction variable forces an
    # i32->i64 convert in the kernel, which this Mosaic lowering cannot
    # emit (infinite _convert_helper recursion on the axon plugin)
    lax.fori_loop(jnp.int32(0), jnp.int32(n), step, jnp.int32(0))
    l_ref[:] = jnp.where(col_ids > row_ids, jnp.zeros((), dt), l_ref[:])


def _pallas_signed_chol_inv_batched(K, signs):
    B, n, _ = K.shape
    tb = _TB if n <= 128 else 2
    pad = (-B) % tb
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), (pad, n, n))
        # identity slots are consistent with any sign pattern's magnitude
        # only when signs are +1; embed sign-consistent diagonal instead
        eye = eye * signs[None, None, :]
        K = jnp.concatenate([K, eye], axis=0)
    Bp = K.shape[0]

    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(_signed_chol_inv_kernel, n=n),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, n, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (_I0, _I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, n, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, n, n), K.dtype),
            jax.ShapeDtypeStruct((Bp, n, n), K.dtype),
        ),
        interpret=interpret,
    )(K, signs.astype(K.dtype).reshape(1, 1, n))
    L, Linv = out
    if pad:
        L, Linv = L[:B], Linv[:B]
    return L, Linv


def _signed_inv_xla(K, signs, block=None):
    """Unbatched / oversized fallback: blocked signed Cholesky
    (ops/ldlt.py) + full triangular inverse by block forward substitution
    against the identity."""
    from . import ldlt

    if block is None:
        block = ldlt.DEFAULT_BLOCK
    L, Linvs = ldlt.signed_cholesky(K, signs, block=block)
    N = L.shape[-1]
    nb, bs, _ = Linvs.shape
    eye = jnp.eye(N, dtype=K.dtype)

    def fwd(k, X):
        off = k * bs
        Lrow = lax.dynamic_slice(L, (off, 0), (bs, N))
        R = lax.dynamic_slice(eye, (off, 0), (bs, N)) - Lrow @ X
        return lax.dynamic_update_slice(X, Linvs[k] @ R, (off, 0))

    Linv = lax.fori_loop(0, nb, fwd, jnp.zeros_like(L))
    return L, Linv


@jax.custom_batching.custom_vmap
def signed_cholesky_with_inverse(K, signs):
    """L (lower, scaled-Cholesky convention) and Linv = L^-1 with
    K = L diag(signs) L^T, for one (n, n) quasi-definite matrix.

    Under vmap (a fleet of full-KKT dense_ldlt factorizations) this
    dispatches to the signed Pallas kernel; unbatched it runs the blocked
    ops/ldlt.py factorization and expands the block inverses.  Solves
    become GEMMs: K^-1 v = Linv^T (signs * (Linv v))."""
    return _signed_inv_xla(K, signs)


@signed_cholesky_with_inverse.def_vmap
def _signed_chol_inv_vmap(axis_size, in_batched, K, signs):
    k_batched, s_batched = in_batched
    if not k_batched:
        K = jnp.broadcast_to(K, (axis_size,) + K.shape)
    if s_batched:
        # heterogeneous sign patterns per batch element: no shared-tile
        # kernel; fall back (homogeneous fleets share one (n,) signs)
        out = jax.vmap(_signed_inv_xla)(K, signs)
        return out, (True, True)
    n = K.shape[-1]
    kernel_ok = (
        K.ndim == 3
        and K.shape[-2] == n
        and n <= _MAX_PALLAS_N
        and (
            (K.dtype == jnp.float32 and jax.default_backend() == "tpu")
            or jax.default_backend() == "cpu"  # interpret mode, any dtype
        )
    )
    if kernel_ok:
        out = _pallas_signed_chol_inv_batched(K, signs)
    else:
        out = jax.vmap(lambda k: _signed_inv_xla(k, signs))(K)
    return out, (True, True)


def signed_inv_solve(Linv, signs, v):
    """(L S L^T)^-1 v via the precomputed inverse: two GEMVs and a sign
    flip.  Shapes: Linv (..., n, n), signs (n,), v (..., n)."""
    y = jnp.einsum("...ij,...j->...i", Linv, v)
    return jnp.einsum("...ji,...j->...i", Linv, signs * y)
