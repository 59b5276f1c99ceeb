"""Sparse problem frontend.

Mirrors piqp::SparseSolver's API (solver.hpp:1293-1322) over scipy.sparse
CSC inputs.  TPU-first routing instead of a scalar sparse LDL^T
(sparse/ldlt.hpp is an etree up-looking factorization — exactly the kind of
scalar-chasing code TPUs are worst at):

- the condensed KKT matrix is only n x n (all constraints eliminated,
  matching the reference's ``sparse_ldlt_cond`` / KKT_ALL_ELIMINATED mode,
  sparse/kkt_all_eliminated.hpp); for small/medium n we densify that system
  and run the MXU Cholesky path;
- residual/RHS matvecs use the sparse structure on host only at setup;
  on-device they are dense GEMVs (bandwidth-bound but tiny next to the
  factorization);
- multistage/OCP-structured problems should use the multistage backend
  (piqp_tpu.multistage) which keeps cost linear in the horizon.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .api import DenseSolver
from .types import Settings, Status


def _to_dense(M, name: str):
    if M is None:
        return None
    if hasattr(M, "toarray"):
        return M.toarray()
    return np.asarray(M)


class SparseSolver(DenseSolver):
    """Sparse-input solver with PIQP's SparseSolver API.

    Accepts scipy.sparse matrices (any format) or dense arrays for P, A, G.
    Current backend: fully-condensed dense Cholesky (the reference's
    sparse_ldlt_cond analog) — optimal on TPU for n up to a few thousand.
    """

    def setup(self, P, c, A=None, b=None, G=None, h_l=None, h_u=None,
              x_l=None, x_u=None) -> None:
        super().setup(
            _to_dense(P, "P"), c, _to_dense(A, "A"), b, _to_dense(G, "G"),
            h_l, h_u, x_l, x_u,
        )

    def update(self, P=None, c=None, A=None, b=None, G=None, h_l=None,
               h_u=None, x_l=None, x_u=None) -> None:
        super().update(
            _to_dense(P, "P"), c, _to_dense(A, "A"), b, _to_dense(G, "G"),
            h_l, h_u, x_l, x_u,
        )
