"""Finite-difference Poisson problem generators.

Reference: test/src/FdmPoisson.c (5-point 2D / 7-point 3D generators) and
test/main/testfdm2d.cpp / testfdm3d.cpp.  Used for manufactured-solution
tests and for arbitrarily large scaling benchmarks (shipped SPE01 is tiny;
BASELINE.md directs scaling runs to generated 3D Poisson).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp

from ..formats import CSRMatrix


def poisson_2d(nx: int, ny: int = None, dtype=np.float64
               ) -> CSRMatrix:
    """5-point Laplacian on an nx x ny interior grid of the unit square,
    Dirichlet boundary eliminated; scaled by 1/h^2 like the reference FDM
    generator (test/src/FdmPoisson.c)."""
    ny = ny if ny is not None else nx
    hx2 = float((nx + 1) ** 2)
    hy2 = float((ny + 1) ** 2)
    Tx = sp.diags([-hx2, 2 * hx2, -hx2], [-1, 0, 1], shape=(nx, nx))
    Ty = sp.diags([-hy2, 2 * hy2, -hy2], [-1, 0, 1], shape=(ny, ny))
    A = (sp.kron(sp.eye(ny), Tx) + sp.kron(Ty, sp.eye(nx))).tocsr()
    A.eliminate_zeros()        # scipy kron goes through BSR: drop the
    A.sort_indices()           # explicit zeros its dense blocks introduce
    return CSRMatrix.from_scipy(A.astype(dtype))


def poisson_3d(nx: int, ny: int = None, nz: int = None, dtype=np.float64
               ) -> CSRMatrix:
    """7-point Laplacian on the unit cube, Dirichlet eliminated."""
    ny = ny if ny is not None else nx
    nz = nz if nz is not None else nx

    def t(n):
        h2 = float((n + 1) ** 2)
        return sp.diags([-h2, 2 * h2, -h2], [-1, 0, 1], shape=(n, n))

    Ix, Iy, Iz = sp.eye(nx), sp.eye(ny), sp.eye(nz)
    A = (sp.kron(Iz, sp.kron(Iy, t(nx)))
         + sp.kron(Iz, sp.kron(t(ny), Ix))
         + sp.kron(t(nz), sp.kron(Iy, Ix))).tocsr()
    A.eliminate_zeros()
    A.sort_indices()
    return CSRMatrix.from_scipy(A.astype(dtype))


def poisson_2d_manufactured(nx: int, ny: int = None
                            ) -> Tuple[CSRMatrix, np.ndarray, np.ndarray]:
    """(A, b, u_exact) with u = sin(pi x) sin(pi y) sampled on the grid and
    b = A u (discrete manufactured solution — exact to machine precision,
    the same trick regression.c:118-126 uses with random solutions)."""
    ny = ny if ny is not None else nx
    A = poisson_2d(nx, ny)
    xs = np.arange(1, nx + 1) / (nx + 1)
    ys = np.arange(1, ny + 1) / (ny + 1)
    # NOT sin*sin: that is the lowest eigenmode of the discrete Laplacian,
    # so b would be an eigenvector and every Krylov solver would converge in
    # one iteration — a degenerate test.  Mix modes instead.
    X, Y = np.meshgrid(xs, ys)
    u = (np.sin(np.pi * X) * np.sin(np.pi * Y)
         + 0.5 * X * (1 - X) * np.exp(Y)).reshape(-1)
    b = A.matvec(u)
    return A, b, u


def poisson_3d_manufactured(nx: int
                            ) -> Tuple[CSRMatrix, np.ndarray, np.ndarray]:
    A = poisson_3d(nx)
    g = np.arange(1, nx + 1) / (nx + 1)
    s = np.sin(np.pi * g)
    q = g * (1 - g)       # mix in a non-eigenmode (see 2D note)
    u = (np.einsum("i,j,k->ijk", s, s, s)
         + 0.5 * np.einsum("i,j,k->ijk", q, s, q)).reshape(-1)
    b = A.matvec(u)
    return A, b, u


def block_poisson_3d(nx: int, ny: int = 0, nz: int = 0, nb: int = 3,
                     coupling: float = 0.1):
    """Block-expanded 3-D Poisson: each scalar stencil entry becomes an
    nb x nb SPD block ``a_ij * (I + coupling*(1-I))`` — a generated BSR
    system large enough for real multilevel block-AMG exercises (the
    shipped SPE01 sample is only 302 blocks; BASELINE.md directs scaling
    runs to generated 3-D systems, reference generator test/src/FdmPoisson.c
    + testfdm3d.cpp)."""
    from ..formats import BSRMatrix

    A = poisson_3d(nx, ny or nx, nz or nx)
    blk = np.eye(nb) + coupling * (np.ones((nb, nb)) - np.eye(nb))
    data = A.data[:, None, None] * blk[None]
    return BSRMatrix(A.indptr.copy(), A.indices.copy(),
                     np.ascontiguousarray(data), (A.nrow, A.ncol))
