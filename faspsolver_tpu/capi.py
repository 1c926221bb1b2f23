"""Flat-array solver API — the external-code binding surface.

Reference: base/src/SolWrapper.c (fasp_fwrapper_* / fasp_wrapper_*): raw
pointer + scalar entry points so Fortran/C simulation codes can call the
solvers without touching library data structures.  The Python-era analog
is a set of functions over plain NumPy arrays (the universal ABI for
Python/C interop: any ctypes/cffi/f2py shim can build these arrays from
raw pointers with zero copies via numpy.frombuffer).

Every function takes CSR/BSR components as flat arrays and returns
(x, iterations, relative_residual).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .formats import BSRMatrix, CSRMatrix
from .solvers import krylov_amg, krylov_ilu
from .utils.params import AMGParam, ILUParam, ITSParam


def dcsr_krylov_amg(n: int, indptr, indices, data, b,
                    tol: float = 1e-6, maxit: int = 500,
                    solver_type: int = 1
                    ) -> Tuple[np.ndarray, int, float]:
    """AMG-preconditioned Krylov from raw CSR arrays
    (reference: fasp_fwrapper_dcsr_krylov_amg_, SolWrapper.c:261)."""
    A = CSRMatrix(np.asarray(indptr), np.asarray(indices),
                  np.asarray(data, dtype=np.float64), (n, n))
    res, _ = krylov_amg(A, np.asarray(b, dtype=np.float64),
                        its=ITSParam(itsolver_type=solver_type, tol=tol,
                                     maxit=maxit))
    return np.asarray(res.x), int(res.iters), float(res.relres)


def dcsr_amg(n: int, indptr, indices, data, b,
             tol: float = 1e-6, maxit: int = 100
             ) -> Tuple[np.ndarray, int, float]:
    """AMG as a solver from raw CSR arrays
    (reference: fasp_fwrapper_dcsr_amg_, SolWrapper.c:136)."""
    from .solvers import solve_amg
    A = CSRMatrix(np.asarray(indptr), np.asarray(indices),
                  np.asarray(data, dtype=np.float64), (n, n))
    res = solve_amg(A, np.asarray(b, dtype=np.float64),
                    amg=AMGParam(tol=tol, maxit=maxit))
    return np.asarray(res.x), int(res.iters), float(res.relres)


def dcsr_krylov_ilu(n: int, indptr, indices, data, b,
                    tol: float = 1e-6, maxit: int = 500, lfil: int = 0
                    ) -> Tuple[np.ndarray, int, float]:
    """ILU-preconditioned Krylov from raw CSR arrays
    (reference: fasp_fwrapper_dcsr_krylov_ilu_, SolWrapper.c:195)."""
    A = CSRMatrix(np.asarray(indptr), np.asarray(indices),
                  np.asarray(data, dtype=np.float64), (n, n))
    res = krylov_ilu(A, np.asarray(b, dtype=np.float64),
                     its=ITSParam(tol=tol, maxit=maxit),
                     ilu=ILUParam(ILU_lfil=lfil))
    return np.asarray(res.x), int(res.iters), float(res.relres)


def dbsr_krylov_amg(nb: int, nrow_block: int, indptr, indices, data, b,
                    tol: float = 1e-6, maxit: int = 500,
                    solver_type: int = 6
                    ) -> Tuple[np.ndarray, int, float]:
    """BSR AMG-preconditioned Krylov from raw block arrays
    (reference: fasp_fwrapper_dbsr_krylov_amg_, SolWrapper.c:397)."""
    blocks = np.asarray(data, dtype=np.float64).reshape(-1, nb, nb)
    A = BSRMatrix(np.asarray(indptr), np.asarray(indices), blocks,
                  (nrow_block, nrow_block))
    res, _ = krylov_amg(A, np.asarray(b, dtype=np.float64),
                        its=ITSParam(itsolver_type=solver_type, tol=tol,
                                     maxit=maxit))
    return np.asarray(res.x), int(res.iters), float(res.relres)
