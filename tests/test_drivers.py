"""Level-5 driver tests: the canonical user API over the reference corpus."""
import jax.numpy as jnp
import numpy as np
import pytest

from faspsolver_tpu.constants import AMGType, SolverType
from faspsolver_tpu.io import read_bsr, read_csrvec, read_vec, read_vecind
from faspsolver_tpu.solvers import (itsolver, krylov, krylov_amg, krylov_diag,
                                    solve_amg, solve_famg)
from faspsolver_tpu.utils.params import AMGParam, ITSParam


@pytest.fixture(scope="module")
def fd(refdata):
    A, b = read_csrvec(f"{refdata}/csrmat_FD.dat", f"{refdata}/rhs_FD.dat")
    sol = read_vecind(f"{refdata}/sol_FD.dat")
    return A, b, sol


def test_krylov_driver(fd):
    A, b, sol = fd
    res = krylov(A, b, its=ITSParam(tol=1e-10, maxit=200))
    assert bool(res.converged)
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_krylov_diag_driver(fd):
    A, b, sol = fd
    res = krylov_diag(A, b, its=ITSParam(tol=1e-10, maxit=200))
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_krylov_amg_driver(refdata):
    A, b = read_csrvec(f"{refdata}/csrmat_FE.dat", f"{refdata}/rhs_FE.dat")
    sol = read_vecind(f"{refdata}/sol_FE.dat")
    res, hier = krylov_amg(A, b, its=ITSParam(tol=1e-10, maxit=100))
    assert bool(res.converged)
    assert int(res.iters) <= 12
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_solve_amg_driver(fd):
    A, b, sol = fd
    res = solve_amg(A, b, amg=AMGParam(tol=1e-10, maxit=30))
    assert bool(res.converged)
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_bsr_krylov_amg_spe01(refdata):
    """SPE01 reservoir path (reference: testbsr.ex, ini/bsr.dat:
    vFGMRES + AMG to tight tolerance)."""
    A = read_bsr(f"{refdata}/bsrmat_SPE01.dat")
    b = read_vec(f"{refdata}/rhs_SPE01.dat")
    its = ITSParam(itsolver_type=int(SolverType.VFGMRES), tol=1e-8,
                   maxit=200, restart=30)
    res, hier = krylov_amg(A, b, its=its, amg=AMGParam())
    assert bool(res.converged)
    x = np.asarray(res.x)
    r = b - A.matvec(x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_safety_net_driver(fd):
    A, b, sol = fd
    its = ITSParam(itsolver_type=int(SolverType.SCG), tol=1e-10, maxit=200)
    res = itsolver(A, b, its=its)
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4
