"""ILU, Schwarz, and GMG tests."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from faspsolver_tpu.io import read_csrvec, read_mtx
from faspsolver_tpu.krylov import pcg, gmres
from faspsolver_tpu.ops import device_operator
from faspsolver_tpu.precond import (poisson_gmg_2d, poisson_gmg_3d,
                                    setup_ilu, setup_schwarz,
                                    TriangularSolver)
from faspsolver_tpu.precond.ilu import iluk_factor
from faspsolver_tpu.testgen import poisson_2d, poisson_2d_manufactured
from faspsolver_tpu.utils.params import ILUParam, SWZParam
from faspsolver_tpu.constants import ILUType, SchwarzType

RNG = np.random.default_rng(5)


def test_triangular_solver_exact():
    n = 50
    L = sp.tril(sp.random(n, n, 0.2, random_state=1) + 2 * sp.eye(n)).tocsr()
    ts = TriangularSolver.from_sparse(L, lower=True)
    b = RNG.standard_normal(n)
    x = np.asarray(ts(jnp.asarray(b)))
    np.testing.assert_allclose(L @ x, b, atol=1e-10)
    U = L.T.tocsr()
    ts2 = TriangularSolver.from_sparse(U, lower=False)
    x2 = np.asarray(ts2(jnp.asarray(b)))
    np.testing.assert_allclose(U @ x2, b, atol=1e-10)


def test_ilu0_exact_on_tridiag():
    """ILU(0) of a tridiagonal matrix is the exact LU."""
    n = 40
    A = poisson_2d(n, 1)   # 1D chain: tridiagonal
    L, U = iluk_factor(A, 0)
    err = np.abs((L @ U - A.to_scipy()).toarray()).max()
    assert err < 1e-8 * np.abs(A.data).max()


def test_ilu_pcg(refdata):
    A, b = read_csrvec(f"{refdata}/csrmat_FE.dat", f"{refdata}/rhs_FE.dat")
    M = setup_ilu(A, ILUParam(ILU_type=int(ILUType.ILUK), ILU_lfil=1))
    op = device_operator(A, prefer="ell")
    res = pcg(op, jnp.asarray(b), M=M, tol=1e-10, maxit=200)
    assert bool(res.converged)
    assert int(res.iters) < 80
    x = np.asarray(res.x)
    assert np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b) < 1e-9


def test_ilut_gmres_nonsymmetric(refdata):
    A = read_mtx(f"{refdata}/orsreg_1.mtx")
    b = A.matvec(RNG.standard_normal(A.nrow))
    M = setup_ilu(A, ILUParam(ILU_type=int(ILUType.ILUT), ILU_droptol=1e-3))
    op = device_operator(A, prefer="ell")
    res = gmres(op, jnp.asarray(b), M=M, tol=1e-9, maxit=500, restart=30)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b) < 1e-8


def test_schwarz_symmetric_pcg():
    A, b, u = poisson_2d_manufactured(20)
    M = setup_schwarz(A, SWZParam(SWZ_maxlvl=2,
                                  SWZ_type=int(SchwarzType.SYMMETRIC)))
    op = device_operator(A, prefer="ell")
    res = pcg(op, jnp.asarray(b), M=M, tol=1e-10, maxit=200)
    assert bool(res.converged)
    assert int(res.iters) < 60
    assert np.max(np.abs(np.asarray(res.x) - u)) < 1e-7


def test_schwarz_forward_gmres():
    # forward multiplicative Schwarz is nonsymmetric: pair it with GMRES
    A, b, u = poisson_2d_manufactured(20)
    M = setup_schwarz(A, SWZParam(SWZ_maxlvl=2,
                                  SWZ_type=int(SchwarzType.FORWARD)))
    op = device_operator(A, prefer="ell")
    res = gmres(op, jnp.asarray(b), M=M, tol=1e-10, maxit=200, restart=30)
    assert bool(res.converged)
    assert int(res.iters) < 60
    assert np.max(np.abs(np.asarray(res.x) - u)) < 1e-7


def test_gmg_2d():
    n = 64
    xs = np.arange(n + 1) / n
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    u_exact = np.sin(np.pi * X) * np.sin(np.pi * Y)
    f = 2 * np.pi ** 2 * u_exact
    res = poisson_gmg_2d(jnp.asarray(f), n, tol=1e-8, maxit=50)
    assert bool(res.converged)
    assert int(res.iters) <= 12
    # discretization error ~ h^2
    assert np.max(np.abs(np.asarray(res.x) - u_exact)) < 5e-4


def test_gmg_2d_fmg():
    n = 64
    xs = np.arange(n + 1) / n
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    f = 2 * np.pi ** 2 * np.sin(np.pi * X) * np.sin(np.pi * Y)
    res = poisson_gmg_2d(jnp.asarray(f), n, tol=1e-8, maxit=50,
                         full_first=True)
    assert bool(res.converged)


def test_gmg_3d():
    n = 16
    xs = np.arange(n + 1) / n
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    u_exact = (np.sin(np.pi * X) * np.sin(np.pi * Y) * np.sin(np.pi * Z))
    f = 3 * np.pi ** 2 * u_exact
    res = poisson_gmg_3d(jnp.asarray(f), n, tol=1e-8, maxit=60)
    assert bool(res.converged)
    assert np.max(np.abs(np.asarray(res.x) - u_exact)) < 5e-3
