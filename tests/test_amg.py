"""AMG correctness + golden convergence-regime parity (BASELINE.md)."""
import jax.numpy as jnp
import numpy as np
import pytest

from faspsolver_tpu.constants import (AggregationType, CycleType,
                                      InterpType, SmootherType)
from faspsolver_tpu.io import read_csrvec, read_vecind
from faspsolver_tpu.krylov import pcg
from faspsolver_tpu.ops import device_operator
from faspsolver_tpu.precond import AMGPrecond
from faspsolver_tpu.precond.amg import (amg_solve, famg_solve, setup_rs,
                                        setup_sa, setup_ua)
from faspsolver_tpu.testgen import poisson_2d_manufactured
from faspsolver_tpu.utils.params import AMGParam


@pytest.fixture(scope="module")
def fe(refdata):
    A, b = read_csrvec(f"{refdata}/csrmat_FE.dat", f"{refdata}/rhs_FE.dat")
    sol = read_vecind(f"{refdata}/sol_FE.dat")
    return A, jnp.asarray(b), sol


def test_rs_v_direct_golden(fe):
    A, b, sol = fe
    h = setup_rs(A, AMGParam(interpolation_type=int(InterpType.DIRECT),
                             smoother=int(SmootherType.GS)))
    res = amg_solve(h, b, tol=1e-10, maxit=30)
    assert bool(res.converged)
    assert int(res.iters) <= 12          # golden: 8 (multicolor GS shifts ~1)
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4  # acceptance rule


def test_rs_w_cycle_golden(fe):
    A, b, sol = fe
    h = setup_rs(A, AMGParam(cycle_type=int(CycleType.W),
                             smoother=int(SmootherType.GS)))
    res = amg_solve(h, b, tol=1e-10, maxit=20)
    assert bool(res.converged)
    assert int(res.iters) <= 6           # golden: 3
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_rs_amli_golden(fe):
    A, b, sol = fe
    h = setup_rs(A, AMGParam(cycle_type=int(CycleType.AMLI), amli_degree=3,
                             smoother=int(SmootherType.GS)))
    res = amg_solve(h, b, tol=1e-10, maxit=30)
    assert bool(res.converged)
    assert int(res.iters) <= 9           # golden: 6
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_rs_nlamli(fe):
    A, b, sol = fe
    h = setup_rs(A, AMGParam(cycle_type=int(CycleType.NL_AMLI),
                             smoother=int(SmootherType.GS)))
    res = amg_solve(h, b, tol=1e-10, maxit=30)
    assert bool(res.converged)
    assert int(res.iters) <= 9           # golden: 6
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_rs_sgs_golden(fe):
    A, b, sol = fe
    h = setup_rs(A, AMGParam(smoother=int(SmootherType.SGS)))
    res = amg_solve(h, b, tol=1e-10, maxit=40)
    assert bool(res.converged)
    assert int(res.iters) <= 18          # golden: 12
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_sa_golden(fe):
    A, b, sol = fe
    h = setup_sa(A, AMGParam(aggregation_type=int(AggregationType.VMB),
                             smoother=int(SmootherType.GS)))
    res = amg_solve(h, b, tol=1e-10, maxit=100)
    assert bool(res.converged)
    assert int(res.iters) <= 68          # golden: 45
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_ua_pairwise_golden(fe):
    A, b, sol = fe
    h = setup_ua(A, AMGParam(aggregation_type=int(AggregationType.PAIRWISE),
                             pair_number=2, smoother=int(SmootherType.GS)))
    res = amg_solve(h, b, tol=1e-10, maxit=250)
    assert bool(res.converged)
    assert int(res.iters) <= 170         # golden: 113
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_famg(fe):
    A, b, sol = fe
    h = setup_rs(A, AMGParam(smoother=int(SmootherType.GS)))
    res = famg_solve(h, b, tol=1e-10, maxit=30)
    assert bool(res.converged)
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_ua_amg_pcg(fe):
    A, b, sol = fe
    h = setup_ua(A, AMGParam(aggregation_type=int(AggregationType.VMB),
                             smoother=int(SmootherType.GS)))
    res = pcg(device_operator(A, prefer="ell"), b, M=AMGPrecond(h),
              tol=1e-12, maxit=200)
    assert bool(res.converged)
    assert int(res.iters) < 80
    assert np.max(np.abs(np.asarray(res.x) - sol)) < 1e-4


def test_cheby_smoother():
    A, b, u = poisson_2d_manufactured(24)
    h = setup_rs(A, AMGParam(smoother=int(SmootherType.CHEBYSHEV),
                             polynomial_degree=3))
    res = amg_solve(h, jnp.asarray(b), tol=1e-10, maxit=40)
    assert bool(res.converged)
    assert np.max(np.abs(np.asarray(res.x) - u)) < 1e-6


def test_hierarchy_complexity(fe):
    A, _, _ = fe
    h = setup_rs(A, AMGParam())
    gc, oc = h.complexity()
    assert 1.0 < gc < 2.5
    assert 1.0 < oc < 4.0
