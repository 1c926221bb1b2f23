"""STR/BLC format families, FEM mini-library, CR/energy-min AMG, SA-BSR,
benchmark harness pieces, and the CLI driver."""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from faspsolver_tpu import solvers
from faspsolver_tpu.constants import InterpType, SolverType
from faspsolver_tpu.formats import CSRMatrix
from faspsolver_tpu.formats.blc import BLCMatrix
from faspsolver_tpu.formats.str_grid import STRMatrix
from faspsolver_tpu.testgen import (l2_error, poisson_2d,
                                    poisson_fe_manufactured, refine_uniform,
                                    unit_square_mesh)
from faspsolver_tpu.utils.params import AMGParam, ITSParam

RNG = np.random.default_rng(7)


def _make_str(nx=10, ny=8, nc=2) -> STRMatrix:
    ng = nx * ny
    diag = np.tile(np.array([[4.2, 0.3], [0.3, 4.2]]), (ng, 1, 1))
    off = np.tile(np.array([[-1.0, 0.05], [0.05, -1.0]]), (ng, 1, 1))
    mask_p = np.ones(ng)
    mask_p[np.arange(ng) % nx == nx - 1] = 0
    mask_m = np.ones(ng)
    mask_m[np.arange(ng) % nx == 0] = 0
    return STRMatrix(nx=nx, ny=ny, nz=1, nc=nc, diag=diag,
                     offsets=(1, -1, nx, -nx),
                     offdiag=[off * mask_p[:, None, None],
                              off * mask_m[:, None, None],
                              off.copy(), off.copy()])


def test_str_operator_matches_expansion():
    A = _make_str()
    x = RNG.standard_normal(A.nrow)
    np.testing.assert_allclose(A.matvec(x), A.to_csr().matvec(x),
                               rtol=1e-13)
    from faspsolver_tpu.ops.str_ops import StrOperator
    op = StrOperator.from_str(A)
    np.testing.assert_allclose(np.asarray(op(jnp.asarray(x))), A.matvec(x),
                               rtol=1e-12)


def test_str_drivers():
    A = _make_str()
    xex = RNG.standard_normal(A.nrow)
    b = A.matvec(xex)
    for drv, kw in ((solvers.krylov_diag, {}),
                    (solvers.krylov_blockgs, {}),
                    (solvers.krylov_ilu, {})):
        r = drv(A, b, its=ITSParam(tol=1e-11, maxit=500), **kw)
        assert bool(r.converged)
        assert np.abs(np.asarray(r.x) - xex).max() < 1e-8


def _make_blc():
    A11 = poisson_2d(10)
    A22 = poisson_2d(7)
    B12 = CSRMatrix.from_scipy(
        sp.random(A11.nrow, A22.nrow, 0.02, random_state=1,
                  format="csr") * 0.1)
    return BLCMatrix(blocks=[[A11, B12], [B12.transpose(), A22]])


@pytest.mark.parametrize("mode", ["diag", "lower", "upper", "sgs"])
def test_blc_block_preconditioners(mode):
    A = _make_blc()
    xex = RNG.standard_normal(A.nrow)
    b = A.matvec(xex)
    r = solvers.krylov_block(A, b, its=ITSParam(tol=1e-11, maxit=400),
                             mode=mode, amg=AMGParam(coarse_dof=40))
    assert bool(r.converged)
    assert np.abs(np.asarray(r.x) - xex).max() < 1e-8


def test_blc_sweeping():
    A = _make_blc()
    xex = RNG.standard_normal(A.nrow)
    b = A.matvec(xex)
    r = solvers.krylov_sweeping(A, b, its=ITSParam(tol=1e-11, maxit=400),
                                amg=AMGParam(coarse_dof=40))
    assert bool(r.converged)


def test_fem_convergence_order():
    import scipy.sparse.linalg as spl
    errs = []
    for n in (8, 16, 32):
        A, b, mesh, interior, uex = poisson_fe_manufactured(n)
        u = spl.spsolve(A.to_scipy().tocsc(), b)
        errs.append(l2_error(mesh, u, interior, uex))
    # O(h^2): each refinement divides the L2 error by ~4
    assert errs[0] / errs[1] > 3.4
    assert errs[1] / errs[2] > 3.4


def test_fem_refine():
    m0 = unit_square_mesh(4)
    m1 = refine_uniform(m0)
    assert m1.num_elems == 4 * m0.num_elems
    # areas still tile the unit square
    from faspsolver_tpu.testgen.fem import _p1_geometry
    area, _ = _p1_geometry(m1)
    assert abs(area.sum() - 1.0) < 1e-12


def test_cr_and_energymin_setups():
    from faspsolver_tpu.precond.amg import setup_cr, setup_rs
    from faspsolver_tpu.precond import AMGPrecond
    from faspsolver_tpu.krylov import pcg
    from faspsolver_tpu.ops import device_operator
    from faspsolver_tpu.testgen import poisson_2d_manufactured
    A, b, xex = poisson_2d_manufactured(20)
    h = setup_cr(A, AMGParam(coarse_dof=50))
    r = pcg(device_operator(A), jnp.asarray(b), M=AMGPrecond(h),
            tol=1e-10, maxit=200)
    assert bool(r.converged)
    h2 = setup_rs(A, AMGParam(coarse_dof=50,
                              interpolation_type=int(InterpType.ENERGYMIN)))
    r2 = pcg(device_operator(A), jnp.asarray(b), M=AMGPrecond(h2),
             tol=1e-10, maxit=200)
    assert bool(r2.converged)
    assert np.abs(np.asarray(r2.x) - xex).max() < 1e-8


def test_sa_bsr_on_spe01(refdata):
    from faspsolver_tpu.io import read_bsr, read_vec
    from faspsolver_tpu.precond.amg import setup_sa_bsr
    from faspsolver_tpu.precond import AMGPrecond
    from faspsolver_tpu.krylov import vfgmres
    from faspsolver_tpu.ops import BsrEllOperator
    A = read_bsr(f"{refdata}/bsrmat_SPE01.dat")
    b = read_vec(f"{refdata}/rhs_SPE01.dat")
    h = setup_sa_bsr(A, AMGParam(coarse_dof=60))
    op = BsrEllOperator.from_bsr(A)
    r = vfgmres(op, jnp.asarray(b), M=AMGPrecond(h), tol=1e-9, maxit=500,
                restart=30)
    resid = np.linalg.norm(A.matvec(np.asarray(r.x)) - b) / np.linalg.norm(b)
    assert resid < 1e-6


def test_cli_driver(refdata):
    out = subprocess.run(
        [sys.executable, "-m", "faspsolver_tpu",
         "-mat", f"{refdata}/csrmat_FD.dat", "-rhs", f"{refdata}/rhs_FD.dat",
         "-solver", "1", "-precond", "2", "-tol", "1e-10"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Number of iterations" in out.stdout


def test_benchmark_lmvu():
    from faspsolver_tpu.benchmark import compute_lmvu
    lmvu = compute_lmvu(n_base=63, iters=10)
    assert 0 < lmvu < 1e-3


def test_gmgcg_variants():
    from faspsolver_tpu.precond import poisson_gmgcg_2d, poisson_gmgcg_3d
    n = 32
    xs = np.arange(n + 1) / n
    X, Y = np.meshgrid(xs, xs)
    f = 2 * np.pi**2 * np.sin(np.pi * X) * np.sin(np.pi * Y)
    r = poisson_gmgcg_2d(jnp.asarray(f), n, tol=1e-9)
    assert bool(r.converged) and int(r.iters) <= 10
    uex = np.sin(np.pi * X) * np.sin(np.pi * Y)
    assert np.abs(np.asarray(r.x) - uex).max() < 2e-3   # O(h^2)
    n3 = 8
    xs3 = np.arange(n3 + 1) / n3
    Xg, Yg, Zg = np.meshgrid(xs3, xs3, xs3, indexing="ij")
    f3 = 3 * np.pi**2 * np.sin(np.pi * Xg) * np.sin(np.pi * Yg) \
        * np.sin(np.pi * Zg)
    r3 = poisson_gmgcg_3d(jnp.asarray(f3), n3, tol=1e-9)
    assert bool(r3.converged)


def test_aggressive_coarsening_reduces_c_points():
    from faspsolver_tpu.precond.amg.coarsen_rs import (cf_split_aggressive,
                                                       cf_split_rs,
                                                       strong_couplings)
    from faspsolver_tpu.constants import CGPT
    from faspsolver_tpu.testgen import poisson_2d_manufactured
    A, _, _ = poisson_2d_manufactured(32)
    S = strong_couplings(A, 0.25, 0.9)
    nc_rs = (cf_split_rs(A, S) == CGPT).sum()
    nc_agg = (cf_split_aggressive(A, S, 1) == CGPT).sum()
    assert 0 < nc_agg < 0.6 * nc_rs


@pytest.mark.parametrize("which", ["ILU_levels", "SWZ_levels",
                                   "aggressive_level"])
def test_rs_setup_feature_levels(which):
    from faspsolver_tpu.precond.amg import setup_rs
    from faspsolver_tpu.precond import AMGPrecond
    from faspsolver_tpu.krylov import pcg
    from faspsolver_tpu.ops import device_operator
    from faspsolver_tpu.testgen import poisson_2d_manufactured
    A, b, xex = poisson_2d_manufactured(24)
    h = setup_rs(A, AMGParam(coarse_dof=50, **{which: 1}))
    r = pcg(device_operator(A), jnp.asarray(b), M=AMGPrecond(h),
            tol=1e-10, maxit=200)
    assert bool(r.converged)
    assert np.abs(np.asarray(r.x) - xex).max() < 1e-8


def test_str_to_bsr():
    A = _make_str()
    x = RNG.standard_normal(A.nrow)
    np.testing.assert_allclose(A.to_bsr().matvec(x), A.matvec(x),
                               rtol=1e-13)


def test_capi_flat_arrays():
    from faspsolver_tpu import capi
    from faspsolver_tpu.testgen import poisson_2d_manufactured
    A, b, xex = poisson_2d_manufactured(16)
    x, it, rr = capi.dcsr_krylov_amg(A.nrow, A.indptr, A.indices, A.data, b,
                                     tol=1e-10, maxit=200)
    assert np.abs(x - xex).max() < 1e-8
    x2, _, _ = capi.dcsr_krylov_ilu(A.nrow, A.indptr, A.indices, A.data, b,
                                    tol=1e-10, maxit=300)
    assert np.abs(x2 - xex).max() < 1e-8


def test_ilutp_pivoted_preconditioner(refdata):
    """Pivoted ILU must solve the driven-cavity problem where unpivoted
    ILU factorizations break down (perm handling verified against
    scipy.spilu.solve)."""
    from faspsolver_tpu.io import read_mtx
    from faspsolver_tpu.utils.params import ILUParam
    from faspsolver_tpu.constants import ILUType
    rng = np.random.default_rng(17)
    A = read_mtx(f"{refdata}/e05r0500.mtx")
    sol = rng.standard_normal(A.nrow)
    b = A.matvec(sol)
    r = solvers.krylov_ilu(
        A, b, its=ITSParam(itsolver_type=int(SolverType.VGMRES),
                           tol=1e-12, maxit=500, restart=60),
        ilu=ILUParam(ILU_type=int(ILUType.ILUTP), ILU_droptol=1e-4))
    assert bool(r.converged)
    assert np.abs(np.asarray(r.x) - sol).max() < 1e-6
