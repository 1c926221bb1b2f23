"""STR-native banded-block ILU(0)/(1) (r3 verdict item 7).

Reference: fasp_ilu_dstr_setup0/setup1 (BlaILUSetupSTR.c:1282) factorize
the dSTR bands with nc x nc blocks; fasp_precond_dstr_ilu0/1 (PreSTR.c)
apply.  Here setup is banded-block wavefront elimination in band space —
``setup_str_ilu`` never calls ``A.to_csr()`` — and the apply rides the
batched BLOCK level-scheduled solver.
"""
import numpy as np
import jax.numpy as jnp

from faspsolver_tpu.formats.str_grid import STRMatrix
from faspsolver_tpu.precond.str_precond import (_band_ilu_pattern,
                                                setup_str_ilu,
                                                str_ilu_factor_banded)

RNG = np.random.default_rng(7)


def _make_str(nx=10, ny=8, nc=2, seed=0):
    rng = np.random.default_rng(seed)
    ng = nx * ny
    diag = np.tile(np.eye(nc) * 4.2, (ng, 1, 1)) \
        + 0.1 * rng.standard_normal((ng, nc, nc))

    def band(mask):
        b = -1.0 * np.tile(np.eye(nc), (ng, 1, 1)) \
            + 0.05 * rng.standard_normal((ng, nc, nc))
        return b * mask[:, None, None]

    mp = np.ones(ng)
    mp[np.arange(ng) % nx == nx - 1] = 0
    mm = np.ones(ng)
    mm[np.arange(ng) % nx == 0] = 0
    return STRMatrix(nx=nx, ny=ny, nz=1, nc=nc, diag=diag,
                     offsets=(1, -1, nx, -nx),
                     offdiag=[band(mp), band(mm), band(np.ones(ng)),
                              band(np.ones(ng))])


def _bands_to_dense(bands, ng, nc, pred):
    n = ng * nc
    M = np.zeros((n, n))
    for o, blk in bands.items():
        if not pred(o):
            continue
        for g in range(ng):
            h = g + o
            if 0 <= h < ng:
                M[g * nc:(g + 1) * nc, h * nc:(h + 1) * nc] = blk[g]
    return M


def test_ilu0_exact_on_pattern():
    """The defining ILU(0) property: (L U)_ij == A_ij on A's pattern."""
    A = _make_str()
    bands, _ = str_ilu_factor_banded(A, 0)
    ng, nc = A.ngrid, A.nc
    L = _bands_to_dense(bands, ng, nc, lambda o: o < 0) + np.eye(ng * nc)
    U = _bands_to_dense(bands, ng, nc, lambda o: o >= 0)
    Ad = A.to_csr().to_scipy().toarray()
    err = np.abs(L @ U - Ad)[Ad != 0].max()
    assert err < 1e-12


def test_apply_parity_with_expanded_csr_ilu0():
    """For nc=1 the banded-block ILU(0) IS scalar ILU(0): the apply must
    match the expanded-CSR native factorization exactly."""
    from faspsolver_tpu.constants import ILUType
    from faspsolver_tpu.precond.ilu import setup_ilu
    from faspsolver_tpu.utils.params import ILUParam
    A = _make_str(nc=1, seed=3)
    M_band = setup_str_ilu(A, fill=0, dtype=jnp.float64)
    M_csr = setup_ilu(A.to_csr(), ILUParam(ILU_type=int(ILUType.ILUK),
                                           ILU_lfil=0), dtype=jnp.float64)
    r = RNG.standard_normal(A.nrow)
    np.testing.assert_allclose(np.asarray(M_band(jnp.asarray(r))),
                               np.asarray(M_csr(jnp.asarray(r))),
                               rtol=0, atol=1e-11)


def test_block_apply_inverts_factors():
    """The batched block solves really compute U^{-1} L^{-1} r (dense
    ground truth) for nc=2."""
    A = _make_str()
    bands, _ = str_ilu_factor_banded(A, 0)
    ng, nc = A.ngrid, A.nc
    L = _bands_to_dense(bands, ng, nc, lambda o: o < 0) + np.eye(ng * nc)
    U = _bands_to_dense(bands, ng, nc, lambda o: o >= 0)
    M = setup_str_ilu(A, fill=0, dtype=jnp.float64)
    r = RNG.standard_normal(A.nrow)
    zref = np.linalg.solve(U, np.linalg.solve(L, r))
    np.testing.assert_allclose(np.asarray(M(jnp.asarray(r))), zref,
                               rtol=0, atol=1e-11)


def test_ilu1_pattern_and_convergence():
    """ILU(1) adds exactly the level-1 fill offsets (via the pivot row's
    U part) and must not converge slower than ILU(0)."""
    from faspsolver_tpu.krylov import gmres
    from faspsolver_tpu.ops import device_operator
    A = _make_str()
    p0, _ = _band_ilu_pattern(A.offsets, 0)
    p1, _ = _band_ilu_pattern(A.offsets, 1)
    assert set(p0) < set(p1)
    assert set(p1) - set(p0) == {-(A.nx - 1), A.nx - 1}
    Ac = A.to_csr()
    op = device_operator(Ac, dtype=jnp.float64)
    b = Ac.matvec(np.ones(Ac.nrow))
    M0 = setup_str_ilu(A, fill=0, dtype=jnp.float64)
    M1 = setup_str_ilu(A, fill=1, dtype=jnp.float64)
    r0 = gmres(op, jnp.asarray(b), M=M0, tol=1e-10, maxit=300, restart=30)
    r1 = gmres(op, jnp.asarray(b), M=M1, tol=1e-10, maxit=300, restart=30)
    assert bool(r0.converged) and bool(r1.converged)
    assert int(r1.iters) <= int(r0.iters)


def test_setup_never_expands_a(monkeypatch):
    """The verdict criterion verbatim: no to_csr() in the ILU(0)/(1)
    setup path."""
    A = _make_str()

    def boom(self):
        raise AssertionError("setup_str_ilu must not expand A to CSR")

    monkeypatch.setattr(STRMatrix, "to_csr", boom)
    M = setup_str_ilu(A, fill=1, dtype=jnp.float64)
    z = np.asarray(M(jnp.asarray(RNG.standard_normal(A.nrow))))
    assert np.all(np.isfinite(z))
