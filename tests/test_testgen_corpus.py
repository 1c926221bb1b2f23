"""Benchmark-corpus generator families (testgen/fdm.py additions) and the
structural conformance stand-ins (testgen/structural.py)."""
import numpy as np
import scipy.sparse.linalg as spla

from faspsolver_tpu.testgen import (anisotropic_2d, anisotropic_3d,
                                    convdiff_2d, jump_2d, stretched_2d)
from faspsolver_tpu.testgen.structural import (plate_stress_syn,
                                               shell_stress_syn)


def _direct_err(A):
    b = A.matvec(np.ones(A.nrow))
    x = spla.spsolve(A.to_scipy().tocsc(), b)
    return np.abs(x - 1.0).max()


def test_symmetric_families_spd_and_consistent():
    for A in (anisotropic_2d(31, 1e-3), anisotropic_3d(9, 1e-2, 1e2),
              jump_2d(31, 1e4), stretched_2d(31, 100.0)):
        m = A.to_scipy()
        assert abs(m - m.T).max() < 1e-10
        assert (A.diagonal() > 0).all()
        assert _direct_err(A) < 1e-8


def test_convdiff_nonsymmetric_m_matrix():
    A = convdiff_2d(31, 40.0, 20.0)
    m = A.to_scipy()
    assert abs(m - m.T).max() > 1.0          # genuinely nonsymmetric
    off = m.tocoo()
    mask = off.row != off.col
    assert (off.data[mask] <= 1e-12).all()   # upwind keeps M-matrix sign
    assert _direct_err(A) < 1e-8


def test_jump_harmonic_flux_continuity():
    """The FV scheme must reproduce the exact piecewise-linear solution
    of a 1-D-in-x jump problem (harmonic averaging is what makes that
    work)."""
    A = jump_2d(31, 1e3)
    assert _direct_err(A) < 1e-8             # constant solution exact


def test_structural_standins_size_and_conditioning():
    Ap = plate_stress_syn()
    As = shell_stress_syn()
    # bcsstk16: n=4884; s2rmq4m1: n=5489 (regression_mm.c:115-321)
    assert abs(Ap.nrow - 4884) < 200
    assert abs(As.nrow - 5489) < 200
    for A in (Ap, As):
        m = A.to_scipy()
        assert abs(m - m.T).max() == 0.0
        lmin = spla.eigsh(m, k=1, sigma=0, which="LM",
                          return_eigenvectors=False)[0]
        assert lmin > 0                       # SPD
    # conditioning regimes: moderate vs ~1e8 (scaled-shell class)
    def cond(A):
        m = A.to_scipy()
        lmax = spla.eigsh(m, k=1, which="LA",
                          return_eigenvectors=False, maxiter=5000)[0]
        lmin = spla.eigsh(m, k=1, sigma=0, which="LM",
                          return_eigenvectors=False)[0]
        return lmax / lmin
    assert cond(Ap) < 1e6
    assert cond(As) > 1e7
