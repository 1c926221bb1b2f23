"""STR Schwarz smoother (reference: fasp_smoother_dstr_swz,
ItrSmootherSTR.c:1665 + fasp_generate_diaginv_block :1565)."""
import numpy as np
import jax.numpy as jnp
import pytest

from faspsolver_tpu.formats.str_grid import STRMatrix
from faspsolver_tpu.precond.str_precond import (setup_str_diag,
                                                setup_str_schwarz)


def _poisson_str(nx, ny=1, nc=1, seed=0):
    """Block 5-point (or 3-point) Poisson-like STR system."""
    rng = np.random.default_rng(seed)
    ng = nx * ny
    base = 4.0 if ny > 1 else 2.0
    diag = np.stack([base * np.eye(nc) + 0.1 * rng.standard_normal((nc, nc))
                     for _ in range(ng)])
    diag = 0.5 * (diag + diag.transpose(0, 2, 1)) + base * np.eye(nc)
    offsets = []
    offdiag = []
    for off in ([-1, 1] if ny == 1 else [-nx, -1, 1, nx]):
        band = np.zeros((ng, nc, nc))
        for g in range(ng):
            t = g + off
            if t < 0 or t >= ng:
                continue
            if abs(off) == 1 and (g % nx) + off not in range(nx):
                continue                      # no row wrap
            band[g] = -np.eye(nc)
        offsets.append(off)
        offdiag.append(band)
    return STRMatrix(nx=nx, ny=ny, nz=1, nc=nc, diag=diag,
                     offsets=tuple(offsets), offdiag=offdiag)


def _reference_swz_sweep(A: STRMatrix, b, u0):
    """Literal port of the reference loop (ItrSmootherSTR.c:1665):
    ascending node order, FULL residual refresh after every node."""
    csr = A.to_csr().to_scipy()
    ng, nc = A.ngrid, A.nc
    offs = [0] + [int(o) for o in A.offsets]
    u = u0.copy()
    for i in range(ng):
        r = b - csr @ u
        mem = [i + o for o in offs]
        ok = []
        for s, mval in enumerate(mem):
            if not (0 <= mval < ng):
                ok.append(False)
                continue
            dx = offs[s] if abs(offs[s]) < A.nx else 0
            ok.append((i % A.nx) + dx in range(A.nx)
                      if abs(offs[s]) == 1 else True)
        patch = [mval for mval, o in zip(mem, ok) if o]
        idx = np.concatenate([np.arange(p * nc, (p + 1) * nc)
                              for p in patch])
        Ap = csr[np.ix_(idx, idx)].toarray()
        e = np.linalg.solve(Ap, r[idx])
        u[idx] += e
    return u


def test_singleton_colors_match_reference_sequential():
    """With one node per color (tiny grid), the color-batched sweep IS the
    reference's sequential sweep."""
    A = _poisson_str(3, 1, nc=2, seed=1)
    sm = setup_str_schwarz(A, dtype=np.float64)
    assert all(len(np.asarray(c)) == 1 for c in sm.colors)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(A.nrow)
    ours = np.asarray(sm.smooth(jnp.zeros(A.nrow, jnp.float64),
                                jnp.asarray(b), 1))
    ref = _reference_swz_sweep(A, b, np.zeros(A.nrow))
    assert np.abs(ours - ref).max() < 1e-12


def test_schwarz_converges_faster_than_diag():
    A = _poisson_str(12, 12, nc=2, seed=3)
    csr = A.to_csr().to_scipy()
    rng = np.random.default_rng(4)
    x_exact = rng.standard_normal(A.nrow)
    b = csr @ x_exact

    sm = setup_str_schwarz(A, dtype=np.float64)
    dg = setup_str_diag(A, dtype=np.float64)

    def err_after(precond, sweeps=6):
        x = np.zeros(A.nrow)
        for _ in range(sweeps):
            r = b - csr @ x
            x = x + np.asarray(precond(jnp.asarray(r)))
        return np.linalg.norm(x - x_exact)

    e_swz = err_after(sm)
    e_diag = err_after(lambda r: 0.7 * dg(r))
    assert e_swz < 0.2 * e_diag
    assert e_swz < 0.05 * np.linalg.norm(x_exact)


def test_patch_exact_for_block_diagonal():
    """With no off-diagonal coupling, one sweep solves exactly."""
    A = _poisson_str(4, 1, nc=3, seed=5)
    A = STRMatrix(nx=4, ny=1, nz=1, nc=3, diag=A.diag,
                  offsets=A.offsets,
                  offdiag=[np.zeros_like(b) for b in A.offdiag])
    sm = setup_str_schwarz(A, dtype=np.float64)
    rng = np.random.default_rng(6)
    b = rng.standard_normal(A.nrow)
    x = np.asarray(sm(jnp.asarray(b)))
    csr = A.to_csr().to_scipy()
    assert np.abs(csr @ x - b).max() < 1e-10
