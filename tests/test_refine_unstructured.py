"""Device-resident f64 refinement on genuinely UNSTRUCTURED matrices
(r3 verdict item 8): when the fine level is not grid-detectable,
``keep_f64_fine`` must still attach an f64 fine operator (adaptive
ELL-class format) so ``make_resident_refiner_packed`` works instead of
raising and forcing the host-loop refiner.

Reference: REAL=double throughout (fasp.h:75) — resident refinement is
how the f32 performance mode matches that accuracy for any input.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from faspsolver_tpu.precond.amg.setup_rs import setup_rs
from faspsolver_tpu.solvers.refine import make_resident_refiner_packed
from faspsolver_tpu.utils.params import AMGParam

REFDATA = "/root/reference/data"


def _unstructured_fe():
    """The shipped FE matrix is unstructured-ORDERED (5795 distinct
    offsets) — the exact case the compressed-stencil fine64 declines."""
    from faspsolver_tpu.io import read_csrvec
    return read_csrvec(f"{REFDATA}/csrmat_FE.dat", f"{REFDATA}/rhs_FE.dat")


@pytest.mark.skipif(not os.path.exists(f"{REFDATA}/csrmat_FE.dat"),
                    reason="reference data not available")
def test_resident_refiner_unstructured_mtx():
    A, b = _unstructured_fe()
    # not grid-detectable: the distinct-offset count is way over the
    # 36-band DIA bound, so the stencil/banded fine64 must decline...
    rows = np.repeat(np.arange(A.nrow, dtype=np.int64), np.diff(A.indptr))
    n_offs = np.unique(A.indices.astype(np.int64) - rows).size
    assert n_offs > 36

    h = setup_rs(A, AMGParam(coarse_dof=100), dtype=jnp.float32,
                 keep_f64_fine=True, pack=True)
    # ...and the general fallback must still hand the refiner an f64 op
    assert h.p64 is not None

    runner = make_resident_refiner_packed(h, tol=1e-8, max_rounds=8,
                                          maxit_inner=40)
    x, relres, rounds, iters = runner(jnp.asarray(b))
    verified = float(np.linalg.norm(b - A.matvec(np.asarray(x)))
                     / np.linalg.norm(b))
    assert verified < 1e-8
    assert int(rounds) >= 1


def test_unstructured_fine64_is_f64_and_matches_host():
    """The fallback fine64 is a true f64 operator: its apply matches the
    host CSR matvec to f64 accuracy (not f32)."""
    if not os.path.exists(f"{REFDATA}/csrmat_FE.dat"):
        pytest.skip("reference data not available")
    import jax
    A, _ = _unstructured_fe()
    h = setup_rs(A, AMGParam(coarse_dof=100), dtype=jnp.float32,
                 keep_f64_fine=True, pack=True)
    hier = h.materialize()
    op64 = hier.fine64
    assert op64 is not None and op64.dtype == jnp.float64
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.nrow)
    y = np.asarray(op64(jnp.asarray(x)))
    np.testing.assert_allclose(y, A.matvec(x), rtol=1e-13, atol=1e-12)
