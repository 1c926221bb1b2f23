"""Constant-band compression (scalar x bitmask encoding).

Grid-born AMG data is constant along diagonals away from boundaries:
coarse Galerkin bands, banded-P weights, smoother inverse diagonals.
The encodings here must be EXACT — bit-identical applies for perfectly
constant bands (any dtype), exact COO demotion for near-constant bands
(f32 performance mode only, so f64 conformance goldens never move).
"""
import numpy as np
import jax.numpy as jnp

from faspsolver_tpu.ops.operators import (ConstDiaOperator, DiaOperator,
                                          SumOperator, best_operator,
                                          pack_bits, unpack_bits,
                                          unpack_bits_np)

RNG = np.random.default_rng(3)


def test_pack_unpack_roundtrip():
    for n in (1, 31, 32, 33, 4097):
        m = RNG.random(n) < 0.5
        words = pack_bits(m)
        np.testing.assert_array_equal(unpack_bits_np(words, n), m)
        dev = np.asarray(unpack_bits(jnp.asarray(words), n, jnp.float64))
        np.testing.assert_array_equal(dev, m.astype(np.float64))


def test_const_dia_matches_full_dia():
    n = 8192
    offs = (-64, -1, 0, 1, 64)
    bands = np.zeros((5, n))
    for k, (off, c) in enumerate(zip(offs, (-1.0, -1.0, 4.0, -1.0, -1.0))):
        mask = RNG.random(n) < 0.7
        lo, hi = max(0, -off), min(n, n - off)
        valid = np.zeros(n, dtype=bool)
        valid[lo:hi] = True
        bands[k] = np.where(mask & valid, c, 0.0)
    full = DiaOperator(jnp.asarray(bands), offs, n)
    cop = ConstDiaOperator(
        jnp.asarray(np.array([-1.0, -1.0, 4.0, -1.0, -1.0])),
        jnp.asarray(np.stack([pack_bits(bands[k] != 0)
                              for k in range(5)])), offs, n)
    x = RNG.standard_normal(n)
    yf = np.asarray(full(jnp.asarray(x)))
    yc = np.asarray(cop(jnp.asarray(x)))
    # bit-identical: the mask multiply is exact 0/1
    np.testing.assert_array_equal(yf, yc)
    np.testing.assert_array_equal(np.asarray(full.diagonal()),
                                  np.asarray(cop.diagonal()))


def test_best_operator_compresses_coarse_fe_level():
    """The first Galerkin coarse level of the FE Poisson hierarchy must
    take the constant-band encoding, exactly."""
    from faspsolver_tpu.constants import CGPT
    from faspsolver_tpu.precond.amg.coarsen_rs import coarsen
    from faspsolver_tpu.precond.amg.interp import interpolate
    from faspsolver_tpu.precond.amg.setup_rs import _rap
    from faspsolver_tpu.testgen import assemble_poisson, unit_square_mesh
    from faspsolver_tpu.utils.params import AMGParam

    mesh = unit_square_mesh(96)
    A, _, _ = assemble_poisson(mesh, lambda p: np.ones(len(p)))
    p = AMGParam()
    marker, S = coarsen(A, theta=p.strong_threshold,
                        max_row_sum=p.max_row_sum, method="rs")
    P = interpolate(A, marker, S, interp_type=p.interpolation_type,
                    trunc_threshold=p.truncation_threshold)
    Ac = _rap(P, A, P.transpose())
    # f32 performance mode: the ~1e-10 f64 summation noise around each
    # band constant vanishes under the cast, so compression engages
    op = best_operator(Ac, dtype=jnp.float32)
    assert isinstance(op, (SumOperator, ConstDiaOperator)) or (
        hasattr(op, "dia")
        and isinstance(op.dia, (SumOperator, ConstDiaOperator)))
    x = RNG.standard_normal(Ac.nrow)
    np.testing.assert_allclose(np.asarray(op(jnp.asarray(x, jnp.float32))),
                               Ac.matvec(x), rtol=0, atol=2e-5)
    # f64 conformance mode stays bit-strict: full bands, exact apply
    op64 = best_operator(Ac, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(op64(jnp.asarray(x))),
                               Ac.matvec(x), rtol=0, atol=1e-11)


def test_banded_transfer_const_mode_exact():
    """The fine-level FE P is perfectly constant per shift: const_mode
    engages in f64 and the apply matches scipy exactly."""
    from faspsolver_tpu.constants import CGPT
    from faspsolver_tpu.precond.amg.coarsen_rs import coarsen
    from faspsolver_tpu.precond.amg.interp import interpolate
    from faspsolver_tpu.precond.amg.transfer import banded_transfer
    from faspsolver_tpu.testgen import assemble_poisson, unit_square_mesh
    from faspsolver_tpu.utils.params import AMGParam

    mesh = unit_square_mesh(64)
    A, _, _ = assemble_poisson(mesh, lambda p: np.ones(len(p)))
    p = AMGParam()
    marker, S = coarsen(A, theta=p.strong_threshold,
                        max_row_sum=p.max_row_sum, method="rs")
    P = interpolate(A, marker, S, interp_type=p.interpolation_type,
                    trunc_threshold=p.truncation_threshold)
    fpos = np.flatnonzero(marker == CGPT)
    Pop, Rop = banded_transfer(P, fpos, dtype=jnp.float64)
    assert Pop.const_mode and Rop.const_mode
    assert Pop.w.shape[1] == 1                 # dummy, not (k, n)
    xc = RNG.standard_normal(P.shape[1])
    xf = RNG.standard_normal(P.shape[0])
    sp = P.to_scipy()
    np.testing.assert_allclose(np.asarray(Pop(jnp.asarray(xc))),
                               sp @ xc, rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(Rop(jnp.asarray(xf))),
                               sp.T @ xf, rtol=0, atol=1e-13)


def test_f32_exception_demotion_exact():
    """f32 mode: near-constant bands demote non-modal entries to the COO
    remainder — the encoding stays EXACT vs the csr P (f32 rounding
    only)."""
    import scipy.sparse as sp
    from faspsolver_tpu.formats import CSRMatrix
    from faspsolver_tpu.precond.amg.transfer import banded_transfer

    nf, nc = 8192, 4096
    fpos = np.arange(0, nf, 2)
    rows = np.arange(nf)
    cols = np.minimum(rows // 2, nc - 1)
    vals = np.full(nf, 0.5)
    exc = RNG.choice(nf, size=100, replace=False)
    vals[exc] = 0.123                          # 1.2% exceptions
    M = sp.csr_matrix((vals, (rows, cols)), shape=(nf, nc))
    P = CSRMatrix.from_scipy(M)
    out = banded_transfer(P, fpos, dtype=jnp.float32)
    assert out is not None
    Pop, _ = out
    assert Pop.const_mode
    assert Pop.has_rem                         # demoted exceptions
    xc = RNG.standard_normal(nc)
    y = np.asarray(Pop(jnp.asarray(xc, jnp.float32)))
    np.testing.assert_allclose(y, M @ xc, rtol=0, atol=1e-5)


def test_smoother_dinv_compacts_for_constant_diag():
    from faspsolver_tpu.constants import SmootherType
    from faspsolver_tpu.precond.amg.smoothers import build_smoother
    from faspsolver_tpu.testgen import poisson_2d

    A = poisson_2d(48)                         # constant diagonal
    sm = build_smoother(A, int(SmootherType.JACOBI), dtype=jnp.float64)
    assert sm.dinv.shape == (1,)
    r = RNG.standard_normal(A.nrow)
    z = np.asarray(sm.dinv * jnp.asarray(r))   # broadcasts
    np.testing.assert_allclose(z, r / A.diagonal()[0], rtol=1e-15)
