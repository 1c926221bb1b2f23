"""Device operator correctness: ELL / COO / block-ELL / dense vs host matvec."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faspsolver_tpu.formats import CSRMatrix
from faspsolver_tpu.io import read_bsr, read_mtx
from faspsolver_tpu.ops import (BsrEllOperator, CooOperator, DenseOperator,
                                EllOperator, device_operator)
from faspsolver_tpu.testgen import poisson_2d, poisson_3d

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("op_cls", [EllOperator, CooOperator])
def test_csr_operators_match_host(op_cls):
    A = poisson_2d(9)
    x = RNG.standard_normal(A.ncol)
    ref = A.matvec(x)
    op = op_cls.from_csr(A)
    got = np.asarray(jax.jit(lambda o, v: o(v))(op, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-13)


def test_ell_irregular_rows():
    # matrix with highly variable row lengths incl. an empty row
    dense = np.zeros((7, 7))
    dense[0, :] = 1.0
    dense[2, 3] = 5.0
    dense[4, [0, 6]] = [2.0, -1.0]
    A = CSRMatrix.from_dense(dense)
    x = RNG.standard_normal(7)
    for cls in (EllOperator, CooOperator):
        op = cls.from_csr(A)
        np.testing.assert_allclose(np.asarray(op(jnp.asarray(x))), dense @ x,
                                   rtol=1e-13)


def test_bsr_operator_spe01(refdata):
    A = read_bsr(f"{refdata}/bsrmat_SPE01.dat")
    op = BsrEllOperator.from_bsr(A)
    x = RNG.standard_normal(A.nrow)
    ref = A.matvec(x)
    got = np.asarray(jax.jit(lambda o, v: o(v))(op, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_dense_operator():
    A = poisson_2d(4)
    op = DenseOperator.from_csr(A)
    x = RNG.standard_normal(A.ncol)
    np.testing.assert_allclose(np.asarray(op(jnp.asarray(x))), A.matvec(x),
                               rtol=1e-13)


def test_device_operator_dispatch(refdata):
    small = poisson_2d(4)            # 16 dof -> dense
    assert isinstance(device_operator(small), DenseOperator)
    big = poisson_3d(12)             # banded stencil -> DIA (gather-free)
    from faspsolver_tpu.ops import DiaOperator
    assert isinstance(device_operator(big), DiaOperator)
    assert isinstance(device_operator(big, prefer="ell"), EllOperator)
    mtx = read_mtx(f"{refdata}/nos7.mtx")
    op = device_operator(mtx)
    x = RNG.standard_normal(mtx.ncol)
    np.testing.assert_allclose(np.asarray(op(jnp.asarray(x))), mtx.matvec(x),
                               rtol=1e-11)


def test_operator_is_pytree():
    A = poisson_2d(8)
    op = EllOperator.from_csr(A)
    leaves = jax.tree_util.tree_leaves(op)
    assert len(leaves) == 2  # cols, vals
    # jit with operator as argument compiles and caches
    f = jax.jit(lambda o, v: o(v))
    x = jnp.ones(A.ncol, dtype=op.dtype)
    _ = f(op, x)
    _ = f(op, x + 1)


def test_dia_nd_operator_matches_csr():
    """Grid-aware per-axis-shift SpMV == CSR matvec (2-D and 3-D), and
    the structured hierarchy's fine operator is the nd form."""
    import jax.numpy as jnp
    from faspsolver_tpu.ops import DiaNdOperator
    from faspsolver_tpu.precond.amg.band_algebra import BandMatrix
    from faspsolver_tpu.testgen import poisson_2d, poisson_3d
    rng = np.random.default_rng(5)
    for A, dims in ((poisson_2d(13, 9), (9, 13)),
                    (poisson_3d(6, 5, 4), (4, 5, 6))):
        B = BandMatrix.from_csr(A, dims)
        op = B.to_nd_operator()
        assert isinstance(op, DiaNdOperator)
        x = rng.standard_normal(A.nrow)
        np.testing.assert_allclose(np.asarray(op(jnp.asarray(x))),
                                   A.matvec(x), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(op.diagonal()), A.diagonal(),
                                   rtol=1e-14)
