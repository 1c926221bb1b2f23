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


def test_const_stencil_pallas_interpret_matches_xla():
    """The HBM-regime constant-stencil Pallas kernel (interpret mode on
    CPU) must match the XLA shifted-add path bit-for-bit-ish."""
    import jax.numpy as jnp

    from faspsolver_tpu.ops.pallas_kernels import const_stencil_apply_2d

    ny, nx = 96, 256
    rng = np.random.default_rng(3)
    x = rng.standard_normal(ny * nx).astype(np.float32)
    coords = ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0), (1, 1))
    cvals = np.array([-0.25, -0.24, 1.01, -0.26, -0.23, 0.05], np.float32)
    y = np.asarray(const_stencil_apply_2d(
        jnp.asarray(cvals[:, None]), coords, (ny, nx), jnp.asarray(x),
        interpret=True))
    v = x.reshape(ny, nx)
    vp = np.pad(v, 1)
    yr = np.zeros_like(v)
    for c, (dy, dx) in zip(cvals, coords):
        yr += c * vp[1 + dy:1 + dy + ny, 1 + dx:1 + dx + nx]
    assert np.abs(y - yr.reshape(-1)).max() < 1e-5


def test_refiner_cast_b_f32_upload():
    """cast_b=True: the packed resident refiner accepts an f32 b, promotes
    on device, and still converges to tol=1e-6 (exact-b verification)."""
    import jax
    import jax.numpy as jnp

    from faspsolver_tpu.precond.amg import setup_structured
    from faspsolver_tpu.solvers.refine import make_resident_refiner_packed
    from faspsolver_tpu.testgen import poisson_2d
    from faspsolver_tpu.utils.params import AMGParam

    A = poisson_2d(63)
    b = A.matvec(np.ones(A.nrow))
    hier = setup_structured(A, AMGParam(coarse_dof=100), dtype=jnp.float32,
                            smooth_p=True, keep_f64_fine=True, pack=True)
    assert hier is not None and hier.p64 is not None
    runner = make_resident_refiner_packed(hier, tol=1e-6, max_rounds=4,
                                          maxit_inner=40, cast_b=True)
    comp = runner.compile(jax.ShapeDtypeStruct((A.nrow,), jnp.float32))
    x, rr, rnd, it = comp(jnp.asarray(b, jnp.float32))
    ver = float(np.linalg.norm(b - A.matvec(np.asarray(x)))
                / np.linalg.norm(b))
    assert ver < 1e-6
