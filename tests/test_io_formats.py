"""I/O readers + container tests against the shipped reference data corpus."""
import numpy as np
import pytest

from faspsolver_tpu.formats import BSRMatrix, CSRMatrix
from faspsolver_tpu.io import (read_bsr, read_csr, read_csrvec, read_mtx,
                               read_vec, read_vecind, write_bsr, write_csr,
                               write_vec)
from faspsolver_tpu.testgen import poisson_2d


def test_read_fd_corpus(refdata):
    A, b = read_csrvec(f"{refdata}/csrmat_FD.dat", f"{refdata}/rhs_FD.dat")
    assert A.shape == (100, 100)
    sol = read_vecind(f"{refdata}/sol_FD.dat")
    assert sol.shape == (100,)
    # shipped solution satisfies A sol ~= b
    r = b - A.matvec(sol)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_read_fe_corpus(refdata):
    A, b = read_csrvec(f"{refdata}/csrmat_FE.dat", f"{refdata}/rhs_FE.dat")
    assert A.shape == (3969, 3969)
    sol = read_vecind(f"{refdata}/sol_FE.dat")
    r = b - A.matvec(sol)
    # shipped sol_FE.dat is stored to ~8 significant digits
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-5
    assert A.is_symmetric(1e-10)


def test_read_bsr_spe01(refdata):
    A = read_bsr(f"{refdata}/bsrmat_SPE01.dat")
    assert A.shape == (302, 302)
    assert A.nb == 3
    assert A.nnz_block == 1788
    b = read_vec(f"{refdata}/rhs_SPE01.dat")
    assert len(b) == A.nrow == 906
    y = A.matvec(b)
    assert np.all(np.isfinite(y))
    # CSR expansion agrees with block matvec
    Ac = A.to_csr()
    np.testing.assert_allclose(Ac.matvec(b), y, rtol=1e-13)


def test_read_mtx(refdata):
    A = read_mtx(f"{refdata}/nos7.mtx")
    assert A.shape[0] == A.shape[1] == 729
    assert A.is_symmetric(1e-10)


def test_roundtrip_csr(tmp_path):
    A = poisson_2d(7)
    p = str(tmp_path / "a.dat")
    write_csr(p, A)
    B = read_csr(p)
    np.testing.assert_allclose(A.to_dense(), B.to_dense(), rtol=1e-14)


def test_roundtrip_bsr(tmp_path, refdata):
    A = read_bsr(f"{refdata}/bsrmat_SPE01.dat")
    p = str(tmp_path / "a.bsr")
    write_bsr(p, A)
    B = read_bsr(p)
    np.testing.assert_allclose(A.data, B.data, rtol=1e-14)
    np.testing.assert_array_equal(A.indices, B.indices)


def test_csr_container_ops():
    A = poisson_2d(5)
    At = A.transpose()
    np.testing.assert_allclose(A.to_dense().T, At.to_dense())
    d = A.diagonal()
    assert np.all(d > 0)
    A.validate()
    assert A.is_symmetric()
    assert A.check_diag_positive() == A.nrow


def test_csr_multicolor():
    A = poisson_2d(8)
    colors, counts = A.multicolor()
    # adjacency constraint: no two neighbors share a color
    for i in range(A.nrow):
        for j in A.indices[A.indptr[i]:A.indptr[i + 1]]:
            if i != j:
                assert colors[i] != colors[j]
    # 5-point stencil graph (with diagonal) is 2-colorable
    assert counts.sum() == A.nrow
    assert len(counts) <= 3


def test_bsr_condense_diaginv(refdata):
    A = read_bsr(f"{refdata}/bsrmat_SPE01.dat")
    C = A.condense()
    assert C.shape == (302, 302)
    dinv = A.diag_inv()
    d = A.diag_blocks()
    eye = np.einsum("nij,njk->nik", dinv, d)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-10)


def test_bsr_csr_roundtrip():
    A = poisson_2d(6)
    # build a BSR with nb=2 from a 72x72 CSR
    import scipy.sparse as sp
    big = sp.kron(A.to_scipy(), np.array([[2.0, 1.0], [0.5, 3.0]])).tocsr()
    Ab = BSRMatrix.from_csr(CSRMatrix.from_scipy(big), nb=2)
    x = np.random.default_rng(0).standard_normal(Ab.nrow)
    np.testing.assert_allclose(Ab.matvec(x), big @ x, rtol=1e-13)


def _hb_text(mxtype, nrow, ncol, colptr, rowind, vals, rhs=None):
    """Minimal fixed-format Harwell-Boeing writer for tests."""
    nnz = len(vals)

    def wrap(s, w):
        return "\n".join(s[i:i + w] for i in range(0, len(s), w))

    ptr_l = wrap("".join(f"{v:5d}" for v in colptr), 80)
    ind_l = wrap("".join(f"{v:5d}" for v in rowind), 80)
    val_l = wrap("".join(f"{v:12.4E}" for v in vals), 72)
    ptrcrd = ptr_l.count("\n") + 1
    indcrd = ind_l.count("\n") + 1
    valcrd = val_l.count("\n") + 1
    rhs_l, rhscrd = "", 0
    if rhs is not None:
        rhs_l = wrap("".join(f"{v:12.4E}" for v in rhs), 72)
        rhscrd = rhs_l.count("\n") + 1
    tot = ptrcrd + indcrd + valcrd + rhscrd
    hdr = (f"{'Test matrix':<72}{'TEST':<8}\n"
           f"{tot:14d}{ptrcrd:14d}{indcrd:14d}{valcrd:14d}{rhscrd:14d}\n"
           f"{mxtype:<14}{nrow:14d}{ncol:14d}{nnz:14d}{0:14d}\n"
           f"{'(16I5)':<16}{'(16I5)':<16}{'(6E12.4)':<20}{'(6E12.4)':<20}\n")
    if rhscrd:
        hdr += f"{'F':<14}{1:14d}{0:14d}\n"
    body = ptr_l + "\n" + ind_l + "\n" + val_l + "\n"
    if rhscrd:
        body += rhs_l + "\n"
    return hdr + body


def test_read_hb_symmetric_expands(tmp_path):
    """RSA stores one triangle; the reader must expand it keyed on the
    header's mxtype (BlaIO.c:2340), and return the rhs section."""
    from faspsolver_tpu.io.readers import read_hb
    p = tmp_path / "m.rsa"
    p.write_text(_hb_text("RSA", 3, 3, [1, 3, 5, 6], [1, 2, 2, 3, 3],
                          [4., -1., 4., -1., 4.], rhs=[1., 2., 3.]))
    A, b = read_hb(str(p))
    np.testing.assert_allclose(
        A.to_dense(), [[4, -1, 0], [-1, 4, -1], [0, -1, 4]])
    np.testing.assert_allclose(b, [1., 2., 3.])


def test_read_hb_general_triangular_untouched(tmp_path):
    """A genuinely triangular RUA (general) matrix must NOT be
    symmetrized — regression for the mxtype-vs-heuristic advisory."""
    from faspsolver_tpu.io.readers import read_hb
    p = tmp_path / "m.rua"
    p.write_text(_hb_text("RUA", 3, 3, [1, 2, 3, 4], [1, 1, 2],
                          [4., -1., -1.]))
    A, b = read_hb(str(p))
    np.testing.assert_allclose(
        A.to_dense(), [[4, -1, 0], [0, 0, -1], [0, 0, 0]])
    assert b is None


def test_write_samg(tmp_path, refdata):
    """SAMG export (reference: XtrSamg.c:145): .frm header + .amg body,
    1-based, diagonal-first rows."""
    from faspsolver_tpu.io import read_csrvec, write_samg
    A, _ = read_csrvec(f"{refdata}/csrmat_FD.dat", f"{refdata}/rhs_FD.dat")
    base = str(tmp_path / "fd")
    write_samg(base, A)
    frm = open(base + ".frm").read().split()
    assert frm[0] == "f" and int(frm[1]) == 4
    nnz, n, mtype = int(frm[2]), int(frm[3]), int(frm[4])
    assert n == A.nrow and nnz == A.nnz
    assert mtype in (11, 12, 21, 22)
    body = [float(x) for x in open(base + ".amg").read().split()]
    indptr = np.array(body[:n + 1], dtype=np.int64) - 1
    cols = np.array(body[n + 1:n + 1 + nnz], dtype=np.int64) - 1
    vals = np.array(body[n + 1 + nnz:])
    assert indptr[0] == 0 and indptr[-1] == nnz
    # diagonal first in each row; matrix reconstructs exactly
    import scipy.sparse as sp
    m = sp.csr_matrix((vals, cols, indptr), shape=A.shape)
    assert (abs(m - A.to_scipy()) > 0).nnz == 0
    for i in range(n):
        if indptr[i] < indptr[i + 1]:
            assert cols[indptr[i]] == i
