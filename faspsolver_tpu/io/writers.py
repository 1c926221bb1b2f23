"""Writers matching the reference on-disk formats (round-trip with readers).

Reference: base/src/BlaIO.c writer family (:1079-1700).
"""
from __future__ import annotations

import numpy as np

from ..formats import BSRMatrix, CSRMatrix


def write_csr(path: str, A: CSRMatrix, one_based: bool = True) -> None:
    """(reference: fasp_dcsr_write)."""
    off = 1 if one_based else 0
    with open(path, "w") as fh:
        fh.write(f"{A.nrow}\n")
        for v in A.indptr:
            fh.write(f"{int(v) + off}\n")
        for v in A.indices:
            fh.write(f"{int(v) + off}\n")
        for v in A.data:
            fh.write(f"{v:.16e}\n")


def write_coo(path: str, A: CSRMatrix) -> None:
    """(reference: fasp_dcoo_write)."""
    m = A.to_scipy().tocoo()
    with open(path, "w") as fh:
        fh.write(f"{A.nrow} {A.ncol} {A.nnz}\n")
        for i, j, v in zip(m.row, m.col, m.data):
            fh.write(f"{i} {j} {v:.16e}\n")


def write_bsr(path: str, A: BSRMatrix) -> None:
    """(reference: fasp_dbsr_write)."""
    with open(path, "w") as fh:
        fh.write(f"{A.nrow_block} {A.ncol_block} {A.nnz_block}\n")
        fh.write(f"{A.nb}\n0\n")
        fh.write(f"{len(A.indptr)}\n")
        for v in A.indptr:
            fh.write(f"{int(v)}\n")
        fh.write(f"{A.nnz_block}\n")
        for v in A.indices:
            fh.write(f"{int(v)}\n")
        flat = A.data.reshape(-1)
        fh.write(f"{len(flat)}\n")
        for v in flat:
            fh.write(f"{v:.16e}\n")


def write_vec(path: str, b: np.ndarray) -> None:
    """(reference: fasp_dvec_write)."""
    with open(path, "w") as fh:
        fh.write(f"{len(b)}\n")
        for v in b:
            fh.write(f"{v:.16e}\n")


def write_vecind(path: str, b: np.ndarray) -> None:
    """(reference: fasp_dvecind_write)."""
    with open(path, "w") as fh:
        fh.write(f"{len(b)}\n")
        for i, v in enumerate(b):
            fh.write(f"{i} {v:.16e}\n")


def write_mtx(path: str, A: CSRMatrix) -> None:
    """MatrixMarket coordinate writer (reference: BlaIO.c writers)."""
    m = A.to_scipy().tocoo()
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{A.nrow} {A.ncol} {A.nnz}\n")
        for i, j, v in zip(m.row, m.col, m.data):
            f.write(f"{i + 1} {j + 1} {v:.16e}\n")


def write_str(path: str, A) -> None:
    """STR banded writer (reference: fasp_dstr_write, BlaIO.c).  Bands are
    stored compactly: only the (ngrid - |offset|) valid block rows."""
    with open(path, "w") as f:
        f.write(f"{A.nx} {A.ny} {A.nz}\n{A.nc}\n{A.nband}\n")
        ng, nc = A.ngrid, A.nc
        f.write(f"{ng * nc * nc}\n")
        for v in A.diag.reshape(-1):
            f.write(f"{v:.16e}\n")
        for off, band in zip(A.offsets, A.offdiag):
            valid = band[:ng - off] if off > 0 else band[-off:]
            f.write(f"{off} {valid.size}\n")
            for v in valid.reshape(-1):
                f.write(f"{v:.16e}\n")


def write_coovec_bin(matpath: str, A: CSRMatrix, rhspath: str = None,
                     b=None, endian: str = "little") -> None:
    """Binary COO (+rhs) writer, endian-parameterized (reference:
    BlaIO.c binary writers + AuxConvert.c)."""
    import numpy as np
    sw = "<" if endian == "little" else ">"
    m = A.to_scipy().tocoo()
    with open(matpath, "wb") as f:
        np.asarray([A.nrow, A.nnz], dtype=sw + "i4").tofile(f)
        rec = np.empty(A.nnz, dtype=np.dtype(
            [("i", sw + "i4"), ("j", sw + "i4"), ("v", sw + "f8")]))
        rec["i"], rec["j"], rec["v"] = m.row, m.col, m.data
        rec.tofile(f)
    if rhspath is not None and b is not None:
        with open(rhspath, "wb") as f:
            np.asarray([len(b)], dtype=sw + "i4").tofile(f)
            np.asarray(b, dtype=sw + "f8").tofile(f)
