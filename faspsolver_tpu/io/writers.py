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
