from .readers import (matrix_read, read_bsr, read_coo, read_csr, read_csrvec,
                      read_mtx, read_str, read_vec, read_vecind)
from .writers import write_bsr, write_coo, write_csr, write_vec, write_vecind

__all__ = [
    "matrix_read", "read_bsr", "read_coo", "read_csr", "read_csrvec",
    "read_mtx", "read_str", "read_vec", "read_vecind",
    "write_bsr", "write_coo", "write_csr", "write_vec", "write_vecind",
]
