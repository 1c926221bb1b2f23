from .blc import BLCMatrix
from .bsr import BSRMatrix
from .csr import CSRMatrix, spgemm
from .str_grid import STRMatrix

__all__ = ["BLCMatrix", "BSRMatrix", "CSRMatrix", "STRMatrix", "spgemm"]
