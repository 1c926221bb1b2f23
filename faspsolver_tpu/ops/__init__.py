from .blas1 import (axpby, axpy, dot, dot2, norm1, norm2, norminf, relerr,
                    update_xr)
from .operators import (BsrEllOperator, CooOperator, DenseOperator,
                        DiaNdOperator, DiaOperator, EllOperator,
                        MatFreeOperator,
                        default_dtype, device_operator, dia_bands_from_csr,
                        dia_fill_ok)

__all__ = [
    "axpby", "axpy", "dot", "dot2", "norm1", "norm2", "norminf", "relerr",
    "update_xr",
    "BsrEllOperator", "CooOperator", "DenseOperator", "DiaNdOperator",
    "DiaOperator",
    "EllOperator", "MatFreeOperator", "default_dtype", "device_operator",
    "dia_bands_from_csr", "dia_fill_ok",
]
