"""Classical Ruge-Stuben AMG setup driver.

Reference: fasp_amg_setup_rs (PreAMGSetupRS.c:52): per level
{coarsen -> guards -> interpolate -> R = P^T -> A_c = R A P} with graceful
degradation guards (:161-270): coarsening failure, coarse grid too small,
too-aggressive coarsening, hierarchy kept as-built on abort.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ...constants import CGPT, InterpType
from ...formats import CSRMatrix
from ...ops.operators import EllOperator, default_dtype, device_operator
from ...utils.params import AMGParam
from .coarsen_rs import coarsen
from .hierarchy import (AMGHierarchy, AMGLevel, CoarseSolver,
                        make_coarse_solver)
from .interp import interpolate
from .smoothers import build_smoother
from .transfer import csr_transfer


def setup_rs(A: CSRMatrix, param: Optional[AMGParam] = None,
             dtype=None) -> AMGHierarchy:
    param = param or AMGParam()
    dtype = dtype or default_dtype()

    host_levels: List[CSRMatrix] = [A]
    Ps: List[CSRMatrix] = []
    markers: List[np.ndarray] = []

    cur = A
    max_levels = min(param.max_levels, 20)
    method = {5: "pmis", 3: "cr"}.get(int(param.coarsening_type), "rs")
    while (len(host_levels) < max_levels
           and cur.nrow > max(param.coarse_dof, 1)):
        lvl_method = method
        # aggressive coarsening on the first `aggressive_level` levels
        # (reference: AMG_aggressive_level / cfsplitting_agg)
        if (method == "rs" and len(host_levels) - 1
                < getattr(param, "aggressive_level", 0)):
            lvl_method = "aggressive"
        marker, S = coarsen(cur, theta=param.strong_threshold,
                            max_row_sum=param.max_row_sum,
                            method=lvl_method,
                            aggressive_path=getattr(param,
                                                    "aggressive_path", 2))
        nc = int((marker == CGPT).sum())
        # guards (reference: PreAMGSetupRS.c:161-270)
        if nc == 0 or nc >= cur.nrow:          # coarsening failed/stalled
            break
        if nc < 2:                              # too aggressive
            break
        P = interpolate(cur, marker, S,
                        interp_type=param.interpolation_type,
                        trunc_threshold=param.truncation_threshold)
        Ac = CSRMatrix.from_scipy(
            (P.to_scipy().T @ cur.to_scipy() @ P.to_scipy()).tocsr())
        # density guard: stop if the coarse operator is getting too dense
        if Ac.nnz > 0.8 * Ac.nrow * Ac.nrow and Ac.nrow > 64:
            break
        Ps.append(P)
        markers.append(marker)
        host_levels.append(Ac)
        cur = Ac

    levels = []
    nlvl = len(host_levels)
    for l, Al in enumerate(host_levels):
        if l == nlvl - 1:
            levels.append(AMGLevel(
                A=device_operator(Al, dtype=dtype,
                                  prefer="dense" if Al.nrow <= 2048 else None),
                P=None, R=None, smoother=None))
            break
        Pop, Rop = csr_transfer(Ps[l], dtype=dtype)
        cf = markers[l] if param.smooth_order == 1 else None
        # ILU/Schwarz smoothing on the finest levels (reference:
        # ILU_levels / SWZ_levels, PreAMGSetupRS.c:131-155; graceful
        # fallback to the standard smoother on factorization failure)
        sm = None
        if l < getattr(param, "ILU_levels", 0):
            try:
                from ..ilu import setup_ilu
                from ...utils.params import ILUParam
                from .smoothers import PrecondSmoother
                sm = PrecondSmoother(setup_ilu(
                    Al, ILUParam(ILU_type=param.ILU_type,
                                 ILU_lfil=param.ILU_lfil,
                                 ILU_droptol=param.ILU_droptol),
                    dtype=dtype))
            except Exception:   # noqa: BLE001 — degrade like the reference
                sm = None
        elif l < getattr(param, "SWZ_levels", 0):
            try:
                from ..schwarz import setup_schwarz
                from ...utils.params import SWZParam
                from .smoothers import PrecondSmoother
                sm = PrecondSmoother(setup_schwarz(
                    Al, SWZParam(SWZ_mmsize=param.SWZ_mmsize,
                                 SWZ_maxlvl=param.SWZ_maxlvl,
                                 SWZ_type=param.SWZ_type), dtype=dtype))
            except Exception:   # noqa: BLE001
                sm = None
        if sm is None:
            sm = build_smoother(Al, param.smoother, relax=param.relaxation,
                                poly_degree=param.polynomial_degree,
                                cf_marker=cf, dtype=dtype)
        levels.append(AMGLevel(A=EllOperator.from_csr(Al, dtype=dtype),
                               P=Pop, R=Rop, smoother=sm))

    coarse = make_coarse_solver(host_levels[-1], dtype)

    amli_c = ()
    if param.amli_degree > 0:
        from .cycles import amli_coefs
        amli_c = amli_coefs(2.0, 0.5, param.amli_degree)

    return AMGHierarchy(
        levels=tuple(levels), coarse=coarse,
        presmooth_iter=param.presmooth_iter,
        postsmooth_iter=param.postsmooth_iter,
        cycle_type=param.cycle_type,
        coarse_scaling=bool(param.coarse_scaling),
        amli_degree=param.amli_degree,
        amli_coefs=amli_c)


def setup_cr(A: CSRMatrix, param: Optional[AMGParam] = None,
             dtype=None) -> AMGHierarchy:
    """Compatible-relaxation AMG setup (reference: fasp_amg_setup_cr,
    PreAMGSetupCR.c — Brannick-Falgout CR coarsening + classical
    interpolation)."""
    import dataclasses as _dc
    param = param or AMGParam()
    param = _dc.replace(param, coarsening_type=3)
    return setup_rs(A, param, dtype=dtype)
