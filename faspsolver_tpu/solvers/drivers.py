"""User-facing solver drivers: params -> preconditioner setup -> Krylov.

Reference: base/src/SolCSR.c (fasp_solver_dcsr_itsolver :56 8-way dispatch,
_krylov :249, _krylov_diag :341, _krylov_amg :476, _krylov_ilu :588),
SolAMG.c:49 (fasp_solver_amg with safeguarded-GMRES fallback :128-135),
SolFAMG.c, SolBSR.c (BSR drivers), SolMatFree.c.

One driver family serves every matrix container: anything that can become a
device operator works (CSRMatrix, BSRMatrix, or an already-built operator).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..constants import (AMGType, CycleType, PrecondType, PrintLevel,
                         SolverType, StopType)
from ..formats import BSRMatrix, CSRMatrix
from ..krylov import (SolveResult, bicgstab, gcg, gcr, gmres, minres, pcg,
                      vfgmres, vgmres, BlockJacobiPrecond, JacobiPrecond)
from ..ops.operators import default_dtype, device_operator
from ..precond import (AMGNKPrecond, AMGPrecond, FMGPrecond, setup_ilu,
                       setup_schwarz)
from ..precond.amg import amg_solve, famg_solve, setup_rs, setup_sa, setup_ua
from ..utils import messages
from ..utils.params import AMGParam, ILUParam, ITSParam, SWZParam
from ..utils.errors import FaspError


_KRYLOV = {
    int(SolverType.CG): pcg,
    int(SolverType.BICGSTAB): bicgstab,
    int(SolverType.MINRES): minres,
    int(SolverType.GMRES): gmres,
    int(SolverType.VGMRES): vgmres,
    int(SolverType.VFGMRES): vfgmres,
    int(SolverType.GCG): gcg,
    int(SolverType.GCR): gcr,
}
_SAFE = {
    int(SolverType.SCG): pcg,
    int(SolverType.SBICGSTAB): bicgstab,
    int(SolverType.SMINRES): minres,
    int(SolverType.SGMRES): gmres,
    int(SolverType.SVGMRES): vgmres,
    int(SolverType.SVFGMRES): vfgmres,
}
_SAFE_RESTARTED = {int(SolverType.SGMRES), int(SolverType.SVGMRES),
                   int(SolverType.SVFGMRES)}


def _as_operator(A, dtype=None):
    if isinstance(A, (CSRMatrix, BSRMatrix)):
        return device_operator(A, dtype=dtype)
    from ..formats.str_grid import STRMatrix
    from ..formats.blc import BLCMatrix
    if isinstance(A, STRMatrix):
        from ..ops.str_ops import StrOperator
        return StrOperator.from_str(A, dtype=dtype)
    if isinstance(A, BLCMatrix):
        from ..precond.blc_precond import BlcOperator
        return BlcOperator.from_blc(A, dtype=dtype)
    return A


def itsolver(A, b, x0=None, M=None, its: Optional[ITSParam] = None
             ) -> SolveResult:
    """Krylov dispatch over an operator + optional preconditioner
    (reference: fasp_solver_dcsr_itsolver, SolCSR.c:56)."""
    its = its or ITSParam()
    op = _as_operator(A)
    b = jnp.asarray(b, dtype=op.dtype)
    stype = int(its.itsolver_type)
    kw = dict(tol=its.tol, abstol=its.abstol, maxit=its.maxit,
              stop_type=its.stop_type)
    if stype in _KRYLOV:
        fn = _KRYLOV[stype]
        if fn in (gmres, vgmres, vfgmres, gcr):
            kw["restart"] = its.restart
        # gcg: the reference's pgcg ignores itparam restart (full-memory
        # method, KryPgcg.c:70) — let gcg's own full-window default apply
        return fn(op, b, x0=x0, M=M, **kw)
    if stype in _SAFE:
        if stype in _SAFE_RESTARTED:
            kw["restart"] = its.restart
        return _SAFE[stype](op, b, x0=x0, M=M, safe=True, **kw)
    raise FaspError(-40, f"unknown solver type {stype}")


def itsolver_s(A, b, x0=None, M=None, its: Optional[ITSParam] = None
               ) -> SolveResult:
    """Safety-net Krylov dispatch: always runs the best-iterate-tracking
    variant of the requested solver (reference: fasp_solver_dcsr_itsolver_s,
    SolCSR.c:163)."""
    its = its or ITSParam()
    base_to_safe = {
        int(SolverType.CG): int(SolverType.SCG),
        int(SolverType.BICGSTAB): int(SolverType.SBICGSTAB),
        int(SolverType.MINRES): int(SolverType.SMINRES),
        int(SolverType.GMRES): int(SolverType.SGMRES),
        int(SolverType.VGMRES): int(SolverType.SVGMRES),
        int(SolverType.VFGMRES): int(SolverType.SVFGMRES),
    }
    stype = int(its.itsolver_type)
    stype = base_to_safe.get(stype, stype)
    import dataclasses as _dc
    its_s = _dc.replace(its, itsolver_type=stype)
    return itsolver(A, b, x0=x0, M=M, its=its_s)


def krylov_s(A, b, x0=None, its: Optional[ITSParam] = None) -> SolveResult:
    """Unpreconditioned safety-net Krylov (reference: _krylov_s,
    SolCSR.c:295)."""
    return itsolver_s(A, b, x0=x0, M=None, its=its)


def krylov(A, b, x0=None, its: Optional[ITSParam] = None) -> SolveResult:
    """Unpreconditioned Krylov (reference: fasp_solver_dcsr_krylov,
    SolCSR.c:249)."""
    return itsolver(A, b, x0=x0, M=None, its=its)


def krylov_diag(A, b, x0=None, its: Optional[ITSParam] = None) -> SolveResult:
    """Diagonally preconditioned Krylov (reference: _krylov_diag,
    SolCSR.c:341; BSR twin SolBSR.c:186 and STR twin SolSTR.c:175 use
    block-diagonal inverses)."""
    from ..formats.str_grid import STRMatrix
    if isinstance(A, BSRMatrix):
        M = BlockJacobiPrecond.from_bsr(A)
    elif isinstance(A, CSRMatrix):
        M = JacobiPrecond.from_csr(A)
    elif isinstance(A, STRMatrix):
        from ..precond.str_precond import setup_str_diag
        M = setup_str_diag(A)
    else:
        raise FaspError(-41, "krylov_diag needs a host matrix")
    return itsolver(A, b, x0=x0, M=M, its=its)


def _amg_setup_by_type(A: CSRMatrix, amg: AMGParam):
    t = int(amg.AMG_type)
    if t == AMGType.SA:
        return setup_sa(A, amg)
    if t == AMGType.UA:
        return setup_ua(A, amg)
    return setup_rs(A, amg)


def krylov_amg(A, b, x0=None, its: Optional[ITSParam] = None,
               amg: Optional[AMGParam] = None
               ) -> Tuple[SolveResult, object]:
    """AMG-preconditioned Krylov — the canonical driver
    (reference: fasp_solver_dcsr_krylov_amg, SolCSR.c:476; BSR twin
    SolBSR.c:349 condenses blocks and runs UA on the condensed graph).

    Returns (result, hierarchy) so the hierarchy can be reused across
    solves with the same matrix.
    """
    its = its or ITSParam()
    amg = amg or AMGParam()

    if isinstance(A, BSRMatrix):
        # BSR-native path: condensed-graph aggregation + block smoothers
        # (reference: fasp_solver_dbsr_krylov_amg, SolBSR.c:349; SA twin
        # fasp_amg_setup_sa_bsr by AMG_type)
        from ..precond.amg.setup_bsr import setup_sa_bsr, setup_ua_bsr
        if int(amg.AMG_type) == int(AMGType.SA):
            hier = setup_sa_bsr(A, amg)
        else:
            hier = setup_ua_bsr(A, amg)
        op = device_operator(A)
    else:
        hier = _amg_setup_by_type(A, amg)
        op = _as_operator(A)

    M = AMGPrecond(hier, maxit=amg.maxit)
    res = itsolver(op, b, x0=x0, M=M, its=its)
    return res, hier


def solve_amg(A: CSRMatrix, b, x0=None, amg: Optional[AMGParam] = None
              ) -> SolveResult:
    """AMG as a standalone solver with safeguarded-GMRES fallback on setup
    failure (reference: fasp_solver_amg, SolAMG.c:49, fallback :128-135)."""
    amg = amg or AMGParam()
    try:
        hier = _amg_setup_by_type(A, amg)
    except Exception as e:  # noqa: BLE001 — mirror reference fallback
        messages.warn(f"AMG setup failed ({e}); falling back to GMRES")
        its = ITSParam(itsolver_type=int(SolverType.GMRES), tol=amg.tol,
                       maxit=max(amg.maxit, 100))
        return itsolver(A, b, x0=x0, M=None, its=its)
    if int(amg.cycle_type) == CycleType.NL_AMLI or \
       int(amg.cycle_type) == CycleType.AMLI:
        return amg_solve(hier, b, x0, tol=amg.tol, maxit=amg.maxit)
    return amg_solve(hier, b, x0, tol=amg.tol, maxit=amg.maxit)


def solve_famg(A: CSRMatrix, b, x0=None, amg: Optional[AMGParam] = None
               ) -> SolveResult:
    """Full AMG as solver (reference: fasp_solver_famg, SolFAMG.c:41)."""
    amg = amg or AMGParam()
    hier = _amg_setup_by_type(A, amg)
    return famg_solve(hier, b, x0, tol=amg.tol, maxit=amg.maxit)


def krylov_ilu(A, b, x0=None, its: Optional[ITSParam] = None,
               ilu: Optional[ILUParam] = None) -> SolveResult:
    """ILU-preconditioned Krylov (reference: fasp_solver_dcsr_krylov_ilu,
    SolCSR.c:588; BSR twin SolBSR.c:286; STR twin SolSTR.c:236).  The
    factorization runs on host at setup; the apply is level-scheduled
    batched triangular solves on device.
    """
    from ..formats.str_grid import STRMatrix
    ilu = ilu or ILUParam()
    if isinstance(A, BSRMatrix) and int(ilu.ILU_lfil) == 0:
        # true block ILU(0) with batched nb x nb solves (reference:
        # fasp_solver_dbsr_krylov_ilu, SolBSR.c:286 -> fasp_ilu_dbsr_setup);
        # graceful fallback to the scalar expansion on setup failure
        from ..precond.ilu import setup_bsr_ilu0
        try:
            M = setup_bsr_ilu0(A)
            return itsolver(A, b, x0=x0, M=M, its=its)
        except FaspError:
            pass
    if isinstance(A, STRMatrix) and int(ilu.ILU_lfil) <= 1:
        # STR-native banded-block ILU(0)/(1): factorized in band space,
        # batched block level-scheduled apply (reference:
        # fasp_solver_dstr_krylov_ilu, SolSTR.c:236 ->
        # fasp_ilu_dstr_setup0/1, BlaILUSetupSTR.c:1282)
        from ..precond.str_precond import setup_str_ilu
        M = setup_str_ilu(A, fill=int(ilu.ILU_lfil))
        return itsolver(A, b, x0=x0, M=M, its=its)
    if isinstance(A, (BSRMatrix, STRMatrix)):
        host = A.to_csr()
    elif isinstance(A, CSRMatrix):
        host = A
    else:
        raise FaspError(-41, "krylov_ilu needs a host matrix")
    M = setup_ilu(host, ilu)
    return itsolver(A, b, x0=x0, M=M, its=its)


def krylov_ilu_m(A: CSRMatrix, b, x0=None, its: Optional[ITSParam] = None,
                 ilu: Optional[ILUParam] = None) -> SolveResult:
    """ILU on the M-matrix massage of A: off-diagonal positives are dropped
    into the diagonal before factorization, and the resulting ILU of the
    M-matrix preconditions the original system (reference:
    fasp_solver_dcsr_krylov_ilu_M, SolCSR.c:668)."""
    if not isinstance(A, CSRMatrix):
        raise FaspError(-41, "krylov_ilu_m needs a CSRMatrix")
    m = A.to_scipy().tocoo()
    off_pos = (m.row != m.col) & (m.data > 0)
    # move positive off-diagonals onto the diagonal (row-sum preserving)
    diag_add = np.bincount(m.row[off_pos], weights=m.data[off_pos],
                           minlength=A.nrow)
    keep = ~off_pos
    import scipy.sparse as sp
    M_mat = sp.coo_matrix((np.concatenate([m.data[keep], diag_add]),
                           (np.concatenate([m.row[keep],
                                            np.arange(A.nrow)]),
                            np.concatenate([m.col[keep],
                                            np.arange(A.nrow)]))),
                          shape=m.shape).tocsr()
    M_mat.sum_duplicates()
    M = setup_ilu(CSRMatrix.from_scipy(M_mat), ilu or ILUParam())
    return itsolver(A, b, x0=x0, M=M, its=its)


def krylov_swz(A: CSRMatrix, b, x0=None, its: Optional[ITSParam] = None,
               swz: Optional[SWZParam] = None) -> SolveResult:
    """Schwarz-preconditioned Krylov (reference: fasp_solver_dcsr_krylov_swz,
    SolCSR.c:401)."""
    if not isinstance(A, CSRMatrix):
        raise FaspError(-41, "krylov_swz needs a CSRMatrix")
    M = setup_schwarz(A, swz or SWZParam())
    return itsolver(A, b, x0=x0, M=M, its=its)


def krylov_blockgs(A, b, x0=None, its: Optional[ITSParam] = None,
                   nsweeps: int = 2,
                   smoother: str = "blockgs") -> SolveResult:
    """Block-smoother-preconditioned Krylov for structured-grid matrices
    (reference: fasp_solver_dstr_krylov_blockgs, SolSTR.c:323).

    ``smoother="schwarz"`` uses the overlapping-patch Schwarz smoother
    instead (reference: fasp_smoother_dstr_swz, ItrSmootherSTR.c:1665)."""
    from ..formats.str_grid import STRMatrix
    if not isinstance(A, STRMatrix):
        raise FaspError(-41, "krylov_blockgs needs an STRMatrix")
    if smoother == "schwarz":
        from ..precond.str_precond import setup_str_schwarz
        M = setup_str_schwarz(A, nsweeps=nsweeps)
    else:
        from ..precond.str_precond import setup_str_blockgs
        M = setup_str_blockgs(A, nsweeps=nsweeps)
    return itsolver(A, b, x0=x0, M=M, its=its)


def krylov_block(A, b, x0=None, its: Optional[ITSParam] = None,
                 mode: str = "diag", diag_solver: str = "amg",
                 amg: Optional[AMGParam] = None) -> SolveResult:
    """Block-preconditioned Krylov for block-composite systems
    (reference: fasp_solver_dblc_krylov_block3/_block4, SolBLC.c:188,:390 —
    block diag/lower/upper/SGS with AMG on the diagonal blocks; here one
    driver serves any block count)."""
    from ..formats.blc import BLCMatrix
    if not isinstance(A, BLCMatrix):
        raise FaspError(-41, "krylov_block needs a BLCMatrix")
    from ..precond.blc_precond import setup_blc_precond
    M = setup_blc_precond(A, mode=mode, diag_solver=diag_solver, amg=amg)
    return itsolver(A, b, x0=x0, M=M, its=its)


def krylov_sweeping(A, b, x0=None, its: Optional[ITSParam] = None,
                    diag_solver: str = "amg",
                    amg: Optional[AMGParam] = None) -> SolveResult:
    """Layered sweeping-preconditioned Krylov for block-tridiagonal systems
    (reference: fasp_solver_dblc_krylov_sweeping, SolBLC.c:507)."""
    from ..formats.blc import BLCMatrix
    if not isinstance(A, BLCMatrix):
        raise FaspError(-41, "krylov_sweeping needs a BLCMatrix")
    from ..precond.blc_precond import setup_blc_sweeping
    M = setup_blc_sweeping(A, diag_solver=diag_solver, amg=amg)
    return itsolver(A, b, x0=x0, M=M, its=its)


def krylov_nk_amg(A, b, nk, x0=None,
                  its: Optional[ITSParam] = None,
                  amg: Optional[AMGParam] = None
                  ) -> Tuple[SolveResult, object]:
    """Krylov preconditioned by AMG that carries the near-kernel basis
    INSIDE the hierarchy: the basis is restricted level by level and the
    cycle applies the extra near-kernel solve after post-smoothing
    (reference: fasp_solver_dbsr_krylov_nk_amg, SolBSR.c:634;
    PreAMGSetupUABSR.c:241-266; PreMGCycle.c:369-391)."""
    its = its or ITSParam()
    amg = amg or AMGParam()
    if isinstance(A, BSRMatrix):
        from ..precond.amg.setup_bsr import setup_sa_bsr, setup_ua_bsr
        if int(amg.AMG_type) == int(AMGType.SA):
            hier = setup_sa_bsr(A, amg, nk=nk)
        else:
            hier = setup_ua_bsr(A, amg, nk=nk)
    else:
        raise FaspError(-41, "krylov_nk_amg: BSR path only "
                        "(reference SolBSR.c:634)")
    op = _as_operator(A)
    M = AMGPrecond(hier, maxit=amg.maxit)
    res = itsolver(op, b, x0=x0, M=M, its=its)
    return res, hier


def krylov_amg_nk(A: CSRMatrix, b, nk, x0=None,
                  its: Optional[ITSParam] = None,
                  amg: Optional[AMGParam] = None
                  ) -> Tuple[SolveResult, object]:
    """AMG-preconditioned Krylov with extra near-kernel correction
    (reference: fasp_solver_dcsr_krylov_amg_nk, SolCSR.c:748; BSR twin
    SolBSR.c:476).  ``nk`` is an (n, m) array of near-kernel vectors."""
    its = its or ITSParam()
    amg = amg or AMGParam()
    if isinstance(A, BSRMatrix):
        from ..precond.amg.setup_bsr import setup_ua_bsr
        hier = setup_ua_bsr(A, amg)
        host = A.to_csr()
    else:
        hier = _amg_setup_by_type(A, amg)
        host = A
    op = _as_operator(A)
    nk = np.atleast_2d(np.asarray(nk, dtype=np.float64))
    if nk.shape[0] != host.nrow:
        nk = nk.T
    gram = nk.T @ host.to_scipy().dot(nk)
    gram_inv = np.linalg.pinv(gram)
    M = AMGNKPrecond(hier,
                     jnp.asarray(nk, dtype=op.dtype),
                     jnp.asarray(gram_inv, dtype=op.dtype),
                     op, maxit=amg.maxit)
    res = itsolver(op, b, x0=x0, M=M, its=its)
    return res, hier
