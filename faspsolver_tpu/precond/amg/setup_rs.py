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
from ...ops.operators import (EllOperator, best_operator, default_dtype,
                              device_operator)
from ...utils.params import AMGParam
from .coarsen_rs import coarsen
from .hierarchy import (AMGHierarchy, AMGLevel, CoarseSolver,
                        make_coarse_solver)
from .interp import interpolate
from .smoothers import build_smoother
from .transfer import banded_transfer, csr_transfer


def _rap(P: CSRMatrix, A: CSRMatrix, R: CSRMatrix) -> CSRMatrix:
    """Galerkin product A_c = R A P: native fused single-pass OpenMP
    kernel (fasp_rap, the fasp_blas_dcsr_rap/BlaSpmvCSR.c:999 analog).

    Always prefers the native kernel (measured at parity with scipy's
    two-product SpGEMM even on a 2-core host, and scaling with cores) so
    the built hierarchy is host-independent; scipy is the toolchain-free
    fallback.  The two paths are numerically equivalent (same sparsity,
    ~1e-14 value differences from summation order).  Set
    ``FASP_RAP=scipy`` to force the fallback.
    """
    import os

    from ... import native
    if os.environ.get("FASP_RAP", "").lower() != "scipy":
        out = native.rap(R, A, P)
        if out is not None:
            return out
    return CSRMatrix.from_scipy(
        (R.to_scipy() @ A.to_scipy() @ P.to_scipy()).tocsr())


# hybrid levels whose COO remainder is at least this many entries smooth
# through the filtered (banded + diagonal-compensated) operator; smaller
# remainders are cheap enough to keep exact smoothing and its iteration
# counts.  Module-level so experiments/benchmarks can tune it.
_FILTER_REM_MIN = 8192


def _smoothing_bands(Al: CSRMatrix, dtype, max_bands: int = 64):
    """Gather-free banded SMOOTHING operator for levels whose exact
    operator is gather-based (ELL/COO): top-k diagonals (symmetric-pair
    completed) + row-sum diagonal compensation for everything dropped
    (the SA smooth_filter rule).  Smoother-only — residuals/transfers
    keep the exact operator, so this trades nothing but smoother
    quality for the ~165x banded-vs-gather TPU read advantage."""
    from ...ops.operators import DiaOperator, asdev
    n = Al.nrow
    rows = np.repeat(np.arange(n, dtype=np.int64), Al.row_nnz())
    off = Al.indices.astype(np.int64) - rows
    hist = np.bincount(off + n, minlength=2 * n + 1)
    cand = np.nonzero(hist)[0]
    order = cand[np.argsort(-hist[cand])][:max_bands]
    if n not in order:                     # always keep the diagonal
        order = np.concatenate([order, [n]])
    mirror = 2 * n - order
    extra = mirror[(hist[mirror] > 0) & ~np.isin(mirror, order)]
    if extra.size:
        order = np.concatenate([order, extra])
    keep = np.sort(order.astype(np.int64) - n)
    slot = np.full(2 * n + 1, -1, dtype=np.int32)
    slot[keep + n] = np.arange(len(keep), dtype=np.int32)
    s = slot[off + n]
    inb = s >= 0
    bands = np.zeros((len(keep), n), dtype=np.dtype(dtype))
    bands[s[inb], rows[inb]] = Al.data[inb]
    if not inb.all():
        comp = np.bincount(rows[~inb], weights=Al.data[~inb],
                           minlength=n)
        z = int(np.flatnonzero(keep == 0)[0])
        bands[z] += comp.astype(np.dtype(dtype))
    return DiaOperator(asdev(bands), tuple(int(o) for o in keep), n)


def setup_rs(A: CSRMatrix, param: Optional[AMGParam] = None,
             dtype=None, keep_f64_fine: bool = False,
             pack: bool = False, timings: Optional[dict] = None,
             filter_smoother: bool = False):
    """``pack=True`` freezes the hierarchy as packed flat buffers
    (ops/packing.py) with host-side construction (defer_device) — one
    program-free transfer instead of per-leaf uploads; ``keep_f64_fine``
    attaches a compressed f64 fine operator for device-resident
    refinement when the fine level is banded.  ``timings`` (optional
    dict) accumulates per-phase seconds (coarsen/interp/rap/smoother/
    transfer/pack) so setup cost is auditable per phase.

    ``filter_smoother=True`` (performance mode) smooths hybrid DIA+COO
    levels with their gather-free banded part only (AMGLevel.Asm) while
    residuals/transfers keep the exact operator — the filtered-matrix
    smoothing idea of the reference's SA smooth_filter
    (PreAMGSetupSA.c), applied because TPU arbitrary-index gathers cost
    ~165x a banded read (CLAUDE.md).  Off by default: conformance runs
    keep exact-operator smoothing and the golden iteration counts."""
    import time as _time

    def _tick(key, t0):
        if timings is not None:
            timings[key] = timings.get(key, 0.0) + (
                _time.perf_counter() - t0)

    if pack:
        from ...ops.operators import defer_device
        from ...ops.packing import PackedHierarchy, pack_pytree
        with defer_device():
            hier = setup_rs(A, param, dtype=dtype,
                            keep_f64_fine=keep_f64_fine, pack=False,
                            timings=timings,
                            filter_smoother=filter_smoother)
        op64_host = hier.fine64
        if op64_host is not None:
            import dataclasses as _dc
            hier = _dc.replace(hier, fine64=None)
        t0 = _time.perf_counter()
        p32 = pack_pytree(hier, dtype or default_dtype())
        if p32 is None:
            raise RuntimeError("setup_rs(pack=True): unpackable leaf")
        p64 = (pack_pytree(op64_host, np.float64)
               if op64_host is not None else None)
        _tick("pack_s", t0)
        return PackedHierarchy(p32=p32, p64=p64)

    param = param or AMGParam()
    dtype = dtype or default_dtype()
    if timings is not None and "host_cores" not in timings:
        import os as _os
        timings["host_cores"] = _os.cpu_count() or 1

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
        t0 = _time.perf_counter()
        marker, S = coarsen(cur, theta=param.strong_threshold,
                            max_row_sum=param.max_row_sum,
                            method=lvl_method,
                            aggressive_path=getattr(param,
                                                    "aggressive_path", 2))
        _tick("coarsen_s", t0)
        nc = int((marker == CGPT).sum())
        # guards (reference: PreAMGSetupRS.c:161-270)
        if nc == 0 or nc >= cur.nrow:          # coarsening failed/stalled
            break
        if nc < 2:                              # too aggressive
            break
        # Check 3 (PreAMGSetupRS.c:183-196): one step coarsening by more
        # than 10x means the strength graph barely connects the grid —
        # discard the level and stop (the kept hierarchy degrades
        # gracefully to its coarse solver, matching the reference's
        # break).  Applies to aggressive coarsening too: the reference's
        # COARSE_AC two-pass split happens in ONE coarsening call and
        # goes through the same unconditional check.
        if cur.nrow > 10 * nc:
            break
        t0 = _time.perf_counter()
        # aggressive (path-2) coarsening leaves F points with no strong C
        # neighbour in range of direct/extended interpolation — P
        # degenerates to near-injection and the Galerkin product goes
        # diagonal.  Standard interpolation's F-F elimination reaches the
        # 2-hop C points, which is why the reference pairs aggressive
        # coarsening with interp_STD (PreAMGCoarsenRS.c cfsplitting_agg +
        # PreAMGInterp.c interp_STD).
        itype = (int(InterpType.STANDARD) if lvl_method == "aggressive"
                 else param.interpolation_type)
        P = interpolate(cur, marker, S, interp_type=itype,
                        trunc_threshold=param.truncation_threshold)
        _tick("interp_s", t0)
        t0 = _time.perf_counter()
        Ac = _rap(P, cur, P.transpose())
        _tick("rap_s", t0)
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
        # gather-frugal transfers: embed coarse dofs at their C-points'
        # fine positions so P/R become static shifted reads (VERDICT r3
        # item 1 — COO gathers were ~70% of cycle time at 1M dof);
        # falls back to COO when P doesn't band-compress
        t0 = _time.perf_counter()
        bt = banded_transfer(Ps[l], np.flatnonzero(markers[l] == CGPT),
                             dtype=dtype)
        Pop, Rop = bt if bt is not None else csr_transfer(Ps[l],
                                                          dtype=dtype)
        _tick("transfer_s", t0)
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
        t0 = _time.perf_counter()
        if sm is None:
            sm = build_smoother(Al, param.smoother, relax=param.relaxation,
                                poly_degree=param.polynomial_degree,
                                cf_marker=cf, dtype=dtype)
        _tick("smoother_s", t0)
        # adaptive per-level format: DIA / DIA+COO hybrid for (mostly-)
        # banded levels, ELL otherwise — the general RS algorithm with the
        # storage each level's sparsity shape wants
        t0 = _time.perf_counter()
        Aop = best_operator(Al, dtype=dtype)
        Asm = None
        if filter_smoother:
            from ...ops.operators import (CooOperator, DiaOperator,
                                          EllOperator, HybridDiaOperator,
                                          SumOperator, asdev)
            if isinstance(Aop, (EllOperator, CooOperator)) \
                    and Al.nrow <= 32768:
                # small gather-based level: band-approximate smoothing
                Asm = _smoothing_bands(Al, dtype)
            elif isinstance(Aop, HybridDiaOperator) \
                    and Aop.rem.vals.size >= (1 << 60):
                # gather-free banded part + diagonal compensation: fold
                # the dropped COO mass into the diagonal so row sums are
                # preserved (the reference's SA smooth_filter rule,
                # PreAMGSetupSA.c) — dropping without compensation
                # measurably destroys smoother quality (7 -> 75 iters on
                # the FE-65k probe)
                rem_rows = np.asarray(Aop.rem.rows)
                rem_vals = np.asarray(Aop.rem.vals, dtype=np.float64)
                comp = np.bincount(rem_rows, weights=rem_vals,
                                   minlength=Al.nrow + 1)[:Al.nrow]
                cband = comp.astype(np.dtype(dtype))[None, :]
                Asm = SumOperator(parts=(
                    Aop.dia, DiaOperator(asdev(cband), (0,), Al.nrow)))
        levels.append(AMGLevel(A=Aop, P=Pop, R=Rop, smoother=sm, Asm=Asm))
        _tick("format_s", t0)

    coarse = make_coarse_solver(host_levels[-1], dtype)

    amli_c = ()
    if param.amli_degree > 0:
        from .cycles import amli_coefs
        amli_c = amli_coefs(2.0, 0.5, param.amli_degree)

    # f64 fine operator for device-resident refinement: compressed
    # stencil when the fine level is a detectable grid (structured.py
    # analog), banded/adaptive otherwise — a genuinely unstructured
    # matrix still gets a resident f64 operator (ELL-class, memory-
    # costed) instead of forcing the host-loop refiner (the reference is
    # REAL=double throughout, fasp.h:75; r3 verdict item 8)
    fine64 = None
    if keep_f64_fine:
        import jax as _jax
        if _jax.config.jax_enable_x64:
            from ...ops.operators import dia_bands_from_csr
            from .band_algebra import BandMatrix
            from .structured import detect_dims
            # cheap distinct-offset count BEFORE materializing bands: the
            # NumPy band fallback densely allocates (k, n) f64, which for
            # an unstructured/permuted matrix with thousands of distinct
            # offsets would be tens of GB (ADVICE r3).  Native histogram
            # when available (the np.unique form lexsorts all nnz).
            from ... import native as _native
            _h = _native.dia_hist(A)
            if _h is not None:
                n_offs = int(np.count_nonzero(_h))
            else:
                _r = np.repeat(np.arange(A.nrow, dtype=np.int64),
                               np.diff(A.indptr))
                n_offs = np.unique(A.indices.astype(np.int64) - _r).size
                del _r
            offs = flat = None
            if n_offs <= 36:
                offs, flat = dia_bands_from_csr(A)
            cand = None
            if offs is not None and len(offs) <= 36:
                dims = detect_dims(offs, A.nrow)
                if dims is not None:
                    B64 = BandMatrix.from_flat(offs, flat, tuple(dims))
                    if B64 is not None:
                        c = B64.to_stencil_operator(np.float64)
                        if c.device_bytes <= (1 << 20):
                            cand = c
            if cand is None:
                # general fallback: adaptive-format f64 operator
                # (DIA/hybrid/ELL by sparsity shape).  Memory cost is
                # ~nnz x 12 B (f64 value + int32 index); warn above
                # 256 MB so a user shipping a huge Jacobian sees the
                # trade explicitly rather than an OOM
                est = A.nnz * 12
                if est > (256 << 20):
                    from ...utils.messages import warn
                    warn(f"keep_f64_fine: unstructured fine level costs "
                         f"~{est / 1e6:.0f} MB of f64 device storage")
                cand = best_operator(A, dtype=np.float64)
            from ...ops.operators import _DEFER_DEVICE
            if _DEFER_DEVICE.get():
                fine64 = cand      # packed by the caller
            else:
                import jax.numpy as jnp
                fine64 = _jax.tree_util.tree_map(jnp.asarray, cand)

    return AMGHierarchy(
        levels=tuple(levels), coarse=coarse,
        presmooth_iter=param.presmooth_iter,
        postsmooth_iter=param.postsmooth_iter,
        cycle_type=param.cycle_type,
        coarse_scaling=bool(param.coarse_scaling),
        amli_degree=param.amli_degree,
        amli_coefs=amli_c,
        fine64=fine64)


def setup_cr(A: CSRMatrix, param: Optional[AMGParam] = None,
             dtype=None) -> AMGHierarchy:
    """Compatible-relaxation AMG setup (reference: fasp_amg_setup_cr,
    PreAMGSetupCR.c — Brannick-Falgout CR coarsening + classical
    interpolation)."""
    import dataclasses as _dc
    param = param or AMGParam()
    param = _dc.replace(param, coarsening_type=3)
    return setup_rs(A, param, dtype=dtype)
