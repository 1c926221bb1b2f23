"""Mixed-precision iterative refinement: f32 device solves, f64 accuracy.

TPU arithmetic is fast in f32 and emulated (slow) in f64.  The classic
answer — and the performance mode suggested by SURVEY.md hard-part #5 —
is iterative refinement: an outer f64 loop computes true residuals and
accumulates the solution; the inner Krylov solve runs entirely on device
in f32.  Each round multiplies the achieved accuracy, so 2-3 rounds of an
inner 1e-5 solve reach 1e-10 — far below anything f32 alone can do.

The reference is double-precision throughout (REAL=double, fasp.h:75);
this module is how the TPU build matches that accuracy without paying the
f64 emulation cost in the hot loop.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..formats import BSRMatrix, CSRMatrix


@dataclass
class RefinedResult:
    x: np.ndarray               # f64 solution
    rounds: int                 # outer refinement rounds used
    inner_iters: int            # total inner Krylov iterations
    relres: float               # true f64 relative residual
    converged: bool


def solve_refined(A_host, b, inner_solve: Callable,
                  *, tol: float = 1e-8, max_rounds: int = 6,
                  inner_tol: float = 1e-5, inner_floor: float = 5e-6,
                  dtype=jnp.float32) -> RefinedResult:
    """Outer f64 refinement around an inner reduced-precision solver.

    ``A_host`` is a host matrix (CSRMatrix/BSRMatrix) used for exact f64
    residuals; ``inner_solve(r_device, tol) -> SolveResult`` solves
    A d = r approximately on device (e.g. AMG-PCG in f32).  The inner
    tolerance adapts: each round only requests the remaining reduction
    (times a safety factor), clamped to the f32 floor, so late rounds cost
    a couple of iterations instead of a full solve.
    """
    if isinstance(A_host, BSRMatrix):
        spmv = A_host.matvec
    elif isinstance(A_host, CSRMatrix):
        spmv = A_host.matvec
    else:
        raise TypeError("solve_refined needs a host matrix for f64 residuals")

    b64 = np.asarray(b, dtype=np.float64)
    bnorm = max(float(np.linalg.norm(b64)), 1e-300)
    x = np.zeros_like(b64)
    total_inner = 0
    relres = 1.0
    for rnd in range(max_rounds):
        r = b64 - spmv(x)
        relres = float(np.linalg.norm(r)) / bnorm
        if relres < tol:
            return RefinedResult(x=x, rounds=rnd, inner_iters=total_inner,
                                 relres=relres, converged=True)
        # scale the residual to O(1) so the f32 inner solve keeps dynamic
        # range, then scale the correction back
        scale = max(float(np.abs(r).max()), 1e-300)
        need = max(min(inner_tol, 0.3 * tol / relres), inner_floor)
        res = inner_solve(jnp.asarray(r / scale, dtype=dtype), need)
        total_inner += int(res.iters)
        x = x + scale * np.asarray(res.x, dtype=np.float64)
    r = b64 - spmv(x)
    relres = float(np.linalg.norm(r)) / bnorm
    return RefinedResult(x=x, rounds=max_rounds, inner_iters=total_inner,
                         relres=relres, converged=relres < tol)


def solve_refined_device(op_hi, b, inner_solve: Callable,
                         *, tol: float = 1e-8, max_rounds: int = 6,
                         inner_tol: float = 1e-5, inner_floor: float = 5e-6,
                         dtype=jnp.float32) -> RefinedResult:
    """Device-resident refinement: the f64 operator, solution, and
    residuals all live on device, so each round costs one emulated-f64
    SpMV and two scalar readbacks instead of host<->device vector
    round-trips (per-transfer latency dominates the tunneled dev setup).

    ``op_hi`` must be a high-precision (f64) device operator; requires
    jax_enable_x64.  ``inner_solve(r32, tol) -> SolveResult`` as in
    :func:`solve_refined`.
    """
    import jax

    @jax.jit
    def resid(x):
        r = b64 - op_hi(x)
        return r, jnp.sqrt(jnp.vdot(r, r)), jnp.max(jnp.abs(r))

    b64 = jnp.asarray(np.asarray(b), dtype=jnp.float64)
    bnorm = max(float(jnp.sqrt(jnp.vdot(b64, b64))), 1e-300)
    x = jnp.zeros_like(b64)
    total_inner = 0
    relres = 1.0
    for rnd in range(max_rounds):
        r, rn, scale = resid(x)
        relres = float(rn) / bnorm
        if relres < tol:
            return RefinedResult(x=np.asarray(x), rounds=rnd,
                                 inner_iters=total_inner, relres=relres,
                                 converged=True)
        need = max(min(inner_tol, 0.3 * tol / relres), inner_floor)
        res = inner_solve((r / scale).astype(dtype), need)
        total_inner += int(res.iters)
        x = x + scale * res.x.astype(jnp.float64)
    r, rn, _ = resid(x)
    relres = float(rn) / bnorm
    return RefinedResult(x=np.asarray(x), rounds=max_rounds,
                         inner_iters=total_inner, relres=relres,
                         converged=relres < tol)
