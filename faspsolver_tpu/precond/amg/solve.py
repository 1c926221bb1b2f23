"""AMG as a standalone iterative solver: cycle until converged.

Reference: fasp_amg_solve (PreMGSolve.c:49): while iter < maxit
{mgcycle; r = b - Ax; relres check}; variants fasp_amg_solve_amli (:142)
and fasp_amg_solve_namli (:230); full-MG solve via fmgcycle
(PreMGCycleFull.c).  One jitted while_loop; the cycle is unrolled inside
the body.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...constants import CycleType
from ..amg.cycles import amli_cycle, fmg_cycle, mgcycle, nl_amli_cycle
from ..amg.hierarchy import AMGHierarchy
from ...krylov.result import SolveResult


def amg_solve(hier: AMGHierarchy, b, x0=None, *, tol: float = 1e-6,
              maxit: int = 20) -> SolveResult:
    """Iterate multigrid cycles of the hierarchy's cycle_type to tolerance."""
    b = jnp.asarray(b)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return _amg_solve(hier, b, jnp.asarray(x0), jnp.asarray(tol, b.dtype),
                      jnp.asarray(maxit, jnp.int32))


@partial(jax.jit, static_argnames=())
def _amg_solve(hier, b, x0, tol, maxit) -> SolveResult:
    A = hier.levels[0].A
    cycle = {
        int(CycleType.AMLI): amli_cycle,
        int(CycleType.NL_AMLI): nl_amli_cycle,
    }.get(int(hier.cycle_type), mgcycle)

    normb = jnp.maximum(jnp.sqrt(jnp.dot(b, b)), 1e-20)
    r0 = b - A(x0)
    relres0 = jnp.sqrt(jnp.dot(r0, r0)) / normb

    state = dict(it=jnp.int32(0), x=x0, relres=relres0, done=relres0 < tol)

    def cond(s):
        return (~s["done"]) & (s["it"] < maxit)

    def body(s):
        x = cycle(hier, b, s["x"])
        r = b - A(x)
        relres = jnp.sqrt(jnp.dot(r, r)) / normb
        return dict(it=s["it"] + 1, x=x, relres=relres, done=relres < tol)

    out = jax.lax.while_loop(cond, body, state)
    return SolveResult(x=out["x"], iters=out["it"], relres=out["relres"],
                       converged=out["relres"] < tol,
                       status=jnp.int32(0))


def famg_solve(hier: AMGHierarchy, b, x0=None, *, tol: float = 1e-6,
               maxit: int = 20) -> SolveResult:
    """Full-multigrid solve: one FMG sweep then V-cycles to tolerance
    (reference: fasp_solver_famg, SolFAMG.c:41)."""
    b = jnp.asarray(b)
    x = fmg_cycle(hier, b)
    res = amg_solve(hier, b, x, tol=tol, maxit=max(maxit - 1, 1))
    return SolveResult(x=res.x, iters=res.iters + 1, relres=res.relres,
                       converged=res.converged, status=res.status)
