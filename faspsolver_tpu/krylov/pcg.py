"""Preconditioned conjugate gradient with the reference's full safeguard
suite, as ONE jitted lax.while_loop generic over operator closures.

Reference: base/src/KryPcg.c:96 (fasp_solver_dcsr_pcg) — the reference
replicates this per matrix format (dcsr/dbsr/dblc/dstr/matfree); here any
pytree operator works, so one implementation serves all formats
(SURVEY.md §7 design stance).

Safeguards reproduced (they affect golden iteration counts):
- breakdown guard on p·Ap                  (KryPcg.c:172-177)
- Check I:  near-zero solution abort        (KryPcg.c:215-222)
- Check II: stagnation restart (p <- 0)     (KryPcg.c:224-274)
- Check III: false-convergence true-residual recheck (KryPcg.c:277-324)
Safety-net variant (safe=True) additionally tracks the best iterate seen
and returns it on non-convergence (reference: KrySPcg.c:81-85,190-196).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..constants import (ERROR_SOLVER_MISC, ERROR_SOLVER_SOLSTAG,
                         ERROR_SOLVER_STAG, ERROR_SOLVER_TOLSMALL, MAX_RESTART,
                         MAX_STAG, STAG_RATIO, StopType)
from .common import SMALLREAL, SMALLREAL2, initial_norms, residual_norms, \
    resolve_precond
from .result import SolveResult


def pcg(A, b, x0=None, M=None, *, tol: float = 1e-6, abstol: float = 1e-18,
        maxit: int = 500, stop_type: int = int(StopType.REL_RES),
        safe: bool = False, max_stag: int = MAX_STAG,
        max_restart: int = MAX_RESTART) -> SolveResult:
    """Solve A x = b with preconditioned CG.

    A and M are pytree operators (callables); tol/abstol/maxit/max_stag/
    max_restart are traced so one compilation serves any tolerance;
    stop_type/safe are static.  ``max_stag``/``max_restart`` default to the
    reference's safeguard budgets (KryPcg.c MAX_STAG/MAX_RESTART); inner
    solves under mixed-precision refinement pass small values so a solve
    pinned at the f32 residual floor exits after a couple of restarts
    instead of burning ~20 dead iterations (the outer f64 loop supplies
    the robustness there).
    """
    M = resolve_precond(M)
    if x0 is None:
        x0 = jnp.zeros(A.shape[0], dtype=b.dtype)
    return _pcg(A, M, jnp.asarray(b), jnp.asarray(x0),
                jnp.asarray(tol, b.dtype), jnp.asarray(abstol, b.dtype),
                jnp.asarray(maxit, jnp.int32),
                jnp.asarray(max_stag, jnp.int32),
                jnp.asarray(max_restart, jnp.int32), stop_type, safe)


@partial(jax.jit, static_argnames=("stop_type", "safe"))
def _pcg(A, M, b, x0, tol, abstol, maxit, max_stag, max_restart,
         stop_type: int, safe: bool) -> SolveResult:
    maxdiff = tol * STAG_RATIO

    r0 = b - A(x0)
    z0 = M(r0)
    absres0, normr0, normu0, relres0 = initial_norms(stop_type, r0, z0, x0)
    already = (relres0 < tol) | (absres0 < abstol)

    state = dict(
        it=jnp.int32(0), x=x0, r=r0, z=z0, p=z0,
        temp1=jnp.dot(z0, r0), absres0=absres0, relres=relres0,
        normu=normu0, stag=jnp.int32(1), more=jnp.int32(1),
        status=jnp.int32(0), done=already,
        best_x=x0, best_absres=absres0,
    )

    def norms(r, z, normu):
        return residual_norms(stop_type, r, z, normr0, normu)

    def true_residual(x):
        r = b - A(x)
        z = M(r) if stop_type == StopType.REL_PRECRES else jnp.zeros_like(r)
        return r, z

    def cond(s):
        return (~s["done"]) & (s["it"] < maxit)

    def body(s):
        it = s["it"] + 1
        p, x, r = s["p"], s["x"], s["r"]
        t = A(p)
        temp2 = jnp.dot(t, p)
        breakdown = jnp.abs(temp2) <= SMALLREAL2
        # on breakdown leave the iterate untouched (reference breaks first)
        alpha = jnp.where(breakdown, 0.0, s["temp1"]
                          / jnp.where(breakdown, 1.0, temp2))
        x = x + alpha * p
        r = r - alpha * t

        if stop_type == StopType.REL_PRECRES:
            z = M(r)
        else:
            z = s["z"]
        absres, relres = norms(r, z, s["normu"])
        factor = absres / s["absres0"]

        # ---- Check I + II (only when converging slowly: factor > 0.9) ----
        normuinf = jnp.max(jnp.abs(x))
        zero_sol = (factor > 0.9) & (normuinf <= SMALLREAL)

        normu = jnp.maximum(SMALLREAL, jnp.sqrt(jnp.dot(x, x)))
        reldiff = jnp.abs(alpha) * jnp.sqrt(jnp.dot(p, p)) / normu
        stagnated = ((factor > 0.9) & (~zero_sol) & (s["stag"] <= max_stag)
                     & (reldiff < maxdiff))
        # Check III fires on claimed convergence; mutually exclusive with the
        # stagnation recompute per iteration (if Check II recomputed and
        # found relres>=tol, the claim is false), so one shared true-residual
        # recompute serves both — keeps the compiled graph to 3 matvec
        # instantiations instead of 5.
        claim = (relres < tol) & (~stagnated) & (~zero_sol)
        need = stagnated | claim

        def do_recompute(ops):
            x, r, z = ops
            rt, zt = true_residual(x)
            z2 = zt if stop_type == StopType.REL_PRECRES else z
            absres2, relres2 = norms(rt, z2, normu)
            return rt, z2, absres2, relres2

        def no_recompute(ops):
            x, r, z = ops
            return r, z, absres, relres

        r, z, absres, relres = jax.lax.cond(
            need, do_recompute, no_recompute, (x, r, z))

        conv = need & (relres < tol)
        stag_fail = stagnated & (~conv) & (s["stag"] >= max_stag)
        tol_fail = claim & (~conv) & (s["more"] >= max_restart)
        restart = need & (~conv) & (~stag_fail) & (~tol_fail)
        p = jnp.where(restart, jnp.zeros_like(p), p)
        stag = s["stag"] + jnp.where(stagnated & restart, 1, 0)
        more = s["more"] + jnp.where(claim & restart, 1, 0)
        stag_conv = stagnated & conv
        true_conv = claim & conv

        # ---- prepare next direction ----
        if stop_type != StopType.REL_PRECRES:
            z = M(r)
        temp2n = jnp.dot(z, r)
        beta = temp2n / s["temp1"]
        p = z + beta * p

        done = (breakdown | zero_sol | stag_fail | stag_conv | true_conv
                | tol_fail)
        status = jnp.where(
            breakdown, ERROR_SOLVER_MISC,
            jnp.where(zero_sol, ERROR_SOLVER_SOLSTAG,
                      jnp.where(stag_fail, ERROR_SOLVER_STAG,
                                jnp.where(tol_fail, ERROR_SOLVER_TOLSMALL,
                                          0)))).astype(jnp.int32)

        new = dict(
            it=it, x=x, r=r, z=z, p=p, temp1=temp2n, absres0=absres,
            relres=relres, normu=normu if stop_type == StopType.MOD_REL_RES
            else s["normu"], stag=stag, more=more, status=status, done=done,
            best_x=s["best_x"], best_absres=s["best_absres"])
        if safe:
            better = absres < s["best_absres"]
            new["best_x"] = jnp.where(better, x, s["best_x"])
            new["best_absres"] = jnp.where(better, absres, s["best_absres"])
        return new

    out = jax.lax.while_loop(cond, body, state)
    converged = out["relres"] < tol
    x_final = out["x"]
    if safe:
        # return best-so-far iterate on non-convergence (KrySPcg.c:190-196)
        use_best = (~converged) & (out["best_absres"] < out["absres0"])
        x_final = jnp.where(use_best, out["best_x"], out["x"])
    return SolveResult(x=x_final, iters=out["it"], relres=out["relres"],
                       converged=converged, status=out["status"])
