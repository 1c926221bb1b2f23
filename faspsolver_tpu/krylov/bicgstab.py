"""Preconditioned BiCGstab, one jitted while_loop over operator closures.

Reference: base/src/KryPbcgs.c (replicated per format; single generic
implementation here).  Includes breakdown guards on rho and omega, the
stagnation restart, and the false-convergence true-residual recheck, plus
the safety-net best-iterate mode (reference: KrySPbcgs.c).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import (ERROR_SOLVER_MISC, ERROR_SOLVER_STAG,
                         ERROR_SOLVER_TOLSMALL, MAX_RESTART, MAX_STAG,
                         STAG_RATIO, StopType)
from .common import SMALLREAL, SMALLREAL2, initial_norms, residual_norms, \
    resolve_precond
from .result import SolveResult


def bicgstab(A, b, x0=None, M=None, *, tol: float = 1e-6,
             abstol: float = 1e-18, maxit: int = 500,
             stop_type: int = int(StopType.REL_RES),
             safe: bool = False) -> SolveResult:
    M = resolve_precond(M)
    if x0 is None:
        x0 = jnp.zeros(A.shape[0], dtype=b.dtype)
    return _bicgstab(A, M, jnp.asarray(b), jnp.asarray(x0),
                     jnp.asarray(tol, b.dtype), jnp.asarray(abstol, b.dtype),
                     jnp.asarray(maxit, jnp.int32), stop_type, safe)


@partial(jax.jit, static_argnames=("stop_type", "safe"))
def _bicgstab(A, M, b, x0, tol, abstol, maxit, stop_type: int, safe: bool
              ) -> SolveResult:
    maxdiff = tol * STAG_RATIO

    r0 = b - A(x0)
    z0 = M(r0)
    absres0, normr0, normu0, relres0 = initial_norms(stop_type, r0, z0, x0)
    already = (relres0 < tol) | (absres0 < abstol)

    state = dict(
        it=jnp.int32(0), x=x0, r=r0, rstar=r0, p=r0, v=jnp.zeros_like(r0),
        rho=jnp.dot(r0, r0), alpha=jnp.asarray(1.0, b.dtype),
        omega=jnp.asarray(1.0, b.dtype),
        absres0=absres0, relres=relres0, normu=normu0,
        stag=jnp.int32(1), more=jnp.int32(1), status=jnp.int32(0),
        done=already, best_x=x0, best_absres=absres0)

    def norms(r, z, normu):
        return residual_norms(stop_type, r, z, normr0, normu)

    def cond(s):
        return (~s["done"]) & (s["it"] < maxit)

    def body(s):
        it = s["it"] + 1
        x, r, rstar, p, v = s["x"], s["r"], s["rstar"], s["p"], s["v"]

        # BiCGstab step with preconditioner applied to directions
        phat = M(p)
        v = A(phat)
        sigma = jnp.dot(rstar, v)
        bd1 = jnp.abs(sigma) <= SMALLREAL2
        alpha = jnp.where(bd1, 0.0, s["rho"] / jnp.where(bd1, 1.0, sigma))
        sv = r - alpha * v                      # s vector
        shat = M(sv)
        t = A(shat)
        tt = jnp.dot(t, t)
        bd2 = tt <= SMALLREAL2
        omega = jnp.where(bd2, 0.0, jnp.dot(t, sv) / jnp.where(bd2, 1.0, tt))
        x = x + alpha * phat + omega * shat
        r = sv - omega * t

        rho_new = jnp.dot(rstar, r)
        bd3 = jnp.abs(s["rho"] * omega) <= SMALLREAL2
        beta = jnp.where(bd3, 0.0,
                         (rho_new / jnp.where(jnp.abs(s["rho"]) <= SMALLREAL2,
                                              1.0, s["rho"]))
                         * (alpha / jnp.where(bd2, 1.0, omega)))
        p = r + beta * (p - omega * v)
        breakdown = bd1 | bd2

        z = M(r) if stop_type == StopType.REL_PRECRES else r
        absres, relres = norms(r, z, s["normu"])
        factor = absres / s["absres0"]

        # stagnation + false-convergence checks (same structure as pcg.py)
        normu = jnp.maximum(SMALLREAL, jnp.sqrt(jnp.dot(x, x)))
        reldiff = (jnp.sqrt(jnp.dot(alpha * phat + omega * shat,
                                    alpha * phat + omega * shat)) / normu)
        stagnated = ((factor > 0.9) & (s["stag"] <= MAX_STAG)
                     & (reldiff < maxdiff))
        claim = (relres < tol) & (~stagnated)
        need = stagnated | claim

        def do_recompute(ops):
            x, r = ops
            rt = b - A(x)
            zt = M(rt) if stop_type == StopType.REL_PRECRES else rt
            a2, r2 = norms(rt, zt, normu)
            return rt, a2, r2

        def no_recompute(ops):
            return ops[1], absres, relres

        r, absres, relres = jax.lax.cond(need, do_recompute, no_recompute,
                                         (x, r))
        conv = need & (relres < tol)
        stag_fail = stagnated & (~conv) & (s["stag"] >= MAX_STAG)
        tol_fail = claim & (~conv) & (s["more"] >= MAX_RESTART)
        restart = need & (~conv) & (~stag_fail) & (~tol_fail)
        # restart: reset search space from current residual
        p = jnp.where(restart, r, p)
        rstar = jnp.where(restart, r, rstar)
        rho = jnp.where(restart, jnp.dot(r, r), rho_new)
        stag = s["stag"] + jnp.where(stagnated & restart, 1, 0)
        more = s["more"] + jnp.where(claim & restart, 1, 0)

        done = breakdown | conv | stag_fail | tol_fail
        status = jnp.where(
            breakdown, ERROR_SOLVER_MISC,
            jnp.where(stag_fail, ERROR_SOLVER_STAG,
                      jnp.where(tol_fail, ERROR_SOLVER_TOLSMALL, 0))
        ).astype(jnp.int32)

        new = dict(it=it, x=x, r=r, rstar=rstar, p=p, v=v, rho=rho,
                   alpha=alpha, omega=omega, absres0=absres, relres=relres,
                   normu=normu if stop_type == StopType.MOD_REL_RES
                   else s["normu"], stag=stag, more=more, status=status,
                   done=done, best_x=s["best_x"],
                   best_absres=s["best_absres"])
        if safe:
            better = absres < s["best_absres"]
            new["best_x"] = jnp.where(better, x, s["best_x"])
            new["best_absres"] = jnp.where(better, absres, s["best_absres"])
        return new

    out = jax.lax.while_loop(cond, body, state)
    converged = out["relres"] < tol
    x_final = out["x"]
    if safe:
        use_best = (~converged) & (out["best_absres"] < out["absres0"])
        x_final = jnp.where(use_best, out["best_x"], out["x"])
    return SolveResult(x=x_final, iters=out["it"], relres=out["relres"],
                       converged=converged, status=out["status"])
