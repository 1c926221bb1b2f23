"""Preconditioned MINRES as one jitted while_loop.

Reference: base/src/KryPminres.c (per-format copies; one generic
implementation here).  Standard preconditioned Lanczos + Givens formulation
for symmetric (possibly indefinite) systems with an SPD preconditioner.
The residual is tracked by the |eta| recurrence and the true residual is
recomputed when convergence is claimed — the same false-convergence guard
pattern as the reference (KryPminres.c safe-guard blocks).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import StopType
from .common import SMALLREAL, initial_norms, residual_norms, resolve_precond
from .result import SolveResult


def minres(A, b, x0=None, M=None, *, tol=1e-6, abstol=1e-18, maxit=500,
           stop_type=int(StopType.REL_RES), safe: bool = False) -> SolveResult:
    M = resolve_precond(M)
    if x0 is None:
        x0 = jnp.zeros(A.shape[0], dtype=b.dtype)
    return _minres(A, M, jnp.asarray(b), jnp.asarray(x0),
                   jnp.asarray(tol, b.dtype), jnp.asarray(abstol, b.dtype),
                   jnp.asarray(maxit, jnp.int32), stop_type, safe)


@partial(jax.jit, static_argnames=("stop_type", "safe"))
def _minres(A, M, b, x0, tol, abstol, maxit, stop_type: int,
            safe: bool = False) -> SolveResult:
    dtype = b.dtype

    r0 = b - A(x0)
    z0 = M(r0)
    absres0, normr0, normu0, relres0 = initial_norms(stop_type, r0, z0, x0)
    already = (relres0 < tol) | (absres0 < abstol)

    beta0 = jnp.sqrt(jnp.maximum(jnp.dot(r0, z0), 0.0))
    safe_beta0 = jnp.where(beta0 > SMALLREAL, beta0, 1.0)

    state = dict(
        it=jnp.int32(0), x=x0,
        v_old=jnp.zeros_like(b), v=r0 / safe_beta0, z=z0 / safe_beta0,
        beta=beta0,
        c_old=jnp.asarray(1.0, dtype), c=jnp.asarray(1.0, dtype),
        s_old=jnp.asarray(0.0, dtype), s=jnp.asarray(0.0, dtype),
        w_oold=jnp.zeros_like(b), w_old=jnp.zeros_like(b),
        eta=beta0, relres=relres0, normu=normu0,
        done=already | (beta0 <= SMALLREAL), status=jnp.int32(0),
        best_x=x0, best_relres=relres0)

    def cond(s):
        return (~s["done"]) & (s["it"] < maxit)

    def body(s):
        it = s["it"] + 1
        z, v, v_old, beta = s["z"], s["v"], s["v_old"], s["beta"]

        # Lanczos step in the M-inner product: v's are M-orthonormal images
        Az = A(z)
        alpha = jnp.dot(Az, z)
        r_new = Az - alpha * v - beta * v_old          # unnormalized next v
        z_unnorm = M(r_new)
        beta_new = jnp.sqrt(jnp.maximum(jnp.dot(r_new, z_unnorm), 0.0))

        # Givens rotations on the tridiagonal
        c, s_, c_old, s_old = s["c"], s["s"], s["c_old"], s["s_old"]
        rho0 = c * alpha - c_old * s_ * beta
        rho1 = jnp.sqrt(rho0 * rho0 + beta_new * beta_new)
        rho2 = s_ * alpha + c_old * c * beta
        rho3 = s_old * beta
        rho1s = jnp.where(rho1 > SMALLREAL, rho1, 1.0)
        c_new = rho0 / rho1s
        s_new = beta_new / rho1s

        w = (z - rho3 * s["w_oold"] - rho2 * s["w_old"]) / rho1s
        x = s["x"] + c_new * s["eta"] * w
        eta = -s_new * s["eta"]

        # recurrence residual estimate; true-residual recheck on a claim
        est_rel = jnp.abs(eta) / normr0
        claim = est_rel < tol

        def do_true(x):
            rt = b - A(x)
            zt = M(rt) if stop_type == StopType.REL_PRECRES else rt
            normu = jnp.maximum(SMALLREAL, jnp.sqrt(jnp.dot(x, x)))
            _, r2 = residual_norms(stop_type, rt, zt, normr0, normu)
            return r2

        relres = jax.lax.cond(claim, do_true, lambda _: est_rel, x)
        done = (claim & (relres < tol)) | (beta_new <= SMALLREAL)

        bsafe = jnp.where(beta_new > SMALLREAL, beta_new, 1.0)
        new = dict(
            it=it, x=x, v_old=v, v=r_new / bsafe, z=z_unnorm / bsafe,
            beta=beta_new, c_old=c, c=c_new, s_old=s_, s=s_new,
            w_oold=s["w_old"], w_old=w, eta=eta, relres=relres,
            normu=s["normu"], done=done, status=jnp.int32(0),
            best_x=s["best_x"], best_relres=s["best_relres"])
        if safe:
            # best-iterate tracking (reference: KrySPminres.c safety net)
            better = relres < s["best_relres"]
            new["best_x"] = jnp.where(better, x, s["best_x"])
            new["best_relres"] = jnp.where(better, relres, s["best_relres"])
        return new

    out = jax.lax.while_loop(cond, body, state)
    converged = out["relres"] < tol
    x_final = out["x"]
    if safe:
        use_best = (~converged) & (out["best_relres"] < out["relres"])
        x_final = jnp.where(use_best, out["best_x"], out["x"])
    return SolveResult(x=x_final, iters=out["it"], relres=out["relres"],
                       converged=converged, status=out["status"])
