"""Eigenvalue estimation: power method for lambda_max.

Reference: fasp_dcsr_maxeig (BlaEigen.c) — used by the polynomial smoother
and AMLI coefficients.  Host NumPy for host matrices (setup phase), plus a
jitted device version for operators.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import CSRMatrix


def maxeig(A, iters: int = 50, tol: float = 1e-6) -> float:
    """lambda_max of a host CSR matrix by power iteration."""
    if isinstance(A, CSRMatrix):
        m = A.to_scipy()
        rng = np.random.default_rng(0)
        v = rng.standard_normal(A.nrow)
        v /= np.linalg.norm(v)
        lam = 0.0
        for _ in range(iters):
            w = m @ v
            lam_new = float(np.linalg.norm(w))
            if lam_new == 0.0:
                return 0.0
            v = w / lam_new
            if abs(lam_new - lam) <= tol * lam_new:
                return lam_new
            lam = lam_new
        return lam
    return float(maxeig_device(A, iters))


@partial(jax.jit, static_argnames=("iters",))
def maxeig_device(op, iters: int = 50):
    """Device power iteration over an operator closure."""
    n = op.shape[0]
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n,), dtype=op.dtype)
    v = v * jax.lax.rsqrt(jnp.vdot(v, v))

    def body(_, carry):
        v, _ = carry
        w = op(v)
        lam = jnp.sqrt(jnp.vdot(w, w))
        return (w * jnp.where(lam > 0, 1.0 / jnp.where(lam > 0, lam, 1.0),
                              0.0), lam)

    _, lam = jax.lax.fori_loop(0, iters, body, (v, jnp.asarray(0.0,
                                                               op.dtype)))
    return lam
