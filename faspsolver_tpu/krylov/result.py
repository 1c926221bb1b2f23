"""Solve result container shared by all Krylov methods and AMG-as-solver."""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax

from ..constants import SUCCESS


@jax.tree_util.register_dataclass
@dataclass
class SolveResult:
    """Outcome of an iterative solve.

    ``status``: >= 0 iteration count on convergence semantics like the
    reference (fasp_solver_* return value); negative = ERROR_SOLVER_* code.
    """

    x: jax.Array
    iters: jax.Array          # int32 iterations performed
    relres: jax.Array         # final relative residual (per stop_type)
    converged: jax.Array      # bool
    status: jax.Array         # int32 status / error code

    def __repr__(self):  # concrete values may be traced; guard repr
        try:
            return (f"SolveResult(iters={int(self.iters)}, "
                    f"relres={float(self.relres):.4e}, "
                    f"converged={bool(self.converged)})")
        except Exception:
            return "SolveResult(<traced>)"
