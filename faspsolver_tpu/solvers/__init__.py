from .drivers import (itsolver, krylov, krylov_amg, krylov_diag, solve_amg,
                      solve_famg)

__all__ = ["itsolver", "krylov", "krylov_amg", "krylov_diag", "solve_amg",
           "solve_famg"]
