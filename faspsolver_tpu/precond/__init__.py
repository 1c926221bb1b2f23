from . import amg
from .gmg import (poisson_gmg_1d, poisson_gmg_2d, poisson_gmg_3d,
                  poisson_gmgcg_2d, poisson_gmgcg_3d)
from .ilu import ILUPrecond, TriangularSolver, setup_ilu
from .preconditioners import AMGNKPrecond, AMGPrecond, FMGPrecond
from .schwarz import SchwarzPrecond, setup_schwarz
from .str_precond import (StrBlockGSPrecond, StrDiagPrecond, setup_str_blockgs,
                          setup_str_diag, setup_str_ilu,
                          setup_str_schwarz, StrSchwarzSmoother)
from .blc_precond import (BlcOperator, BlcPrecond, BlcSweepingPrecond,
                          setup_blc_precond, setup_blc_sweeping)

__all__ = ["amg", "AMGPrecond", "AMGNKPrecond", "FMGPrecond",
           "poisson_gmg_1d", "poisson_gmg_2d", "poisson_gmg_3d",
           "poisson_gmgcg_2d", "poisson_gmgcg_3d",
           "ILUPrecond", "TriangularSolver", "setup_ilu",
           "SchwarzPrecond", "setup_schwarz",
           "StrDiagPrecond", "StrBlockGSPrecond", "setup_str_diag",
           "setup_str_blockgs", "setup_str_ilu",
           "setup_str_schwarz", "StrSchwarzSmoother",
           "BlcOperator", "BlcPrecond", "BlcSweepingPrecond",
           "setup_blc_precond", "setup_blc_sweeping"]
