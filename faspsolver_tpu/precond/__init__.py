from . import amg
from .gmg import poisson_gmg_1d, poisson_gmg_2d, poisson_gmg_3d
from .ilu import ILUPrecond, TriangularSolver, setup_ilu
from .preconditioners import AMGNKPrecond, AMGPrecond, FMGPrecond
from .schwarz import SchwarzPrecond, setup_schwarz

__all__ = ["amg", "AMGPrecond", "AMGNKPrecond", "FMGPrecond",
           "poisson_gmg_1d", "poisson_gmg_2d", "poisson_gmg_3d",
           "ILUPrecond", "TriangularSolver", "setup_ilu",
           "SchwarzPrecond", "setup_schwarz"]
