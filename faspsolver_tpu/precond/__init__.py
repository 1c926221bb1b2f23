from . import amg
from .preconditioners import AMGPrecond, FMGPrecond

__all__ = ["amg", "AMGPrecond", "FMGPrecond"]
