from .aggregation import (aggregate_pairwise, aggregate_vmb, strength_graph,
                          tentative_prolongation)
from .cycles import amli_coefs, amli_cycle, fmg_cycle, mgcycle, nl_amli_cycle
from .hierarchy import AMGHierarchy, AMGLevel, CoarseSolver
from .coarsen_rs import (cf_split_cr, cf_split_pmis, cf_split_rs, coarsen,
                         strong_couplings)
from .interp import (interp_direct, interp_energymin, interp_extended,
                     interp_standard, interpolate, truncate)
from .bsr_smoothers import BsrSmootherData, build_bsr_smoother
from .setup_bsr import setup_sa_bsr, setup_ua_bsr
from .setup_rs import setup_cr, setup_rs
from .setup_sa import setup_sa
from .setup_ua import setup_ua
from .structured import (PairProlong, PairRestrict, detect_dims,
                         setup_structured)
from .smoothers import SmootherData, build_smoother, smooth
from .solve import amg_solve, famg_solve
from .transfer import AggProlong, AggRestrict, csr_transfer

__all__ = [
    "aggregate_pairwise", "aggregate_vmb", "strength_graph",
    "tentative_prolongation",
    "amli_coefs", "amli_cycle", "fmg_cycle", "mgcycle", "nl_amli_cycle",
    "AMGHierarchy", "AMGLevel", "CoarseSolver",
    "cf_split_cr", "cf_split_pmis", "cf_split_rs", "coarsen",
    "strong_couplings",
    "interp_direct", "interp_energymin", "interp_extended",
    "interp_standard", "interpolate",
    "truncate",
    "setup_cr", "setup_rs", "setup_sa", "setup_sa_bsr", "setup_ua",
    "setup_ua_bsr", "setup_structured",
    "detect_dims", "PairProlong", "PairRestrict",
    "BsrSmootherData", "build_bsr_smoother",
    "SmootherData", "build_smoother", "smooth",
    "amg_solve", "famg_solve",
    "AggProlong", "AggRestrict", "csr_transfer",
]
