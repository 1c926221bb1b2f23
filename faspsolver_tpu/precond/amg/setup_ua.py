"""Unsmoothed-aggregation AMG setup.

Reference: fasp_amg_setup_ua (PreAMGSetupUA.c:55) ->
amg_setup_unsmoothP_unsmoothR (:101): per level {aggregate -> boolean
tentative P -> Ac = P^T A P (rap_agg)} until the coarse grid is small,
with an adaptive strength threshold per level (:234-238) and graceful
termination when aggregation stalls.

Device artifacts per level: ELL operator for A, gather/segment transfer
ops (no P matrix materialized — the whole point of UA on TPU), smoother
data, dense-LU coarsest solver.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...constants import AggregationType, SmootherType
from ...formats import CSRMatrix
from ...ops.operators import (DenseOperator, EllOperator, default_dtype,
                              device_operator)
from ...utils.params import AMGParam
from .aggregation import (aggregate_pairwise, aggregate_pairwise_fast,
                          aggregate_vmb, tentative_prolongation)
from .hierarchy import (AMGHierarchy, AMGLevel, CoarseSolver,
                        make_coarse_solver)
from .smoothers import build_smoother
from .transfer import AggProlong, AggRestrict

# above this size the vectorized matching path replaces the Python-loop
# greedy aggregators (identical algorithmic family, setup stays fast)
_VECTORIZED_SETUP_THRESHOLD = 2000


def setup_ua(A: CSRMatrix, param: Optional[AMGParam] = None,
             dtype=None, structured: Optional[bool] = None) -> AMGHierarchy:
    param = param or AMGParam()
    dtype = dtype or default_dtype()

    # TPU fast path: large banded matrices get the gather-free structured
    # hierarchy (DIA operators + reshape pair transfers) — see structured.py
    if structured is None:
        structured = A.nrow > 100_000
    if structured:
        from .structured import setup_structured
        hier = setup_structured(A, param, dtype=dtype)
        if hier is not None:
            return hier

    host_levels: List[CSRMatrix] = [A]
    aggs: List[Tuple[np.ndarray, int]] = []

    cur = A
    theta = param.strong_coupled
    max_levels = min(param.max_levels, 20)
    while (len(host_levels) < max_levels
           and cur.nrow > max(param.coarse_dof, 1)):
        if cur.nrow > _VECTORIZED_SETUP_THRESHOLD:
            agg, nagg, Ac = aggregate_pairwise_fast(
                cur, param.pair_number, return_coarse=True)
        elif param.aggregation_type == AggregationType.VMB:
            agg, nagg = aggregate_vmb(cur, theta, param.max_aggregation)
            Ac = None
        else:
            agg, nagg = aggregate_pairwise(cur, param.pair_number,
                                           param.quality_bound)
            Ac = None
        if nagg >= 0.95 * cur.nrow:   # aggregation stalled -> stop here
            break
        if Ac is None:
            from .aggregation import _rap_boolean
            Ac = _rap_boolean(cur, agg, nagg)
        aggs.append((agg, nagg))
        host_levels.append(Ac)
        cur = Ac
        # adaptive per-level strength relaxation
        # (reference: PreAMGSetupUA.c:234-238)
        theta = theta * 0.5

    return build_hierarchy_from_host(host_levels, aggs, param, dtype)


def build_hierarchy_from_host(host_levels: List[CSRMatrix],
                              aggs: List[Tuple[np.ndarray, int]],
                              param: AMGParam, dtype) -> AMGHierarchy:
    """Freeze host CSR levels + aggregation maps into the device hierarchy."""
    levels = []
    nlvl = len(host_levels)
    for l, Al in enumerate(host_levels):
        if l == nlvl - 1:
            levels.append(AMGLevel(A=device_operator(Al, dtype=dtype,
                                                     prefer="dense"
                                                     if Al.nrow <= 2048
                                                     else None),
                                   P=None, R=None, smoother=None))
            break
        agg, nagg = aggs[l]
        op = EllOperator.from_csr(Al, dtype=dtype)
        sm = build_smoother(Al, param.smoother, relax=param.relaxation,
                            poly_degree=param.polynomial_degree, dtype=dtype)
        levels.append(AMGLevel(
            A=op,
            P=AggProlong.from_agg(agg, nagg),
            R=AggRestrict(jnp.asarray(agg.astype(np.int32)), len(agg),
                          int(nagg)),
            smoother=sm))

    coarse = make_coarse_solver(host_levels[-1], dtype)

    amli_c = ()
    if param.amli_degree > 0:
        from .cycles import amli_coefs
        amli_c = amli_coefs(2.0, 0.5, param.amli_degree)

    return AMGHierarchy(
        levels=tuple(levels), coarse=coarse,
        presmooth_iter=param.presmooth_iter,
        postsmooth_iter=param.postsmooth_iter,
        cycle_type=param.cycle_type,
        coarse_scaling=bool(param.coarse_scaling),
        amli_degree=param.amli_degree,
        amli_coefs=amli_c)
