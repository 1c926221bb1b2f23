"""Aggregation algorithms for UA/SA-AMG setup (host side).

Reference: PreAMGAggregation.inl:368 (aggregation_vmb, the
Vanek-Mandel-Brezina greedy), PreAMGAggregationUA.inl:363
(aggregation_symmpair, pairwise matching), :1202 (nonsymmetric pairwise).

Setup-phase graph algorithms run on host (numpy) — the same cost model as
the reference, whose setup is serial C; only the solve phase is device code.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp

from ...formats import CSRMatrix


def strength_graph(A: CSRMatrix, theta: float) -> sp.csr_matrix:
    """Symmetric strength-of-connection:
    j in N(i)  iff  |a_ij| >= theta * sqrt(|a_ii a_jj|)
    (reference: aggregation_vmb strongly-coupled neighborhood)."""
    m = A.to_scipy().tocoo()
    d = np.abs(A.diagonal())
    d = np.where(d > 0, d, 1.0)
    scale = np.sqrt(d[m.row] * d[m.col])
    keep = (np.abs(m.data) >= theta * scale) & (m.row != m.col)
    S = sp.csr_matrix((np.ones(np.count_nonzero(keep)),
                       (m.row[keep], m.col[keep])), shape=A.shape)
    return S


def aggregate_vmb(A: CSRMatrix, theta: float, max_aggregation: int = 20
                  ) -> Tuple[np.ndarray, int]:
    """VMB greedy aggregation.  Returns (agg_id per node, n_aggregates).

    Three passes (reference: aggregation_vmb, PreAMGAggregation.inl:368):
    1. nodes whose strong neighborhood is entirely unaggregated become the
       root of a new aggregate containing that neighborhood;
    2. remaining nodes join the neighboring aggregate they are most
       strongly connected to;
    3. leftovers form aggregates from their remaining unaggregated
       strong neighbors.
    """
    n = A.nrow
    S = strength_graph(A, theta)
    indptr, indices = S.indptr, S.indices
    agg = np.full(n, -1, dtype=np.int64)
    nagg = 0

    # isolated nodes (no strong couplings): keep as singletons at the end
    deg = np.diff(indptr)

    # pass 1
    for i in range(n):
        if agg[i] != -1 or deg[i] == 0:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        if np.all(agg[nbrs] == -1):
            group = nbrs[:max_aggregation - 1]
            agg[i] = nagg
            agg[group] = nagg
            nagg += 1

    # pass 2: attach to strongest neighboring aggregate
    counts = np.bincount(agg[agg >= 0], minlength=max(nagg, 1))
    data = S.data
    for i in range(n):
        if agg[i] != -1 or deg[i] == 0:
            continue
        s, e = indptr[i], indptr[i + 1]
        nbrs = indices[s:e]
        anbrs = agg[nbrs]
        ok = (anbrs >= 0)
        if np.any(ok):
            cand = anbrs[ok]
            snb = data[s:e][ok]
            # strongest connection wins, but respect the size cap
            order = np.argsort(-snb)
            for k in order:
                a = cand[k]
                if counts[a] < max_aggregation:
                    agg[i] = a
                    counts[a] += 1
                    break

    # pass 3: group leftovers with their unaggregated strong neighbors
    for i in range(n):
        if agg[i] != -1 or deg[i] == 0:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        free = nbrs[agg[nbrs] == -1][:max_aggregation - 1]
        agg[i] = nagg
        agg[free] = nagg
        nagg += 1

    # isolated nodes become singleton aggregates
    for i in range(n):
        if agg[i] == -1:
            agg[i] = nagg
            nagg += 1

    return agg, nagg


def aggregate_pairwise(A: CSRMatrix, k_pairs: int = 2,
                       quality_bound: float = 8.0) -> Tuple[np.ndarray, int]:
    """(Multi-)pairwise matching aggregation
    (reference: aggregation_symmpair, PreAMGAggregationUA.inl:363).

    Each pass matches every node with its strongest available negative
    neighbor; ``k_pairs`` passes compose to aggregates of size up to
    2^k_pairs.
    """
    n = A.nrow
    agg = np.arange(n, dtype=np.int64)
    cur = A
    maps = []
    for _ in range(k_pairs):
        m = cur.to_scipy().tocsr()
        nn = cur.nrow
        pair = np.full(nn, -1, dtype=np.int64)
        nagg = 0
        # visit in order of increasing diagonal dominance (reference visits
        # least-dominant first for quality); simple natural order suffices
        for i in range(nn):
            if pair[i] != -1:
                continue
            s, e = m.indptr[i], m.indptr[i + 1]
            best, bestv = -1, 0.0
            for jj in range(s, e):
                j = m.indices[jj]
                if j == i or pair[j] != -1:
                    continue
                v = m.data[jj]
                if v < bestv:           # strongest negative coupling
                    best, bestv = j, v
            pair[i] = nagg
            if best >= 0:
                pair[best] = nagg
            nagg += 1
        maps.append((pair, nagg))
        # build coarse matrix for next matching round
        P = sp.csr_matrix((np.ones(nn), (np.arange(nn), pair)),
                          shape=(nn, nagg))
        cur = CSRMatrix.from_scipy((P.T @ m @ P).tocsr())
    # compose maps
    agg = maps[0][0].copy()
    for pair, _ in maps[1:]:
        agg = pair[agg]
    return agg, maps[-1][1]


def tentative_prolongation(agg: np.ndarray, nagg: int) -> CSRMatrix:
    """Boolean tentative P from an aggregation map
    (reference: form_tentative_p, PreAMGAggregationCSR.inl:40)."""
    n = len(agg)
    return CSRMatrix.from_scipy(
        sp.csr_matrix((np.ones(n), (np.arange(n), agg)), shape=(n, nagg)))
