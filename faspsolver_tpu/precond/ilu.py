"""Incomplete LU factorization preconditioners.

Reference: base/src/BlaILU.c (fasp_iluk :72, fasp_ilut :467, fasp_ilutp
:906 — SPARSKIT-style row-wise IKJ factorization), BlaILUSetupCSR.c:40
(dispatch), PreCSR.c:198 (fasp_precond_ilu: z = U^{-1} L^{-1} r).

TPU-native apply: sequential triangular solves don't vectorize, so the
apply uses *level-scheduled* batched substitution — rows grouped into
dependency levels; each level is one dense gather+reduce step.  This is the
same strategy as the reference's own parallel ILU appliers
(topologic_sort_ILU / fasp_precond_dbsr_ilu_ls_omp, BlaILUSetupBSR.c,
PreBSR.c:844) taken to its TPU conclusion (SURVEY.md §2.9).

Factorization itself is a setup-phase host algorithm (scipy.sparse.spilu
for ILUt-style drop-tolerance factorization; a pure-python IKJ ILU(k) for
level-of-fill semantics).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..constants import ERROR_SOLVER_ILUSETUP, ILUType
from ..formats import CSRMatrix
from ..ops.operators import default_dtype
from ..utils.errors import FaspError
from ..utils.params import ILUParam


# ---------------------------------------------------------------------------
# factorization (host, setup phase)
# ---------------------------------------------------------------------------

def iluk_factor(A: CSRMatrix, lfil: int = 0
                ) -> Tuple[sp.csr_matrix, sp.csr_matrix]:
    """ILU(k): level-of-fill incomplete factorization
    (reference: fasp_symbfactor + fasp_iluk, BlaILU.c:72).

    Two passes: a symbolic level-of-fill pass fixes the pattern, then a
    numeric IKJ pass fills it.  Explicit zeros in the input count as
    pattern entries (level 0), matching the reference's pattern-driven
    symbolic factorization.  Returns (L, U), L unit-diagonal.
    """
    n = A.nrow
    m = A.to_scipy().tocsr().copy()
    m.sort_indices()

    # ---- symbolic pass: per-row {col: fill-level} -------------------------
    import bisect
    upper_patterns: List[dict] = []    # levels of U-part rows (j >= i)
    full_patterns: List[set] = []      # complete row patterns
    for i in range(n):
        lev = {int(c): 0 for c in m.indices[m.indptr[i]:m.indptr[i + 1]]}
        lev[i] = 0
        work = sorted(c for c in lev if c < i)
        w = 0
        while w < len(work):
            k = work[w]
            w += 1
            lev_ik = lev[k]
            for j, lev_kj in upper_patterns[k].items():
                if j <= k:
                    continue
                l_new = lev_ik + lev_kj + 1
                if j in lev:
                    if l_new < lev[j]:
                        lev[j] = l_new
                elif l_new <= lfil:
                    lev[j] = l_new
                    if j < i:
                        # new dependency must be eliminated in order
                        bisect.insort(work, j)
        upper_patterns.append({j: lv for j, lv in lev.items() if j >= i})
        full_patterns.append(set(lev))

    # ---- numeric pass over the fixed pattern ------------------------------
    Urows: List[dict] = []
    Lrows: List[dict] = []
    for i in range(n):
        row = {j: 0.0 for j in full_patterns[i]}
        s, e = m.indptr[i], m.indptr[i + 1]
        for idx in range(s, e):
            row[int(m.indices[idx])] = m.data[idx]
        for k in sorted(c for c in row if c < i):
            uk = Urows[k]
            ukk = uk.get(k, 0.0)
            if ukk == 0.0:
                continue
            lik = row[k] / ukk
            row[k] = lik
            for j, ukj in uk.items():
                if j > k and j in row:
                    row[j] -= lik * ukj
        Urows.append({j: v for j, v in row.items() if j >= i})
        Lrows.append({j: v for j, v in row.items() if j < i})

    # ---- assemble CSR without canonicalization surprises ------------------
    def build(rows_list, extra_diag):
        indptr = [0]
        indices = []
        data = []
        for i, row in enumerate(rows_list):
            items = sorted(row.items())
            if extra_diag:
                items.append((i, 1.0))
                items.sort()
            indices.extend(j for j, _ in items)
            data.extend(v for _, v in items)
            indptr.append(len(indices))
        return sp.csr_matrix((np.array(data), np.array(indices),
                              np.array(indptr)), shape=(n, n))

    return build(Lrows, True), build(Urows, False)


def ilut_factor(A: CSRMatrix, droptol: float = 1e-3, lfil: int = None
                ) -> Tuple[sp.csr_matrix, sp.csr_matrix]:
    """ILUt: threshold-based incomplete factorization
    (reference: fasp_ilut, BlaILU.c:467).  Uses SuperLU's ILUTP through
    scipy (drop tolerance + column permutation disabled for symmetry with
    the reference's default)."""
    n = A.nrow
    fill = 10.0 if lfil is None else max(float(lfil), 1.0)
    ilu = sp.linalg.spilu(A.to_scipy().tocsc(), drop_tol=droptol,
                          fill_factor=fill, permc_spec="NATURAL",
                          diag_pivot_thresh=0.0)
    # spilu returns Pr A Pc = L U; NATURAL + diag_pivot_thresh=0 keeps the
    # perms identity — EXCEPT when a zero diagonal forces SuperLU to
    # row-pivot anyway.  Discarding such a perm would silently corrupt the
    # preconditioner, so verify and make the caller take the pivoted path.
    if not (np.array_equal(ilu.perm_r, np.arange(n))
            and np.array_equal(ilu.perm_c, np.arange(n))):
        raise FaspError(ERROR_SOLVER_ILUSETUP,
                        "ILUt: SuperLU pivoted despite NATURAL ordering "
                        "(zero diagonal?) — use ILUtp")
    return ilu.L.tocsr(), ilu.U.tocsr()


def ilutp_factor(A: CSRMatrix, droptol: float = 1e-3, permtol: float = 0.05
                 ) -> Tuple[sp.csr_matrix, sp.csr_matrix, np.ndarray]:
    """ILUtp with partial pivoting (reference: fasp_ilutp, BlaILU.c:906)."""
    ilu = sp.linalg.spilu(A.to_scipy().tocsc(), drop_tol=droptol,
                          fill_factor=10.0)
    return ilu.L.tocsr(), ilu.U.tocsr(), (ilu.perm_r, ilu.perm_c)


# ---------------------------------------------------------------------------
# level-scheduled triangular solve (device, solve phase)
# ---------------------------------------------------------------------------

def _level_schedule(T: sp.csr_matrix, lower: bool) -> List[np.ndarray]:
    """Topological levels of the triangular dependency DAG
    (reference: topologic_sort_ILU, BlaILUSetupBSR.c).  Uses the native
    C++ kernel when available; NumPy loop fallback."""
    n = T.shape[0]
    indptr, indices = T.indptr, T.indices
    from .. import native
    out = native.level_schedule(indptr, indices, n, lower)
    if out is not None:
        depth_nat, nlev = out
        return [np.nonzero(depth_nat == lv)[0] for lv in range(nlev)]
    depth = np.zeros(n, dtype=np.int64)
    order = range(n) if lower else range(n - 1, -1, -1)
    for i in order:
        s, e = indptr[i], indptr[i + 1]
        dmax = 0
        for j in indices[s:e]:
            if (lower and j < i) or ((not lower) and j > i):
                dmax = max(dmax, depth[j] + 1)
        depth[i] = dmax
    nlev = int(depth.max()) + 1 if n else 0
    return [np.nonzero(depth == lv)[0] for lv in range(nlev)]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _TriLevel:
    rows: jax.Array      # (m,)  rows solved at this level
    cols: jax.Array      # (m,k) off-diagonal dependency columns
    vals: jax.Array      # (m,k)
    dinv: jax.Array      # (m,)  1/diagonal for these rows


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TriangularSolver:
    """Level-scheduled sparse triangular solve as a sequence of batched
    gather+reduce steps."""

    levels: Tuple[_TriLevel, ...]
    n: int = dataclasses.field(metadata=dict(static=True))

    def __call__(self, b: jax.Array) -> jax.Array:
        x = jnp.zeros_like(b)
        for lv in self.levels:
            acc = jnp.sum(lv.vals * x[lv.cols], axis=1)
            x = x.at[lv.rows].set(lv.dinv * (b[lv.rows] - acc))
        return x

    @classmethod
    def from_sparse(cls, T: sp.csr_matrix, lower: bool, dtype=None
                    ) -> "TriangularSolver":
        dtype = dtype or default_dtype()
        T = T.tocsr()
        T.sort_indices()
        n = T.shape[0]
        d = T.diagonal()
        d = np.where(d != 0.0, d, 1.0)
        level_rows = _level_schedule(T, lower)
        levels = []
        for rows in level_rows:
            sub = T[rows, :]
            # strictly lower/upper part only
            coo = sub.tocoo()
            keep = (coo.col < rows[coo.row]) if lower \
                else (coo.col > rows[coo.row])
            per_row_counts = np.bincount(coo.row[keep], minlength=len(rows))
            k = max(int(per_row_counts.max()) if len(rows) else 0, 1)
            cols = np.zeros((len(rows), k), dtype=np.int32)
            vals = np.zeros((len(rows), k), dtype=np.dtype(dtype))
            slot = np.zeros(len(rows), dtype=np.int64)
            for rr, cc, vv in zip(coo.row[keep], coo.col[keep],
                                  coo.data[keep]):
                cols[rr, slot[rr]] = cc
                vals[rr, slot[rr]] = vv
                slot[rr] += 1
            levels.append(_TriLevel(
                rows=jnp.asarray(rows.astype(np.int32)),
                cols=jnp.asarray(cols), vals=jnp.asarray(vals),
                dinv=jnp.asarray(1.0 / d[rows], dtype=dtype)))
        return cls(levels=tuple(levels), n=n)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ILUPrecond:
    """z = U^{-1} L^{-1} r via level-scheduled solves
    (reference: fasp_precond_ilu, PreCSR.c:198).

    For pivoted factorizations (ILUtp) the row/column permutations apply
    around the solves: w[perm_r] = r; z = U^{-1} L^{-1} w; out = z[perm_c]
    (verified against scipy's spilu.solve)."""

    Lsolve: TriangularSolver
    Usolve: TriangularSolver
    perm_in: Optional[jax.Array] = None     # inverse row permutation
    perm_out: Optional[jax.Array] = None    # column permutation

    def __call__(self, r: jax.Array) -> jax.Array:
        if self.perm_in is not None:
            r = r[self.perm_in]
        z = self.Usolve(self.Lsolve(r))
        if self.perm_out is not None:
            z = z[self.perm_out]
        return z


def setup_ilu(A: CSRMatrix, param: ILUParam = None, dtype=None) -> ILUPrecond:
    """Factor + build device solvers (reference: fasp_ilu_dcsr_setup,
    BlaILUSetupCSR.c:40)."""
    param = param or ILUParam()
    dtype = dtype or default_dtype()
    t = int(param.ILU_type)
    from .. import native

    def _pivoted() -> ILUPrecond:
        L, U, (perm_r, perm_c) = ilutp_factor(A, param.ILU_droptol,
                                              param.ILU_permtol)
        return ILUPrecond(
            Lsolve=TriangularSolver.from_sparse(L, lower=True, dtype=dtype),
            Usolve=TriangularSolver.from_sparse(U, lower=False, dtype=dtype),
            perm_in=jnp.asarray(np.argsort(perm_r).astype(np.int32)),
            perm_out=jnp.asarray(perm_c.astype(np.int32)))

    if t == ILUType.ILUK:
        out = native.iluk(A, param.ILU_lfil)
        if out is not None:
            L, U = out
        elif A.nrow <= 20000:
            L, U = iluk_factor(A, param.ILU_lfil)
        else:   # no toolchain and too big for the python ILU(k): ILUt
            try:
                L, U = ilut_factor(A, param.ILU_droptol)
            except FaspError:           # zero diagonal forced pivoting
                return _pivoted()
    elif t == ILUType.ILUTP:
        return _pivoted()
    else:
        out = native.ilut(A, param.ILU_lfil, param.ILU_droptol)
        if out is not None:
            L, U = out
        else:
            try:
                L, U = ilut_factor(A, param.ILU_droptol,
                                   None if param.ILU_lfil == 0
                                   else param.ILU_lfil)
            except FaspError:
                return _pivoted()
    return ILUPrecond(
        Lsolve=TriangularSolver.from_sparse(L, lower=True, dtype=dtype),
        Usolve=TriangularSolver.from_sparse(U, lower=False, dtype=dtype))
