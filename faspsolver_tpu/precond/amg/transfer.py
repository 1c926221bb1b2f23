"""Grid-transfer operators (prolongation / restriction) as device pytrees.

Reference: boolean aggregation transfer (form_tentative_p,
PreAMGAggregationCSR.inl:40; fast paths mxv_agg / rap_agg,
BlaSpmvCSR.c:438,1276) and general sparse P/R from classical/smoothed
interpolation (PreAMGInterp.c).

TPU-native: a boolean (unsmoothed-aggregation) P never materializes as a
matrix — prolongation is a gather ``x_f = x_c[agg]`` and restriction is a
``segment_sum`` — which is exactly why the reference special-cases boolean P.
General P/R use the ELL operator.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...formats import CSRMatrix
from ...ops.operators import CooOperator, EllOperator, default_dtype


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AggProlong:
    """Boolean tentative prolongation from an aggregation map."""

    agg: jax.Array      # (n_fine,) int32 aggregate id per fine dof
    n_fine: int = dataclasses.field(metadata=dict(static=True))
    n_coarse: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_fine, self.n_coarse)

    def __call__(self, xc: jax.Array) -> jax.Array:
        return xc[self.agg]

    @classmethod
    def from_agg(cls, agg: np.ndarray, n_coarse: int) -> "AggProlong":
        from ...ops.operators import asdev
        return cls(asdev(agg.astype(np.int32)), len(agg), int(n_coarse))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AggRestrict:
    """Boolean restriction (transpose of AggProlong): segment sum."""

    agg: jax.Array
    n_fine: int = dataclasses.field(metadata=dict(static=True))
    n_coarse: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_coarse, self.n_fine)

    def __call__(self, rf: jax.Array) -> jax.Array:
        return jax.ops.segment_sum(rf, self.agg, num_segments=self.n_coarse)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockAggProlong:
    """Blockwise boolean prolongation: fine block i takes coarse block
    agg[i] (reference: form_boolean_p_bsr, PreAMGAggregationBSR.inl)."""

    agg: jax.Array
    n_fine: int = dataclasses.field(metadata=dict(static=True))
    n_coarse: int = dataclasses.field(metadata=dict(static=True))
    nb: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_fine * self.nb, self.n_coarse * self.nb)

    def __call__(self, xc: jax.Array) -> jax.Array:
        return xc.reshape(self.n_coarse, self.nb)[self.agg].reshape(-1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockAggRestrict:
    agg: jax.Array
    n_fine: int = dataclasses.field(metadata=dict(static=True))
    n_coarse: int = dataclasses.field(metadata=dict(static=True))
    nb: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_coarse * self.nb, self.n_fine * self.nb)

    def __call__(self, rf: jax.Array) -> jax.Array:
        rb = rf.reshape(self.n_fine, self.nb)
        return jax.ops.segment_sum(
            rb, self.agg, num_segments=self.n_coarse).reshape(-1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CooProlong:
    """General sparse prolongation in COO form.  The SAME three arrays
    serve the transposed restriction (:class:`CooRestrict` holds
    references to them), so R = P^T costs zero extra device memory —
    the TPU answer to the reference's explicit fasp_dcsr_trans copy."""

    rows: jax.Array      # (nnz_pad,) int32 fine ids (pad -> n_fine, dropped)
    cols: jax.Array      # (nnz_pad,) int32 coarse ids (pad -> n_coarse)
    vals: jax.Array      # (nnz_pad,)
    n_fine: int = dataclasses.field(metadata=dict(static=True))
    n_coarse: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_fine, self.n_coarse)

    @property
    def dtype(self):
        return self.vals.dtype

    def __call__(self, xc: jax.Array) -> jax.Array:
        prod = self.vals * xc[self.cols]
        y = jax.ops.segment_sum(prod, self.rows,
                                num_segments=self.n_fine + 1,
                                indices_are_sorted=True)
        return y[: self.n_fine]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CooRestrict:
    """R = P^T applied straight off P's COO arrays (shared, see
    :class:`CooProlong`): gather by fine row, segment-sum by coarse col."""

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    n_fine: int = dataclasses.field(metadata=dict(static=True))
    n_coarse: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_coarse, self.n_fine)

    @property
    def dtype(self):
        return self.vals.dtype

    def __call__(self, xf: jax.Array) -> jax.Array:
        prod = self.vals * xf[self.rows]
        y = jax.ops.segment_sum(prod, self.cols,
                                num_segments=self.n_coarse + 1)
        return y[: self.n_coarse]


def csr_transfer(P: CSRMatrix, dtype=None, share: bool = True):
    """General sparse prolongation + transpose restriction.

    ``share=True`` (default): one COO array set serves both directions
    (halves the transfer's device footprint; restriction pays an unsorted
    segment-sum).  ``share=False``: independent row-sorted ELL operators
    (reference: R = P^T, fasp_dcsr_trans)."""
    dtype = dtype or default_dtype()
    if not share:
        Pop = EllOperator.from_csr(P, dtype=dtype)
        Rop = EllOperator.from_csr(P.transpose(), dtype=dtype)
        return Pop, Rop
    from ...ops.operators import _round_up, asdev
    nf, nc = P.shape
    nnz = P.nnz
    pad = _round_up(max(nnz, 1), 128)
    rows = np.full(pad, nf, dtype=np.int32)
    cols = np.full(pad, nc, dtype=np.int32)
    vals = np.zeros(pad, dtype=np.dtype(dtype))
    rows[:nnz] = np.repeat(np.arange(nf, dtype=np.int32),
                           np.diff(P.indptr))
    cols[:nnz] = P.indices
    vals[:nnz] = P.data
    r, c, v = asdev(rows), asdev(cols), asdev(vals)
    return (CooProlong(r, c, v, nf, nc),
            CooRestrict(r, c, v, nf, nc))
