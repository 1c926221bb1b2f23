"""Pallas TPU kernels for the hot stencil operations.

The structured fast path's SpMV is a sum of shifted multiply-adds.  This
kernel streams each x slab into VMEM once (with its one-row halo, double-
buffered DMA) and applies all bands out of VMEM — one HBM pass over bands
+ one over x, the memory-traffic lower bound for a stencil apply.

Measured on TPU v5e at 1023^2 / 5-point f32: this kernel 130 us/SpMV vs
XLA's fused lowering of DiaOperator at 107 us (48.7 Gnnz/s).  XLA already
fuses the shifted multiply-adds into a near-optimal single pass for this
op, so the XLA path remains the DEFAULT; the kernel is kept as the
explicit-DMA formulation — the starting point for fusions XLA cannot do
(whole Chebyshev smoother steps, residual+restrict) and the template for
the inter-chip RDMA variant.

Only 2-D structured operators with per-axis offsets in {-1, 0, 1} (the
5/9-point stencils the structured AMG produces at every level) fit this
kernel; ``interpret=True`` runs it on CPU for testing.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit,
         static_argnames=("offs2d", "ny", "nx", "tile", "interpret"))
def dia_spmv_2d_pallas(bands2d, xp, offs2d: Tuple[Tuple[int, int], ...],
                       ny: int, nx: int, tile: int = 64,
                       interpret: bool = False):
    """y = A x for a 2-D stencil operator.

    bands2d: (k, ny_pad, nx) row-aligned band values (ny_pad = ceil to
    tile); xp: (ny_pad + 2, nx + 2) zero-padded input (one halo cell per
    side); offs2d: per-band (dy, dx), each in {-1, 0, 1}.  Returns
    (ny_pad, nx).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = bands2d.shape[0]
    ny_pad = bands2d.shape[1]
    ntiles = ny_pad // tile
    dtype = bands2d.dtype
    nxh = xp.shape[1]                       # nx + 2

    def slab_dma(xp_ref, scratch, sems, step, slot):
        # slab = x rows [step*tile - 8, step*tile + tile + 8) in xp
        # coordinates (xp has an 8-row top pad so the start stays
        # sublane-aligned); scratch row 8+dy is the tile's first x row
        # shifted by dy
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(step * tile, tile + 16), :],
            scratch.at[slot], sems.at[slot])

    def kernel(xp_ref, bands_ref, y_ref, scratch, sems):
        # int32 throughout: under jax_enable_x64 program ids trace as
        # i64 and Mosaic rejects i64 memref indices
        i = jnp.int32(pl.program_id(0))
        n = jnp.int32(pl.num_programs(0))
        two = jnp.int32(2)
        slot = jax.lax.rem(i, two)
        nxt = jax.lax.rem(i + 1, two)

        @pl.when(i == 0)
        def _():
            slab_dma(xp_ref, scratch, sems, 0, 0).start()

        # double buffering: prefetch the next slab while computing this one
        @pl.when(i + 1 < n)
        def _():
            slab_dma(xp_ref, scratch, sems, i + 1, nxt).start()

        slab_dma(xp_ref, scratch, sems, i, slot).wait()
        acc = jnp.zeros((tile, nx), dtype=dtype)
        for kk, (dy, dx) in enumerate(offs2d):
            xs = scratch[slot, 8 + dy:8 + dy + tile, 1 + dx:1 + dx + nx]
            acc = acc + bands_ref[kk] * xs
        y_ref[:, :] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ny_pad, nx), dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # xp in HBM
            pl.BlockSpec((k, tile, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 16, nxh), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, bands2d)


class StencilSpmv:
    """Host-prepared wrapper: flat DIA (offsets, bands, dims) -> the Pallas
    2-D stencil kernel with all padding precomputed."""

    def __init__(self, offsets, bands_flat: np.ndarray,
                 dims: Tuple[int, int], dtype, tile: int = 64,
                 interpret: bool = False):
        self.interpret = interpret
        ny, nx = dims
        offs2d = []
        for o in offsets:
            dy = int(np.rint(o / nx))
            dx = int(o - dy * nx)
            if abs(dy) > 1 or abs(dx) > 1:
                raise ValueError("stencil kernel needs |dy|,|dx| <= 1")
            offs2d.append((dy, dx))
        self.offs2d = tuple(offs2d)
        self.ny, self.nx = ny, nx
        self.tile = tile
        ny_pad = _round_up(ny, tile)
        b = np.asarray(bands_flat, dtype=dtype).reshape(-1, ny, nx)
        if ny_pad != ny:
            b = np.pad(b, ((0, 0), (0, ny_pad - ny), (0, 0)))
        self.ny_pad = ny_pad
        self.bands2d = jnp.asarray(b)

    def __call__(self, x):
        xg = x.reshape(self.ny, self.nx)
        # 8-row top pad (DMA slab alignment) + bottom fill so the last
        # tile's (tile+16)-row slab stays in range; 1 halo column on the
        # left, right-padded so the width is lane-aligned (128)
        wpad = _round_up(self.nx + 2, 128) - self.nx - 1
        xp = jnp.pad(xg, ((8, 8 + self.ny_pad - self.ny), (1, wpad)))
        y = dia_spmv_2d_pallas(self.bands2d, xp, self.offs2d,
                               self.ny, self.nx, self.tile,
                               interpret=self.interpret)
        return y[:self.ny].reshape(-1)


@partial(jax.jit,
         static_argnames=("offs2d", "ny", "nx", "tile", "interpret"))
def const_stencil_spmv_2d_pallas(consts, xp,
                                 offs2d: Tuple[Tuple[int, int], ...],
                                 ny: int, nx: int, tile: int = 128,
                                 interpret: bool = False):
    """y = A x for a 2-D CONSTANT-coefficient stencil at HBM-resident
    sizes.

    The coefficients are scalars (SMEM), so the only HBM traffic is ONE
    pass over x (slab-streamed into VMEM with a one-row halo, double-
    buffered DMA) and ONE pass over y — the speed-of-light traffic for
    any matvec.  XLA's fused lowering of the same op re-reads x once per
    shifted operand at working sets past VMEM; this kernel closes part
    of that gap (VERDICT r4 item 2; reference kernel-of-record:
    BlaSpmvCSR.c:242).

    Measured on the tunneled v5e at 8192^2 f32 (counted 2n*4B): this
    kernel 158 GB/s vs XLA's 131 on the 5-point apply (+21%); deeper
    pipelines (3-4 slots), larger tiles (VMEM-capped at 16 MB/core),
    and an auto-pipelined BlockSpec variant all measured the same ~158,
    while XLA's PURE-STREAM elementwise op reaches 242 — so dispatch is
    gated to k >= 3 bands, where XLA's re-reads lose more than the DMA
    path's ~160 GB/s ceiling costs.

    consts: (k, 1) scalar coefficients; xp: (8 + ny_pad + 8, nxh)
    zero-padded input (8-row top pad for DMA sublane alignment, 1 halo
    column left, lane-aligned width); offs2d: per-band (dy, dx) in
    {-1, 0, 1}.  Returns (ny_pad, nx).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny_pad = xp.shape[0] - 16
    ntiles = ny_pad // tile
    dtype = xp.dtype
    nxh = xp.shape[1]

    def slab_dma(xp_ref, scratch, sems, step, slot):
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(step * tile, tile + 16), :],
            scratch.at[slot], sems.at[slot])

    def kernel(consts_ref, xp_ref, y_ref, scratch, sems):
        # int32 throughout: under jax_enable_x64 program ids trace as
        # i64 and Mosaic rejects i64 memref indices
        i = jnp.int32(pl.program_id(0))
        n = jnp.int32(pl.num_programs(0))
        two = jnp.int32(2)
        slot = jax.lax.rem(i, two)
        nxt = jax.lax.rem(i + 1, two)

        @pl.when(i == 0)
        def _():
            slab_dma(xp_ref, scratch, sems, 0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            slab_dma(xp_ref, scratch, sems, i + 1, nxt).start()

        slab_dma(xp_ref, scratch, sems, i, slot).wait()
        # accumulate INTO the output ref: one live (tile, nx) buffer at
        # a time — building a functional `acc` chain made Mosaic hold a
        # per-band stack temporary each (k+2 tile-sized buffers) and
        # blow the 16 MB scoped-VMEM limit at 8192-wide rows
        dy0, dx0 = offs2d[0]
        y_ref[:, :] = consts_ref[0, 0] * scratch[
            slot, 8 + dy0:8 + dy0 + tile, 1 + dx0:1 + dx0 + nx]
        for kk, (dy, dx) in enumerate(offs2d[1:], start=1):
            y_ref[:, :] += consts_ref[kk, 0] * scratch[
                slot, 8 + dy:8 + dy + tile, 1 + dx:1 + dx + nx]

    k = consts.shape[0]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ny_pad, nx), dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # coefficients
            pl.BlockSpec(memory_space=pltpu.ANY),          # xp in HBM
        ],
        out_specs=pl.BlockSpec((tile, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 16, nxh), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(consts, xp)


def const_stencil_apply_2d(consts_flat, coords, dims, x,
                           tile: int = 0, interpret: bool = False):
    """Host-shape wrapper around :func:`const_stencil_spmv_2d_pallas`:
    pad x, run, unpad.  ``consts_flat`` is a (k, 1) scalar array.

    ``tile=0`` picks the largest row tile whose VMEM footprint
    (double-buffered (tile+16)-row slabs + the output block) stays under
    a 12 MB budget — v5e scoped VMEM is 16 MB, and at 8192-wide rows a
    128-row tile overflows it."""
    ny, nx = dims
    if tile <= 0:
        nxh = _round_up(nx + 2, 128)
        budget = 12 << 20
        tile = 8
        for cand in (256, 128, 96, 64, 32, 16, 8):
            # 2 slab buffers + double-buffered output block + one live
            # multiply temporary (the kernel accumulates in place)
            need = (2 * (cand + 16) * nxh + 3 * cand * nx) * 4
            if need <= budget:
                tile = cand
                break
    ny_pad = _round_up(ny, tile)
    xg = x.reshape(ny, nx)
    wpad = _round_up(nx + 2, 128) - nx - 1
    xp = jnp.pad(xg, ((8, 8 + ny_pad - ny), (1, wpad)))
    # under jax_enable_x64 Pallas canonicalizes ref indices to i64 and
    # Mosaic rejects them ('tpu.memref_slice ... must be 32-bit'); the
    # kernel is f32/i32 arithmetic regardless, so trace it with x64 off
    with jax.enable_x64(False):
        y = const_stencil_spmv_2d_pallas(consts_flat, xp, tuple(coords),
                                         ny, nx, tile,
                                         interpret=interpret)
    return y[:ny].reshape(-1)


