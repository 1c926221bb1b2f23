"""Pytree packing: freeze a host pytree as ONE flat device buffer and
rebuild it with traced slices INSIDE the consuming jitted program.

Why this exists (measured on the tunneled v5e):
- per-leaf ``jax.device_put`` costs ~20 ms dispatch latency — a hierarchy
  with ~70 leaves pays ~1.4 s;
- an on-device split program (one concat upload + lax.slice program) costs
  ~1-1.5 s the first time a process executes it (compile-cache load +
  device program load), for every layout;
- a packed buffer needs NO extra program at all: the single h2d transfer
  is program-free, and the slicing happens inside the solver program the
  caller compiles (and warms) anyway.

This is the TPU-native answer to the reference's single-arena AMG_data
allocation (PreDataInit.c): the whole hierarchy is one contiguous block,
and "pointers into the block" become static slice offsets baked into the
solve program.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PackedPytree:
    """A pytree whose array leaves live concatenated in one device buffer.

    ``unpack(buf)`` rebuilds the tree; called inside a jitted function with
    the buffer as an argument, the leaves are fusion-friendly slices and
    the packed layout never costs its own XLA program.
    """

    buf: jax.Array                                   # flat device buffer
    treedef: Any
    layout: Tuple[Tuple[int, int, Tuple[int, ...]], ...]
    leaf_slot: Tuple[int, ...]                       # leaf -> layout index
    nbytes: int

    def unpack(self, buf: Optional[jax.Array] = None):
        buf = self.buf if buf is None else buf
        devs = [
            jax.lax.slice(buf, (o,), (o + s,)).reshape(shp)
            for o, s, shp in self.layout]
        return jax.tree_util.tree_unflatten(
            self.treedef, [devs[i] for i in self.leaf_slot])


def pack_pytree(tree, dtype) -> Optional[PackedPytree]:
    """Pack every array leaf of a HOST pytree (cast to ``dtype``) into one
    device buffer.  Returns None if any leaf is already a device array or
    not float-castable (callers fall back to a classic freeze)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np_dtype = np.dtype(dtype)
    slot_of: dict = {}
    arrs = []
    leaf_slot = []
    for l in leaves:
        if isinstance(l, jax.Array):
            return None
        key = id(l)
        if key not in slot_of:
            a = np.asarray(l)
            if not np.issubdtype(a.dtype, np.floating):
                return None
            slot_of[key] = len(arrs)
            arrs.append(a.astype(np_dtype, copy=False))
        leaf_slot.append(slot_of[key])
    layout = []
    off = 0
    for a in arrs:
        layout.append((off, int(a.size), tuple(a.shape)))
        off += int(a.size)
    flat = np.concatenate([a.ravel() for a in arrs]) if arrs else \
        np.zeros(0, dtype=np_dtype)
    buf = jnp.asarray(flat)             # ONE program-free h2d transfer
    return PackedPytree(buf=buf, treedef=treedef, layout=tuple(layout),
                        leaf_slot=tuple(leaf_slot), nbytes=flat.nbytes)


@dataclass(frozen=True)
class PackedHierarchy:
    """An AMG hierarchy frozen as packed buffers: ``p32`` holds the solve-
    precision hierarchy (fine64 field excluded), ``p64`` the optional f64
    fine operator for device-resident refinement."""

    p32: PackedPytree
    p64: Optional[PackedPytree]

    @property
    def bufs(self):
        return (self.p32.buf,
                self.p64.buf if self.p64 is not None else None)

    def unpack(self, b32=None, b64=None):
        hier = self.p32.unpack(b32)
        if self.p64 is not None:
            hier = dataclasses.replace(hier, fine64=self.p64.unpack(b64))
        return hier

    def materialize(self):
        """Concrete device hierarchy via one jitted unpack (for eager
        consumers like SpMV micro-benchmarks; solvers should unpack inside
        their own program instead)."""
        if self.p64 is not None:
            fn = jax.jit(lambda a, b: self.unpack(a, b))
            return fn(self.p32.buf, self.p64.buf)
        fn = jax.jit(lambda a: self.unpack(a))
        return fn(self.p32.buf)
