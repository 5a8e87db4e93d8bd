"""Typed op-list IR for pixel pipelines (analog of libswscale/ops.h:36-70).

The reference lowers every conversion to a list of READ/SWIZZLE/CONVERT/
LINEAR/DITHER/FILTER ops, optimizes it (ops_optimizer.c), and compiles per
backend (C/x86-JIT/aarch64/SPIR-V). Here the op list is a Python IR whose
single backend is XLA: `compile_ops` folds the list into one traced jax
function, XLA fuses the elementwise chains, and the resize ops hit the MXU
as matmuls. The optimizer below does the algebra XLA can't see across op
boundaries (merging affine stages into one 3x4 matrix).

State flowing through ops: a list of component arrays, each (..., h, w)
float32 (normalized: Y/R/G/B in [0,1], chroma in [-0.5,0.5], alpha [0,1]).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Op:
    def apply(self, comps: List[jax.Array]) -> List[jax.Array]:  # pragma: no cover
        raise NotImplementedError


@dataclass
class ToFloat(Op):
    """Cast native ints to float32 and apply per-comp affine y=(x-b)/a."""
    offsets: Tuple[float, ...]
    scales: Tuple[float, ...]

    def apply(self, comps):
        out = []
        for x, b, a in zip(comps, self.offsets, self.scales):
            out.append((x.astype(jnp.float32) - b) * (1.0 / a))
        return out


@dataclass
class FromFloat(Op):
    """Denormalize + round + clamp to integer code values, y=x*a+b."""
    offsets: Tuple[float, ...]
    scales: Tuple[float, ...]
    maxval: Tuple[int, ...]
    dtype: np.dtype = np.uint8
    dither: Optional[str] = None   # None | "bayer"

    _BAYER8 = (np.array([
        [0, 48, 12, 60, 3, 51, 15, 63],
        [32, 16, 44, 28, 35, 19, 47, 31],
        [8, 56, 4, 52, 11, 59, 7, 55],
        [40, 24, 36, 20, 43, 27, 39, 23],
        [2, 50, 14, 62, 1, 49, 13, 61],
        [34, 18, 46, 30, 33, 17, 45, 29],
        [10, 58, 6, 54, 9, 57, 5, 53],
        [42, 26, 38, 22, 41, 25, 37, 21]], np.float32) + 0.5) / 64.0

    def apply(self, comps):
        out = []
        for x, b, a, mx in zip(comps, self.offsets, self.scales, self.maxval):
            y = x * a + b
            if self.dither == "bayer":
                h, w = y.shape[-2], y.shape[-1]
                d = jnp.asarray(np.tile(self._BAYER8,
                                        ((h + 7) // 8, (w + 7) // 8))[:h, :w])
                y = jnp.floor(y + d)
            else:
                y = jnp.floor(y + 0.5)
            y = jnp.clip(y, 0, mx)
            out.append(y.astype(self.dtype))
        return out


@dataclass
class Linear(Op):
    """Cross-component affine: comps' = M @ comps + off.

    M is (n_out, n_in) over the first n_in comps; trailing comps (alpha)
    pass through untouched. This single op expresses swizzle, colorspace
    matrices, range scaling, gray↔color — and the optimizer composes
    adjacent Linears into one.
    """
    matrix: np.ndarray            # (n_out, n_in) float64
    offset: np.ndarray            # (n_out,) float64

    def apply(self, comps):
        n_in = self.matrix.shape[1]
        n_out = self.matrix.shape[0]
        ins = comps[:n_in]
        rest = comps[n_in:]
        out = []
        m = self.matrix
        for i in range(n_out):
            acc = None
            for j in range(n_in):
                c = float(m[i, j])
                if c == 0.0:
                    continue
                t = ins[j] if c == 1.0 else ins[j] * c
                acc = t if acc is None else acc + t
            if acc is None:
                acc = jnp.zeros_like(ins[0])
            o = float(self.offset[i])
            if o != 0.0:
                acc = acc + o
            out.append(acc)
        return out + list(rest)

    def compose(self, other: "Linear") -> "Linear":
        """self ∘ other (other runs first)."""
        m = self.matrix @ other.matrix
        off = self.matrix @ other.offset + self.offset
        return Linear(m, off)


@dataclass
class ResizeAxis(Op):
    """Per-component resize along one axis via tap-matrix matmul (MXU)."""
    axis: int                     # -2 = vertical (h), -1 = horizontal (w)
    matrices: Tuple[Optional[np.ndarray], ...]  # one per comp; None = skip

    def apply(self, comps):
        out = []
        for x, m in zip(comps, self.matrices):
            if m is None:
                out.append(x)
                continue
            mm = jnp.asarray(m)
            if self.axis == -1:
                # (..., h, w_in) @ (w_in, w_out)
                out.append(
                    jnp.matmul(x, mm.T, preferred_element_type=jnp.float32))
            else:
                # (h_out, h_in) @ (..., h_in, w)
                out.append(
                    jnp.einsum("oh,...hw->...ow", mm, x,
                               preferred_element_type=jnp.float32))
        return out


@dataclass
class SelectComps(Op):
    """Reorder/drop/add components. spec[i] = source index, or a float
    constant to synthesize (e.g. opaque alpha = 1.0, gray chroma = 0.0)."""
    spec: Tuple[object, ...]

    def apply(self, comps):
        out = []
        for s in self.spec:
            if isinstance(s, int):
                out.append(comps[s])
            else:
                out.append(jnp.full_like(comps[0], float(s)))
        return out


def compile_ops(ops: Sequence[Op]):
    """Fold an op list into one traceable function comps→comps."""
    ops = tuple(ops)

    def fn(comps: List[jax.Array]) -> List[jax.Array]:
        for op in ops:
            comps = op.apply(comps)
        return comps

    return fn


def optimize(ops: Sequence[Op]) -> List[Op]:
    """Algebraic op fusion (analog of ops_optimizer.c):
    - merge adjacent Linear ops into one matrix
    - fold ToFloat's affine into a following Linear when widths match
    - drop identity Linear / identity SelectComps
    """
    out: List[Op] = []
    for op in ops:
        if isinstance(op, Linear) and out and isinstance(out[-1], Linear):
            prev = out.pop()
            if op.matrix.shape[1] == prev.matrix.shape[0]:
                out.append(op.compose(prev))
                continue
            out.append(prev)
        if isinstance(op, Linear):
            n = op.matrix.shape[0]
            if (op.matrix.shape == (n, n)
                    and np.allclose(op.matrix, np.eye(n))
                    and np.allclose(op.offset, 0.0)):
                continue
        if isinstance(op, SelectComps) and all(
                isinstance(s, int) and s == i for i, s in enumerate(op.spec)):
            continue
        out.append(op)
    return out
