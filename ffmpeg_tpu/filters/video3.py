"""Point/blur video filters (analogs of libavfilter vf_negate.c, vf_eq.c,
vf_boxblur.c, vf_unsharp.c, vf_hue.c). All are TraceableFilters: they
fuse into one XLA program with the rest of the chain; the blurs use
cumulative sums (O(1) per pixel, any radius, MXU/VPU-friendly)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..formats import pixfmt as _pf
from ..utils.options import opt_float, opt_int, opt_str
from .base import TraceableFilter, register_filter


@register_filter
class NegateFilter(TraceableFilter):
    """Invert every component (vf_negate)."""

    name = "negate"
    OPTIONS = (opt_int("negate_alpha", default=0),)

    def make_tracer(self, props):
        desc = _pf.get(props.format)
        maxv = [(1 << c.depth) - 1 for c in desc.comp]

        def fn(comps):
            out = []
            for i, c in enumerate(comps):
                if i == 3 and not self.negate_alpha:
                    out.append(c)
                else:
                    out.append((maxv[i] - c.astype(jnp.int32))
                               .astype(c.dtype))
            return out
        return fn, props


@register_filter
class EqFilter(TraceableFilter):
    """Brightness / contrast / saturation / gamma (vf_eq semantics:
    brightness [-1,1], contrast [-1000,1000] around 1, saturation [0,3],
    gamma (0,10])."""

    name = "eq"
    OPTIONS = (opt_float("contrast", default=1.0),
               opt_float("brightness", default=0.0),
               opt_float("saturation", default=1.0),
               opt_float("gamma", default=1.0))

    def make_tracer(self, props):
        desc = _pf.get(props.format)
        if desc.is_rgb:
            raise ValueError("eq: YUV input required")
        c = float(self.contrast)
        b = float(self.brightness) * 255.0
        sat = float(self.saturation)
        g = float(self.gamma)

        def fn(comps):
            y = comps[0].astype(jnp.float32)
            y = (y - 128.0) * c + 128.0 + b
            if g != 1.0:
                y = jnp.power(jnp.clip(y, 0.0, 255.0) / 255.0,
                              1.0 / g) * 255.0
            out = [jnp.clip(jnp.round(y), 0, 255).astype(comps[0].dtype)]
            for ch in comps[1:3]:
                x = (ch.astype(jnp.float32) - 128.0) * sat + 128.0
                out.append(jnp.clip(jnp.round(x), 0, 255).astype(ch.dtype))
            return out + list(comps[3:])
        return fn, props


def _box1d(x, r, axis):
    """Box average of width 2r+1 along axis with edge clamping, exact
    rational normalization (computed via cumulative sums)."""
    if r <= 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xe = jnp.pad(x, pad, mode="edge")
    cs = jnp.cumsum(xe, axis=axis)
    pad0 = [(0, 0)] * x.ndim
    pad0[axis] = (1, 0)
    cs = jnp.pad(cs, pad0)
    hi = jnp.take(cs, jnp.arange(2 * r + 1, 2 * r + 1 + n), axis=axis)
    lo = jnp.take(cs, jnp.arange(0, n), axis=axis)
    return (hi - lo) / (2 * r + 1)


@register_filter
class BoxBlurFilter(TraceableFilter):
    """Separable box blur, per-plane radii + power (vf_boxblur)."""

    name = "boxblur"
    OPTIONS = (opt_int("luma_radius", default=2),
               opt_int("luma_power", default=1),
               opt_int("chroma_radius", default=-1),
               opt_int("chroma_power", default=-1))

    def make_tracer(self, props):
        desc = _pf.get(props.format)
        lr = int(self.luma_radius)
        lp = max(0, int(self.luma_power))
        cr = int(self.chroma_radius)
        cp = int(self.chroma_power)
        if cr < 0:
            cr = lr
        if cp < 0:
            cp = lp

        def blur(x, r, p):
            y = x.astype(jnp.float32)
            for _ in range(p):
                y = _box1d(_box1d(y, r, -1), r, -2)
            return jnp.clip(jnp.round(y), 0, 255).astype(x.dtype)

        def fn(comps):
            out = []
            for i, c in enumerate(comps):
                r, p = (lr, lp) if (i == 0 or desc.is_rgb) else (cr, cp)
                out.append(blur(c, r, p))
            return out
        return fn, props


@register_filter
class UnsharpFilter(TraceableFilter):
    """Sharpen/blur: out = in + amount * (in - box(in)) (vf_unsharp with
    a box kernel; amount>0 sharpens, <0 blurs)."""

    name = "unsharp"
    OPTIONS = (opt_int("luma_msize_x", default=5),
               opt_int("luma_msize_y", default=5),
               opt_float("luma_amount", default=1.0),
               opt_float("chroma_amount", default=0.0))

    def make_tracer(self, props):
        desc = _pf.get(props.format)
        rx = max(0, (int(self.luma_msize_x) - 1) // 2)
        ry = max(0, (int(self.luma_msize_y) - 1) // 2)
        la = float(self.luma_amount)
        ca = float(self.chroma_amount)

        def sharpen(x, amount):
            if amount == 0.0:
                return x
            y = x.astype(jnp.float32)
            blur = _box1d(_box1d(y, rx, -1), ry, -2)
            out = y + amount * (y - blur)
            return jnp.clip(jnp.round(out), 0, 255).astype(x.dtype)

        def fn(comps):
            out = []
            for i, c in enumerate(comps):
                amount = la if (i == 0 or desc.is_rgb) else ca
                out.append(sharpen(c, amount))
            return out
        return fn, props


@register_filter
class HueFilter(TraceableFilter):
    """Hue rotation (degrees) + saturation on the chroma plane (vf_hue)."""

    name = "hue"
    OPTIONS = (opt_float("h", default=0.0), opt_float("s", default=1.0))

    def make_tracer(self, props):
        desc = _pf.get(props.format)
        if desc.is_rgb:
            raise ValueError("hue: YUV input required")
        rad = float(self.h) * np.pi / 180.0
        s = float(self.s)
        c_, s_ = float(np.cos(rad) * s), float(np.sin(rad) * s)

        def fn(comps):
            u = comps[1].astype(jnp.float32) - 128.0
            v = comps[2].astype(jnp.float32) - 128.0
            nu = u * c_ - v * s_ + 128.0
            nv = u * s_ + v * c_ + 128.0
            return [comps[0],
                    jnp.clip(jnp.round(nu), 0, 255).astype(comps[1].dtype),
                    jnp.clip(jnp.round(nv), 0, 255).astype(comps[2].dtype),
                    ] + list(comps[3:])
        return fn, props
