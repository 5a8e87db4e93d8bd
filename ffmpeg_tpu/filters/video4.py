"""Additional video filters (analogs of vf_gblur/avgblur/edgedetect/
swapuv/monochrome/vignette/drawgrid/framestep/select/tmix/noise.c)."""

from __future__ import annotations

from collections import deque
from dataclasses import replace
from typing import List, Optional

import numpy as np

from ..core.frame import Frame
from ..formats import pixfmt as _pf
from ..utils import eval as _eval
from ..utils.error import InvalidData
from ..utils.options import opt_float, opt_int, opt_str
from .base import Filter, TraceableFilter, register_filter


def _sep_conv(plane, k):
    """Separable symmetric convolution with edge replication."""
    import jax.numpy as jnp
    r = (len(k) - 1) // 2
    kk = jnp.asarray(k, jnp.float32)
    x = plane.astype(jnp.float32)
    xp = jnp.pad(x, ((r, r), (0, 0)), mode="edge")
    x = sum(kk[i] * xp[i:i + x.shape[0], :] for i in range(len(k)))
    xp = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
    x = sum(kk[i] * xp[:, i:i + plane.shape[1]] for i in range(len(k)))
    return x


@register_filter
class GBlurFilter(TraceableFilter):
    """Gaussian blur (vf_gblur.c)."""

    name = "gblur"
    OPTIONS = (opt_float("sigma", default=0.5),
               opt_int("steps", default=1))

    def make_tracer(self, props):
        import jax.numpy as jnp
        sigma = max(1e-3, float(self.sigma))
        r = max(1, int(3 * sigma + 0.5))
        t = np.arange(-r, r + 1)
        k = np.exp(-0.5 * (t / sigma) ** 2)
        k /= k.sum()
        steps = max(1, int(self.steps))

        def fn(comps):
            out = []
            for p in comps:
                x = p
                for _ in range(steps):
                    x = _sep_conv(x, k)
                out.append(jnp.clip(jnp.rint(x), 0, 255).astype(p.dtype))
            return out
        return fn, props


@register_filter
class AvgBlurFilter(TraceableFilter):
    """Box blur (vf_avgblur.c)."""

    name = "avgblur"
    OPTIONS = (opt_int("sizeX", default=1), opt_int("sizeY", default=0))

    def make_tracer(self, props):
        import jax.numpy as jnp
        rx = max(1, int(self.sizeX))
        ry = int(self.sizeY) or rx
        kx = np.ones(2 * rx + 1) / (2 * rx + 1)
        ky = np.ones(2 * ry + 1) / (2 * ry + 1)

        def fn(comps):
            out = []
            for p in comps:
                x = p.astype(jnp.float32)
                xp = jnp.pad(x, ((ry, ry), (0, 0)), mode="edge")
                x = sum(ky[i] * xp[i:i + p.shape[0], :]
                        for i in range(len(ky)))
                xp = jnp.pad(x, ((0, 0), (rx, rx)), mode="edge")
                x = sum(kx[i] * xp[:, i:i + p.shape[1]]
                        for i in range(len(kx)))
                out.append(jnp.clip(jnp.rint(x), 0, 255).astype(p.dtype))
            return out
        return fn, props


@register_filter
class EdgeDetectFilter(TraceableFilter):
    """Sobel-magnitude edge detector (vf_edgedetect.c, mode=wires)."""

    name = "edgedetect"
    OPTIONS = (opt_float("low", default=0.08),
               opt_float("high", default=0.196))

    def make_tracer(self, props):
        import jax.numpy as jnp
        lo = float(self.low) * 255
        hi = float(self.high) * 255

        def fn(comps):
            y = comps[0].astype(jnp.float32)
            yp = jnp.pad(y, 1, mode="edge")
            gx = (yp[:-2, 2:] + 2 * yp[1:-1, 2:] + yp[2:, 2:]
                  - yp[:-2, :-2] - 2 * yp[1:-1, :-2] - yp[2:, :-2])
            gy = (yp[2:, :-2] + 2 * yp[2:, 1:-1] + yp[2:, 2:]
                  - yp[:-2, :-2] - 2 * yp[:-2, 1:-1] - yp[:-2, 2:])
            mag = jnp.sqrt(gx * gx + gy * gy) / 4
            e = jnp.where(mag >= hi, 255.0,
                          jnp.where(mag >= lo, mag, 0.0))
            out = [jnp.clip(jnp.rint(e), 0, 255).astype(comps[0].dtype)]
            for p in comps[1:]:
                out.append(jnp.full_like(p, 128))
            return out
        return fn, props


@register_filter
class SwapUVFilter(TraceableFilter):
    """Swap chroma planes (vf_swapuv.c)."""

    name = "swapuv"

    def make_tracer(self, props):
        def fn(comps):
            if len(comps) >= 3:
                return [comps[0], comps[2], comps[1]] + list(comps[3:])
            return comps
        return fn, props


@register_filter
class MonochromeFilter(TraceableFilter):
    """Drop chroma to neutral (vf_monochrome.c at default params)."""

    name = "monochrome"

    def make_tracer(self, props):
        import jax.numpy as jnp

        def fn(comps):
            out = [comps[0]]
            for p in comps[1:]:
                out.append(jnp.full_like(p, 128))
            return out
        return fn, props


@register_filter
class VignetteFilter(TraceableFilter):
    """Radial light falloff (vf_vignette.c, simplified constant angle)."""

    name = "vignette"
    OPTIONS = (opt_float("angle", default=np.pi / 5),)

    def make_tracer(self, props):
        import jax.numpy as jnp
        h, w = props.height, props.width
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        dx = (xx - (w - 1) / 2) / ((w - 1) / 2)
        dy = (yy - (h - 1) / 2) / ((h - 1) / 2)
        dist = np.sqrt(dx * dx + dy * dy) / np.sqrt(2)
        gain = np.cos(float(self.angle) * dist) ** 4
        gmap = gain.astype(np.float32)

        def fn(comps):
            out = [jnp.clip(jnp.rint(comps[0].astype(jnp.float32)
                                     * jnp.asarray(gmap)), 0, 255)
                   .astype(comps[0].dtype)]
            out.extend(comps[1:])
            return out
        return fn, props


@register_filter
class DrawGridFilter(TraceableFilter):
    """Grid overlay on luma (vf_drawgrid.c, luma-only draw)."""

    name = "drawgrid"
    OPTIONS = (opt_int("width", default=64), opt_int("height", default=64),
               opt_int("thickness", default=1),
               opt_int("luma", default=255))

    def make_tracer(self, props):
        import jax.numpy as jnp
        gw, gh = max(2, int(self.width)), max(2, int(self.height))
        t = max(1, int(self.thickness))
        h, w = props.height, props.width
        mask = np.zeros((h, w), bool)
        mask[:, [c for c in range(w) if c % gw < t]] = True
        mask[[r for r in range(h) if r % gh < t], :] = True
        mj = mask

        def fn(comps):
            y = jnp.where(jnp.asarray(mj), int(self.luma), comps[0])
            return [y.astype(comps[0].dtype)] + list(comps[1:])
        return fn, props


@register_filter
class FrameStepFilter(Filter):
    """Keep every Nth frame (vf_framestep.c)."""

    name = "framestep"
    OPTIONS = (opt_int("step", default=1),)

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        self._n = 0

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        if frame is None:
            return []
        keep = self._n % max(1, int(self.step)) == 0
        self._n += 1
        return [frame] if keep else []


@register_filter
class SelectFilter(Filter):
    """Frame selection by expression over n (f_select.c subset:
    variables n, selected_n)."""

    name = "select"
    OPTIONS = (opt_str("expr", default="1"),)

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        self._n = 0
        self._sel = 0

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        if frame is None:
            return []
        v = _eval.eval_expr(str(self.expr),
                            {"n": self._n, "selected_n": self._sel})
        self._n += 1
        if v:
            self._sel += 1
            return [frame]
        return []


@register_filter
class TMixFilter(Filter):
    """Average the last N frames (vf_tmix.c, uniform weights)."""

    name = "tmix"
    OPTIONS = (opt_int("frames", default=3),)

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        self._hist: deque = deque(maxlen=max(1, int(self.frames)))

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        if frame is None:
            return []
        self._hist.append([np.asarray(p).astype(np.float32)
                           for p in frame.planes])
        out = frame.clone_props()
        n = len(self._hist)
        out.planes = [
            np.clip(np.rint(sum(h[i] for h in self._hist) / n),
                    0, 255).astype(np.uint8)
            for i in range(len(frame.planes))]
        return [out]


@register_filter
class VideoNoiseFilter(Filter):
    """Additive uniform noise on all planes (vf_noise.c 'u' flag)."""

    name = "vnoise"
    OPTIONS = (opt_int("strength", default=12), opt_int("seed", default=0))

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        self._rng = np.random.default_rng(int(self.seed))

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        if frame is None:
            return []
        s = int(self.strength)
        out = frame.clone_props()
        out.planes = [
            np.clip(np.asarray(p).astype(np.int32)
                    + self._rng.integers(-s, s + 1, np.asarray(p).shape),
                    0, 255).astype(np.uint8)
            for p in frame.planes]
        return [out]


@register_filter
class BlendFilter(Filter):
    """Blend two inputs per-pixel (vf_blend.c subset: all_mode with
    all_opacity), inputs aligned by framesync."""

    name = "blend"
    n_inputs = 2
    OPTIONS = (opt_str("all_mode", default="average"),
               opt_float("all_opacity", default=1.0))

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        from .framesync import FrameSync
        self._fs = FrameSync(2)

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        self._fs.push(frame, pad)
        out = []
        for top, bottom in self._fs.events():
            out.append(self._blend(top, bottom))
        return out

    def _blend(self, a: Frame, b: Frame) -> Frame:
        mode = str(self.all_mode)
        op = float(self.all_opacity)
        out = a.clone_props()
        planes = []
        for pa, pb in zip(a.planes, b.planes):
            x = np.asarray(pa).astype(np.float64)
            y = np.asarray(pb).astype(np.float64)
            if y.shape != x.shape:
                y = np.broadcast_to(y[:x.shape[0], :x.shape[1]], x.shape)
            if mode == "average":
                v = (x + y) / 2
            elif mode == "addition":
                v = np.minimum(x + y, 255)
            elif mode == "subtract":
                v = np.maximum(x - y, 0)
            elif mode == "lighten":
                v = np.maximum(x, y)
            elif mode == "darken":
                v = np.minimum(x, y)
            elif mode == "multiply":
                v = x * y / 255
            elif mode == "normal":
                v = y
            else:
                raise InvalidData(f"blend: unknown mode {mode!r}")
            v = x * (1 - op) + v * op
            planes.append(np.clip(np.rint(v), 0, 255).astype(np.uint8))
        out.planes = planes
        return out
