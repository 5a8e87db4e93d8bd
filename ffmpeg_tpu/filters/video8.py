"""Round-5 video filter breadth: bwdif, hqdn3d, atadenoise, exposure,
colortemperature, huesaturation, cas, deflicker, separatefields, weave
— analogs of the corresponding vf_*.c filters (cited per class)."""

from __future__ import annotations

from collections import deque
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.frame import Frame
from ..utils.options import opt_float, opt_int, opt_str
from .base import Filter, TraceableFilter, register_filter


@register_filter
class BwdifFilter(Filter):
    """Bob Weaver deinterlacer (vf_bwdif.c filter_line_c). Full
    3-frame temporal window: frames are emitted with one frame of
    latency; mode 0 (one output frame per input frame)."""

    name = "bwdif"
    OPTIONS = (opt_int("mode", default=0, min=0, max=1),
               opt_int("parity", default=-1, min=-1, max=1))

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        self._win: deque = deque()        # [prev, cur, next]

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        out = []
        if frame is not None:
            self._win.append(frame)
            if len(self._win) == 1:       # prime: duplicate first
                self._win.appendleft(frame)
            if len(self._win) >= 3:
                out.append(self._emit())
        else:
            while len(self._win) >= 2:
                self._win.append(self._win[-1])
                out.append(self._emit())
                if len(self._win) < 3:
                    break
            self._win.clear()
        return out

    def _emit(self) -> Frame:
        prev, cur, nxt = self._win[0], self._win[1], self._win[2]
        self._win.popleft()
        parity = self.parity if self.parity >= 0 else \
            (0 if cur.top_field_first else 1)
        o = cur.clone_props()
        o.planes = [self._deint(np.asarray(p0), np.asarray(c0),
                                np.asarray(n0), parity)
                    for p0, c0, n0 in zip(prev.planes, cur.planes,
                                          nxt.planes)]
        o.interlaced = False
        return o

    @staticmethod
    def _deint(prev, cur, nxt, parity):
        """vf_bwdif.c filter_line_c: temporal average d bounded by the
        motion-adaptive diff window, high-frequency 13-tap vertical
        reconstruction via coef_lf/coef_hf."""
        dt = cur.dtype
        c0 = jnp.asarray(cur).astype(jnp.int32)
        p0 = jnp.asarray(prev).astype(jnp.int32)
        n0 = jnp.asarray(nxt).astype(jnp.int32)

        def sh(a, k):                      # shift rows, edge clamp
            idx = jnp.clip(jnp.arange(a.shape[0]) + k, 0,
                           a.shape[0] - 1)
            return a[idx]

        # output keeps rows with row%2 == parity; prev2/next2 are the
        # frames whose `parity` field brackets the interpolated one
        prev2, next2 = p0, n0
        c = sh(c0, -1)                     # line above (same field)
        e = sh(c0, 1)                      # line below
        d = (prev2 + next2) >> 1
        td0 = jnp.abs(prev2 - next2) >> 1
        td1 = (jnp.abs(sh(p0, -1) - c) + jnp.abs(sh(p0, 1) - e)) >> 1
        td2 = (jnp.abs(sh(n0, -1) - c) + jnp.abs(sh(n0, 1) - e)) >> 1
        diff = jnp.maximum(td0, jnp.maximum(td1, td2))
        b_ = ((sh(prev2, -2) + sh(next2, -2)) >> 1) - c
        f_ = ((sh(prev2, 2) + sh(next2, 2)) >> 1) - e
        dc_ = d - c
        de_ = d - e
        mx = jnp.maximum(de_, jnp.maximum(dc_, jnp.minimum(b_, f_)))
        mn = jnp.minimum(de_, jnp.minimum(dc_, jnp.maximum(b_, f_)))
        diff = jnp.maximum(diff, jnp.maximum(mn, -mx))
        # 13-tap: coef_lf on the current field, coef_hf on the
        # temporal average field (vf_bwdif coef tables)
        interpol = (((5570 * (prev2 + next2)
                      - 3801 * (sh(prev2, -2) + sh(next2, -2)
                                + sh(prev2, 2) + sh(next2, 2))
                      + 1016 * (sh(prev2, -4) + sh(next2, -4)
                                + sh(prev2, 4) + sh(next2, 4))) >> 2)
                    + 4309 * (c + e)
                    - 213 * (sh(c0, -3) + sh(c0, 3))) >> 13
        interpol = jnp.clip(interpol, d - diff, d + diff)
        interpol = jnp.where(diff == 0, d, interpol)
        rows = jnp.arange(c0.shape[0])[:, None]
        keep = (rows % 2) == parity
        out = jnp.where(keep, c0, jnp.clip(interpol, 0, 255))
        return out.astype(dt)


@register_filter
class Hqdn3dFilter(Filter):
    """High-quality 3D denoiser (vf_hqdn3d.c): separable spatial
    lowpass (left->right, top->bottom) + temporal lowpass, each a
    strength-parameterized soft-threshold transfer."""

    name = "hqdn3d"
    OPTIONS = (opt_float("luma_spatial", default=4.0),
               opt_float("chroma_spatial", default=-1.0),
               opt_float("luma_tmp", default=-1.0),
               opt_float("chroma_tmp", default=-1.0))

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        ls = self.luma_spatial
        cs = self.chroma_spatial if self.chroma_spatial >= 0 \
            else ls * 3.0 / 4.0
        lt = self.luma_tmp if self.luma_tmp >= 0 else ls * 6.0 / 4.0
        ct = self.chroma_tmp if self.chroma_tmp >= 0 \
            else lt * cs / max(ls, 1e-9)
        self._s = [ls, cs, cs]
        self._t = [lt, ct, ct]
        self._prev = None

    @staticmethod
    def _transfer(diff, strength):
        """ff hqdn3d denoise coefficient: soft-threshold on the
        difference (float port of the int16 LUT)."""
        if strength <= 0:
            return diff * 0.0
        ad = jnp.abs(diff)
        g = ad * 0.9 * jnp.exp(-ad / strength * (ad / strength) * 0.25)
        return jnp.sign(diff) * jnp.minimum(ad, g)

    def _lowpass(self, plane, s, t, prev):
        x = plane.astype(jnp.float32)
        # spatial: recursive IIR approximated with a 3x3 smoothing
        # bounded by the transfer curve
        avg = (jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1) +
               jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)) * 0.25
        x = x + self._transfer(avg - x, s)
        if prev is not None:
            x = x + self._transfer(prev - x, t)
        return x

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        if frame is None:
            self._prev = None
            return []
        o = frame.clone_props()
        outs = []
        prevs = self._prev or [None] * len(frame.planes)
        for i, p in enumerate(frame.planes):
            x = self._lowpass(jnp.asarray(np.asarray(p)),
                              self._s[min(i, 2)], self._t[min(i, 2)],
                              prevs[i])
            outs.append(x)
        self._prev = outs
        o.planes = [jnp.clip(jnp.round(x), 0, 255)
                    .astype(np.asarray(frame.planes[i]).dtype)
                    for i, x in enumerate(outs)]
        return [o]


@register_filter
class AtadenoiseFilter(Filter):
    """Adaptive temporal averaging denoiser (vf_atadenoise.c, serial
    algorithm): per pixel, extend the temporal average forward /
    backward while the per-step and running deviations stay under the
    a/b thresholds."""

    name = "atadenoise"
    OPTIONS = (opt_float("0a", default=0.02), opt_float("0b", default=0.04),
               opt_float("1a", default=0.02), opt_float("1b", default=0.04),
               opt_float("2a", default=0.02), opt_float("2b", default=0.04),
               opt_int("s", default=9, min=5, max=129))

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        self._buf: deque = deque()
        self._mid = self.s // 2

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        out = []
        if frame is not None:
            self._buf.append(frame)
            if len(self._buf) > self.s:
                self._buf.popleft()
            if len(self._buf) > self._mid:
                out.append(self._emit(len(self._buf) - 1 - self._mid))
        else:
            k = self._mid
            while k > 0:
                k -= 1
                out.append(self._emit(k))
            self._buf.clear()
        return out

    def _emit(self, mid_idx) -> Frame:
        frames = list(self._buf)
        mid = len(frames) - 1 - mid_idx
        cur = frames[mid]
        o = cur.clone_props()
        planes = []
        for ci in range(len(cur.planes)):
            a = float(getattr(self, "0a" if ci == 0 else
                              ("1a" if ci == 1 else "2a"))) * 255
            b = float(getattr(self, "0b" if ci == 0 else
                              ("1b" if ci == 1 else "2b"))) * 255
            c = jnp.asarray(np.asarray(cur.planes[ci])) \
                .astype(jnp.float32)
            total = c.copy()
            count = jnp.ones_like(c)
            for direc in (1, -1):
                dev = jnp.zeros_like(c)
                alive = jnp.ones_like(c, bool)
                step = 1
                while True:
                    j = mid + direc * step
                    if j < 0 or j >= len(frames):
                        break
                    f = jnp.asarray(np.asarray(frames[j].planes[ci])) \
                        .astype(jnp.float32)
                    d = jnp.abs(f - c)
                    dev = dev + d
                    alive = alive & (d <= a) & (dev / step <= b)
                    total = total + jnp.where(alive, f, 0.0)
                    count = count + alive
                    step += 1
            planes.append(jnp.clip(jnp.round(total / count), 0, 255)
                          .astype(np.asarray(cur.planes[ci]).dtype))
        o.planes = planes
        return o


@register_filter
class ExposureFilter(TraceableFilter):
    """vf_exposure.c: out = (in/255 - black) / (2^-exposure - black),
    float."""

    name = "exposure"
    OPTIONS = (opt_float("exposure", default=0.0),
               opt_float("black", default=0.0))

    def make_tracer(self, props):
        diff = max(2.0 ** (-self.exposure) - self.black, 0.001)
        scale = 1.0 / diff
        black = self.black

        def fn(comps):
            out = []
            for p in comps:
                x = p.astype(jnp.float32) / 255.0
                x = (x - black) * scale
                out.append(jnp.clip(jnp.round(x * 255.0), 0, 255)
                           .astype(p.dtype))
            return out

        return fn, props


@register_filter
class ColorTemperatureFilter(TraceableFilter):
    """vf_colortemperature.c: RGB gains from a Planckian-locus
    approximation at `temperature` K, preserving luma by `pl`."""

    name = "colortemperature"
    OPTIONS = (opt_float("temperature", default=6500.0),
               opt_float("mix", default=1.0),
               opt_float("pl", default=0.0))

    @staticmethod
    def _kelvin_rgb(t):
        t = t / 100.0
        if t <= 66:
            r = 255.0
            g = 99.4708025861 * np.log(t) - 161.1195681661 if t > 0 \
                else 0.0
        else:
            r = 329.698727446 * ((t - 60) ** -0.1332047592)
            g = 288.1221695283 * ((t - 60) ** -0.0755148492)
        if t >= 66:
            b = 255.0
        elif t <= 19:
            b = 0.0
        else:
            b = 138.5177312231 * np.log(t - 10) - 305.0447927307
        return (np.clip(r, 0, 255) / 255.0,
                np.clip(g, 0, 255) / 255.0,
                np.clip(b, 0, 255) / 255.0)

    def make_tracer(self, props):
        gr, gg, gb = self._kelvin_rgb(self.temperature)
        mix, pl = self.mix, self.pl

        def fn(comps):
            # gbrp plane order (g, b, r)
            g = comps[0].astype(jnp.float32) / 255.0
            b = comps[1].astype(jnp.float32) / 255.0
            r = comps[2].astype(jnp.float32) / 255.0
            nr, ng, nb = r * gr, g * gg, b * gb
            l0 = r * 0.2627 + g * 0.6780 + b * 0.0593
            l1 = nr * 0.2627 + ng * 0.6780 + nb * 0.0593
            adj = jnp.where(l1 > 0, l0 / jnp.maximum(l1, 1e-6), 1.0)
            adj = 1.0 + pl * (adj - 1.0)
            nr, ng, nb = nr * adj, ng * adj, nb * adj
            nr = r + mix * (nr - r)
            ng = g + mix * (ng - g)
            nb = b + mix * (nb - b)
            return [jnp.clip(jnp.round(x * 255), 0, 255)
                    .astype(p.dtype)
                    for x, p in zip((ng, nb, nr), comps)]

        return fn, props


@register_filter
class HueSaturationFilter(TraceableFilter):
    """vf_huesaturation.c core: rotate hue / scale saturation /
    adjust intensity in RGB via the standard YIQ-style matrix."""

    name = "huesaturation"
    OPTIONS = (opt_float("hue", default=0.0),
               opt_float("saturation", default=0.0),
               opt_float("intensity", default=0.0))

    def make_tracer(self, props):
        h = np.deg2rad(self.hue)
        s = 1.0 + self.saturation
        i0 = self.intensity
        c, sn = np.cos(h), np.sin(h)
        wr, wg, wb = 0.299, 0.587, 0.114
        # canonical luma-preserving hue-rotate/saturate matrix (the
        # SVG feColorMatrix hueRotate construction with BT.601
        # weights): identity at defaults, grays invariant
        lum = np.array([[wr, wg, wb]] * 3)
        rot = np.array([
            [-wr, -wg, 1.0 - wb],
            [0.143, 0.140, -0.283],
            [-(1.0 - wr), wg, wb],
        ])
        m = lum + c * s * (np.eye(3) - lum) + sn * s * rot
        k = 1.0 + i0

        def fn(comps):
            g = comps[0].astype(jnp.float32)
            b = comps[1].astype(jnp.float32)
            r = comps[2].astype(jnp.float32)
            nr = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
            ng = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b
            nb = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b
            return [jnp.clip(jnp.round(x * k), 0, 255).astype(p.dtype)
                    for x, p in zip((ng, nb, nr), comps)]

        return fn, props


@register_filter
class CasFilter(TraceableFilter):
    """Contrast Adaptive Sharpening (vf_cas.c, AMD FidelityFX CAS):
    per pixel, amount-scaled sharpening bounded by the local 3x3
    min/max window."""

    name = "cas"
    OPTIONS = (opt_float("strength", default=0.0),)

    def make_tracer(self, props):
        strength = self.strength

        def fn(comps):
            return [self._one(p, strength) for p in comps]

        return fn, props

    @staticmethod
    def _one(p, strength):
            x = p.astype(jnp.float32)

            def sh(a, dy, dx):
                idy = jnp.clip(jnp.arange(a.shape[0]) + dy, 0,
                               a.shape[0] - 1)
                idx = jnp.clip(jnp.arange(a.shape[1]) + dx, 0,
                               a.shape[1] - 1)
                return a[idy][:, idx]

            b, d, e, f, hh = (sh(x, -1, 0), sh(x, 0, -1), x,
                              sh(x, 0, 1), sh(x, 1, 0))
            mn = jnp.minimum(jnp.minimum(jnp.minimum(b, d),
                                         jnp.minimum(e, f)), hh)
            mx = jnp.maximum(jnp.maximum(jnp.maximum(b, d),
                                         jnp.maximum(e, f)), hh)
            mxv = jnp.maximum(mx, 1e-6)
            amp = jnp.sqrt(jnp.clip(
                jnp.minimum(mn, 255.0 - mx) / mxv, 0, 1))
            peak = -1.0 / (8.0 - 3.0 * strength)
            w = amp * peak
            o = (w * (b + d + f + hh) + e) / (1.0 + 4.0 * w)
            return jnp.clip(jnp.round(o), 0, 255).astype(p.dtype)


@register_filter
class DeflickerFilter(Filter):
    """vf_deflicker.c (mode am): scale each frame's luma so its mean
    follows the running average of the last `size` frames."""

    name = "deflicker"
    OPTIONS = (opt_int("size", default=5, min=2, max=129),)

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        self._means: deque = deque(maxlen=self.size)

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        if frame is None:
            self._means.clear()
            return []
        y = jnp.asarray(np.asarray(frame.planes[0])).astype(jnp.float32)
        m = float(jnp.mean(y))
        self._means.append(m)
        target = sum(self._means) / len(self._means)
        f = target / max(m, 1e-6)
        o = frame.clone_props()
        o.planes = [jnp.clip(jnp.round(
            jnp.asarray(np.asarray(frame.planes[0])).astype(jnp.float32)
            * f), 0, 255).astype(np.asarray(frame.planes[0]).dtype)
        ] + list(frame.planes[1:])
        return [o]


@register_filter
class SeparateFieldsFilter(Filter):
    """vf_separatefields.c: split each frame into two half-height
    field frames (first field first)."""

    name = "separatefields"

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        if frame is None:
            return []
        tff = 0 if frame.top_field_first else 1
        outs = []
        for fi in (tff, 1 - tff):
            o = frame.clone_props()
            o.planes = [np.asarray(p)[fi::2].copy()
                        for p in frame.planes]
            o.height = frame.height // 2
            o.interlaced = False
            outs.append(o)
        return outs


@register_filter
class WeaveFilter(Filter):
    """vf_weave.c: interleave pairs of field frames back into
    full-height frames (inverse of separatefields)."""

    name = "weave"
    OPTIONS = (opt_str("first_field", default="top"),)

    def __init__(self, args: str = "", **opts):
        super().__init__(args, **opts)
        self._pend: Optional[Frame] = None

    def process(self, frame: Optional[Frame], pad: int = 0) -> List[Frame]:
        if frame is None:
            self._pend = None
            return []
        if self._pend is None:
            self._pend = frame
            return []
        a, b = self._pend, frame
        self._pend = None
        o = a.clone_props()
        planes = []
        for pa, pb in zip(a.planes, b.planes):
            pa, pb = np.asarray(pa), np.asarray(pb)
            w = np.empty((pa.shape[0] * 2, pa.shape[1]), pa.dtype)
            if self.first_field == "top":
                w[0::2], w[1::2] = pa, pb
            else:
                w[1::2], w[0::2] = pa, pb
            planes.append(w)
        o.planes = planes
        o.height = a.height * 2
        o.interlaced = True
        o.top_field_first = self.first_field == "top"
        return [o]
