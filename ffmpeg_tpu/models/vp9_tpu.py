"""VP9 full decode with windowed device replay.

The round-4 device-recon path prepared ONE program per frame and
re-shipped work tensors eagerly: 0.8 f/s. This module is the round-5
redesign the verdict asked for:

  host:   C++ tile parse (csrc/vp9_parse.cpp, ~10-60 ms/frame vs the
          Python walker's ~30-60 s) for a whole WINDOW of frames,
  device: ONE compiled step program reused for every frame of the
          window (args padded to the window's per-class maxima), the
          8-slot DPB resident on device as the step's carry, and the
          in-loop deblocking filter fused into the same program
          (lf_tpu.sb_body), so a frame never round-trips to the host.

Per-frame work shipped over the link: the padded record tensors + LF
grids. Output stays device-resident; decode() can fetch the planes for
gating (bit-exact vs the reference decoder — tests/test_vp9_tpu.py).

Reference scope: the full libavcodec/vp9.c decode loop (parse +
inter/intra recon + loop filter), re-split for a TPU.
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional

import numpy as np

from ..codecs.vp9 import VP9Core, split_superframe
from ..codecs.vp9 import recon_tpu as RT
from ..codecs.vp9.lf_tpu import _luts
from ..codecs.vp9.lf_wave import loopfilter_wavefront
from ..codecs.vp9.recon_tpu import _CLASSES, _MC_CLASSES, _pow2


@functools.lru_cache(maxsize=8)
def _build_step(key):
    """One window step: (dpb8, frame args) -> (dpb8, emit)."""
    import jax
    import jax.numpy as jnp

    (H, W, Hc, Wc, nlev, dw, dh, mc_shapes, tu_shapes, intra_shapes,
     sb_rows, sb_cols, emit_planes, mc_pad) = key
    rkey = (H, W, Hc, Wc, 8, nlev, dw, dh, mc_shapes, tu_shapes,
            intra_shapes, mc_pad)
    pw, ph = sb_cols * 8 * 8, sb_rows * 8 * 8
    dims = (pw >> 2, ph >> 2, pw >> 3, ph >> 3)

    def step(dpb8_y, dpb8_c, refresh, mc_args, tu_args, intra_args,
             wd_v, wd_h, wd_v_uv, wd_h_uv, lvl8, lim, mblim):
        wd_v = wd_v.astype(jnp.int32)
        wd_h = wd_h.astype(jnp.int32)
        wd_v_uv = wd_v_uv.astype(jnp.int32)
        wd_h_uv = wd_h_uv.astype(jnp.int32)
        lvl8 = lvl8.astype(jnp.int32)
        # reconstruction against the full 8-slot DPB (MC slot ids were
        # mapped through h.refidx on the host)
        y8, u8, v8 = RT._recon_frame(rkey, dpb8_y,
                                     dpb8_c, mc_args, tu_args,
                                     intra_args)
        # in-loop deblock: wavefront over SBs (lf_wave, bit-exact vs
        # lf.py — d=2r+c schedule, 61 steps instead of 510 at 1080p);
        # lvl8 all-zero disables it (filter_level 0)
        y, u, v = loopfilter_wavefront(
            y8, u8, v8, wd_v, wd_h, wd_v_uv, wd_h_uv, lvl8,
            lim, mblim, sb_rows, sb_cols, dims)
        yo = y.astype(jnp.uint8)
        uo = u.astype(jnp.uint8)
        vo = v.astype(jnp.uint8)
        m = refresh[:, None, None]
        dpb8_y = jnp.where(m, yo[None], dpb8_y)
        dpb8_c = jnp.where(m[:, None], jnp.stack([uo, vo])[None],
                           dpb8_c)
        if emit_planes:
            out = (yo, uo, vo)
        else:
            out = jnp.sum(yo[::97, ::101].astype(jnp.int32)) + \
                jnp.sum(uo[::53, ::59].astype(jnp.int32))
        return dpb8_y, dpb8_c, out

    return jax.jit(step, donate_argnums=(0, 1))


class Vp9TpuDecoder:
    """Windowed full decoder; geometry fixed per instance lifetime."""

    def __init__(self):
        self.core = VP9Core(native=True)
        self.core.capture = []

    def parse(self, packets: List[bytes]):
        """Host pass: headers + C++ entropy parse; returns captures."""
        self.core.capture = caps = []
        for p in packets:
            for sub in split_superframe(bytes(p)):
                self.core.decode_frame(sub)
        return caps

    @staticmethod
    def window_shapes(caps):
        """Per-class maxima over the window (pow2-padded)."""
        mc_max = {c: 0 for c in _MC_CLASSES}
        tu_max = {c: 0 for c in _CLASSES}
        in_tot = {c: 0 for c in _CLASSES}    # total records
        in_wid = {c: 0 for c in _CLASSES}    # max per-level width
        nlev = 0
        for _h, _fs, rec in caps:
            for c in _MC_CLASSES:
                a = rec.mc_arr.get(c)
                mc_max[c] = max(mc_max[c], 0 if a is None else len(a))
            for c in _CLASSES:
                m, _ = rec.tu_arr.get(c, (None, None))
                tu_max[c] = max(tu_max[c], 0 if m is None else len(m))
                m, _ = rec.in_arr.get(c, (None, None))
                if m is not None and len(m):
                    in_tot[c] = max(in_tot[c], len(m))
                    wid = int(np.bincount(m[:, 0]).max())
                    in_wid[c] = max(in_wid[c], wid)
            nlev = max(nlev, rec.max_level)
        # generous floors collapse nearby shape keys so different
        # windows (and the test matrix) share ONE compiled program;
        # negligible padding at production (1080p) sizes
        mc_shapes = tuple((c, _pow2(k, lo=64) if k else 0)
                          for c, k in mc_max.items())
        tu_shapes = tuple((c, _pow2(k, lo=64) if k else 0)
                          for c, k in tu_max.items())
        in_shapes = []
        for c in _CLASSES:
            if in_tot[c]:
                kmax = _pow2(in_wid[c], lo=16)
                in_shapes.append((c, (_pow2(in_tot[c] + kmax, lo=256),
                                      kmax)))
            else:
                in_shapes.append((c, 0))
        nlev = _pow2(nlev, lo=16) if nlev else 0
        return mc_shapes, tuple(tu_shapes), tuple(in_shapes), nlev

    @staticmethod
    def frame_args(h, fs, rec, shapes):
        """Host-side padded arg tree for one frame."""
        smap = np.asarray(h.refidx, np.int32)
        mc_args, tu_args, intra_args, _ = RT.build_frame_args(
            rec, smap, shapes=shapes)
        sbr, sbc = fs.sb_rows, fs.sb_cols
        lvl8 = np.zeros((sbr * 8, sbc * 8), np.int32)
        if h.filter_level:
            lvl8[:fs.rows, :fs.cols] = fs.lf_lvl
        lim, mblim = _luts(h.sharpness)
        refresh = np.array([(h.refreshrefmask >> i) & 1
                            for i in range(8)], bool)
        # int8 wire format for the LF grids (wd values <= 16,
        # lf levels <= 63); the step widens on device
        return (refresh, mc_args, tu_args, intra_args,
                fs.wd_v.astype(np.int8), fs.wd_h.astype(np.int8),
                fs.wd_v_uv.astype(np.int8),
                fs.wd_h_uv.astype(np.int8),
                lvl8.astype(np.int8), lim.astype(np.int32),
                mblim.astype(np.int32))

    def decode(self, packets: List[bytes], emit_planes=False,
               stats: Optional[dict] = None):
        """Full decode; returns list of (y, u, v) device planes when
        emit_planes (cropped), else per-frame device checksums."""
        import jax

        t0 = time.monotonic()
        caps = self.parse(packets)
        t_parse = time.monotonic() - t0
        if not caps:
            return []
        h0, fs0, _ = caps[0]
        H, W = fs0.y.shape
        Hc, Wc = fs0.u.shape
        # Two shape groups: intra-heavy frames (keyframe/intraonly —
        # deep dependency-level tensors) vs inter frames. Padding the
        # whole window to the keyframe's intra shapes costs ~175 MB of
        # args PER FRAME; grouping keeps inter frames to a few MB.
        gid = [0 if (h.keyframe or h.intraonly) else 1
               for h, _fs, _r in caps]
        # MC pad bucket for the slice-gather MC: max |mv| px over the
        # window (+72 covers edge-tile overhang + taps; see
        # recon_tpu._mc_tiles_sliced)
        maxmv = 0
        for _h, _fs, rec in caps:
            for arr in rec.mc_arr.values():
                if len(arr):
                    m = int(np.abs(arr[:, [3, 4, 6, 7]]).max()) >> 3
                    maxmv = max(maxmv, m)
        mc_pad = max(80, -(-(maxmv + 72) // 64) * 64)
        steps, shapes_g = {}, {}
        for g in set(gid):
            grp = [c for c, gg in zip(caps, gid) if gg == g]
            shp = self.window_shapes(grp)
            shapes_g[g] = shp
            key = (H, W, Hc, Wc, shp[3], h0.width, h0.height,
                   shp[0], shp[1], shp[2],
                   fs0.sb_rows, fs0.sb_cols, emit_planes, mc_pad)
            steps[g] = _build_step(key)

        t0 = time.monotonic()
        args = [self.frame_args(h, fs, rec, shapes_g[g])
                for (h, fs, rec), g in zip(caps, gid)]
        t_build = time.monotonic() - t0

        t0 = time.monotonic()
        dpb_y = jax.device_put(np.zeros((8, H, W), np.uint8))
        dpb_c = jax.device_put(np.zeros((8, 2, Hc, Wc), np.uint8))
        outs = []
        DEPTH = 8    # bound in-flight arg/temp memory
        for i, (a, g) in enumerate(zip(args, gid)):
            da = jax.device_put(a)
            dpb_y, dpb_c, out = steps[g](dpb_y, dpb_c, *da)
            outs.append(out)
            if i >= DEPTH:
                jax.block_until_ready(outs[i - DEPTH])
        jax.block_until_ready(outs[-1])
        if not emit_planes:
            # fetch = the only honest completion signal on the tunnel
            float(np.asarray(outs[-1]))
        t_device = time.monotonic() - t0
        if stats is not None:
            n = len(caps)
            stats.update(parse_s=t_parse, build_s=t_build,
                         device_s=t_device, frames=n)
        if emit_planes:
            cropped = []
            for (h, _fs, _r), (y, u, v) in zip(caps, outs):
                cropped.append((
                    np.asarray(y)[:h.height, :h.width],
                    np.asarray(u)[:(h.height + 1) // 2,
                                  :(h.width + 1) // 2],
                    np.asarray(v)[:(h.height + 1) // 2,
                                  :(h.width + 1) // 2]))
            return cropped
        return outs
