"""VP9 in-loop deblocking filter as a single jitted device kernel
(reference: libavcodec/vp9dsp_template.c loop_filter + vp9.c
loopfilter_sb). The host filter (lf.py) walks SBs in raster order with
data-dependent Python; here the same math runs as a lax.fori_loop over
superblocks with fixed-size dynamic slices — each edge filters a
64(32)-lane vector with branchless jnp.where selects, bit-exact vs the
host path. This is the SURVEY §5 "wavefront/stencil on device"
pattern for the VP9 tile-across-chips configuration; lf_sharded.py
pipelines the same per-SB body across a 'spatial' device mesh."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _luts(sharp):
    lim = np.zeros(64, np.int32)
    mblim = np.zeros(64, np.int32)
    for i in range(1, 64):
        limit = i
        if sharp > 0:
            limit >>= (sharp + 3) >> 2
            limit = min(limit, 9 - sharp)
        limit = max(limit, 1)
        lim[i] = limit
        mblim[i] = 2 * (i + 2) + limit
    return lim, mblim


def _clip(v):
    return jnp.clip(v, 0, 255)


def _clip_s(v):
    return jnp.clip(v, -128, 127)


def edge_filter(slab, E, I, Hthr, wd, gate):
    """One vertical-edge slab (N, 16): p7..p0 | q0..q7. Per-row
    params (N,). Returns the filtered slab (unfiltered rows pass
    through). Exact integer port of vp9dsp loop_filter."""
    p = [slab[:, 7 - k] for k in range(8)]
    q = [slab[:, 8 + k] for k in range(8)]
    a = jnp.abs
    fm = ((a(p[3] - p[2]) <= I) & (a(p[2] - p[1]) <= I) &
          (a(p[1] - p[0]) <= I) & (a(q[1] - q[0]) <= I) &
          (a(q[2] - q[1]) <= I) & (a(q[3] - q[2]) <= I) &
          (a(p[0] - q[0]) * 2 + (a(p[1] - q[1]) >> 1) <= E))
    F = 1
    flat8in = ((a(p[3] - p[0]) <= F) & (a(p[2] - p[0]) <= F) &
               (a(p[1] - p[0]) <= F) & (a(q[1] - q[0]) <= F) &
               (a(q[2] - q[0]) <= F) & (a(q[3] - q[0]) <= F))
    flat8out = ((a(p[7] - p[0]) <= F) & (a(p[6] - p[0]) <= F) &
                (a(p[5] - p[0]) <= F) & (a(p[4] - p[0]) <= F) &
                (a(q[4] - q[0]) <= F) & (a(q[5] - q[0]) <= F) &
                (a(q[6] - q[0]) <= F) & (a(q[7] - q[0]) <= F))
    sel16 = gate & fm & (wd >= 16) & flat8out & flat8in
    sel8 = gate & fm & (wd >= 8) & flat8in & ~sel16
    seln = gate & fm & ~sel16 & ~sel8

    # narrow filter (4px)
    hev = (a(p[1] - p[0]) > Hthr) | (a(q[1] - q[0]) > Hthr)
    f = jnp.where(hev, _clip_s(3 * (q[0] - p[0]) +
                               _clip_s(p[1] - q[1])),
                  _clip_s(3 * (q[0] - p[0])))
    f1 = jnp.minimum(f + 4, 127) >> 3
    f2 = jnp.minimum(f + 3, 127) >> 3
    n_p0 = _clip(p[0] + f2)
    n_q0 = _clip(q[0] - f1)
    fi = (f1 + 1) >> 1
    n_p1 = jnp.where(hev, p[1], _clip(p[1] + fi))
    n_q1 = jnp.where(hev, q[1], _clip(q[1] - fi))

    # 8-wide flat filter
    e_p2 = (p[3] + p[3] + p[3] + 2 * p[2] + p[1] + p[0] + q[0] + 4) >> 3
    e_p1 = (p[3] + p[3] + p[2] + 2 * p[1] + p[0] + q[0] + q[1] + 4) >> 3
    e_p0 = (p[3] + p[2] + p[1] + 2 * p[0] + q[0] + q[1] + q[2] + 4) >> 3
    e_q0 = (p[2] + p[1] + p[0] + 2 * q[0] + q[1] + q[2] + q[3] + 4) >> 3
    e_q1 = (p[1] + p[0] + q[0] + 2 * q[1] + q[2] + q[3] + q[3] + 4) >> 3
    e_q2 = (p[0] + q[0] + q[1] + 2 * q[2] + q[3] + q[3] + q[3] + 4) >> 3

    # 16-wide flat filter
    w16 = {}
    w16[-7] = (p[7] * 7 + p[6] * 2 + p[5] + p[4] + p[3] + p[2] +
               p[1] + p[0] + q[0] + 8) >> 4
    w16[-6] = (p[7] * 6 + p[6] + p[5] * 2 + p[4] + p[3] + p[2] +
               p[1] + p[0] + q[0] + q[1] + 8) >> 4
    w16[-5] = (p[7] * 5 + p[6] + p[5] + p[4] * 2 + p[3] + p[2] +
               p[1] + p[0] + q[0] + q[1] + q[2] + 8) >> 4
    w16[-4] = (p[7] * 4 + p[6] + p[5] + p[4] + p[3] * 2 + p[2] +
               p[1] + p[0] + q[0] + q[1] + q[2] + q[3] + 8) >> 4
    w16[-3] = (p[7] * 3 + p[6] + p[5] + p[4] + p[3] + p[2] * 2 +
               p[1] + p[0] + q[0] + q[1] + q[2] + q[3] + q[4] + 8) >> 4
    w16[-2] = (p[7] * 2 + p[6] + p[5] + p[4] + p[3] + p[2] +
               p[1] * 2 + p[0] + q[0] + q[1] + q[2] + q[3] + q[4] +
               q[5] + 8) >> 4
    w16[-1] = (p[7] + p[6] + p[5] + p[4] + p[3] + p[2] + p[1] +
               p[0] * 2 + q[0] + q[1] + q[2] + q[3] + q[4] + q[5] +
               q[6] + 8) >> 4
    w16[0] = (p[6] + p[5] + p[4] + p[3] + p[2] + p[1] + p[0] +
              q[0] * 2 + q[1] + q[2] + q[3] + q[4] + q[5] + q[6] +
              q[7] + 8) >> 4
    w16[1] = (p[5] + p[4] + p[3] + p[2] + p[1] + p[0] + q[0] +
              q[1] * 2 + q[2] + q[3] + q[4] + q[5] + q[6] +
              q[7] * 2 + 8) >> 4
    w16[2] = (p[4] + p[3] + p[2] + p[1] + p[0] + q[0] + q[1] +
              q[2] * 2 + q[3] + q[4] + q[5] + q[6] + q[7] * 3 + 8) >> 4
    w16[3] = (p[3] + p[2] + p[1] + p[0] + q[0] + q[1] + q[2] +
              q[3] * 2 + q[4] + q[5] + q[6] + q[7] * 4 + 8) >> 4
    w16[4] = (p[2] + p[1] + p[0] + q[0] + q[1] + q[2] + q[3] +
              q[4] * 2 + q[5] + q[6] + q[7] * 5 + 8) >> 4
    w16[5] = (p[1] + p[0] + q[0] + q[1] + q[2] + q[3] + q[4] +
              q[5] * 2 + q[6] + q[7] * 6 + 8) >> 4
    w16[6] = (p[0] + q[0] + q[1] + q[2] + q[3] + q[4] + q[5] +
              q[6] * 2 + q[7] * 7 + 8) >> 4

    cols = []
    for ci in range(16):
        k = ci - 8                        # sample index: p side < 0
        cur = slab[:, ci]
        out = cur
        if -7 <= k <= 6:
            out = jnp.where(sel16, w16[k], out)
        e8 = {-3: e_p2, -2: e_p1, -1: e_p0, 0: e_q0, 1: e_q1,
              2: e_q2}.get(k)
        if e8 is not None:
            out = jnp.where(sel8, e8, out)
        nn = {-2: n_p1, -1: n_p0, 0: n_q0, 1: n_q1}.get(k)
        if nn is not None:
            out = jnp.where(seln, nn, out)
        cols.append(out)
    return jnp.stack(cols, axis=1)


def _rep(v, n):
    return jnp.repeat(v, n, total_repeat_length=v.shape[0] * n)


def sb_body(r, c, planes, params, lim_lut, mblim_lut, dims):
    """Filter all edges of superblock (r, c) in reference order:
    vertical edges left→right, then horizontal top→bottom. planes =
    (y, u, v) 8-px-padded; params = (wd_v, wd_h, wd_v_uv, wd_h_uv,
    lvl8) padded frame maps."""
    y, u, v = planes
    wd_v, wd_h, wd_v_uv, wd_h_uv, lvl8 = params
    lim_w, lim_h, lim_wc, lim_hc = dims

    def lvl_params(lvl):
        E = mblim_lut[lvl]
        I = lim_lut[lvl]
        return E, I, lvl >> 4, lvl > 0

    def v_pass(plane, n, wmap, lvlrep, e_of, lim_wp, r0):
        # n: SB rows in px (64 luma / 32 chroma); e edges = n // 4
        def body(e, pl):
            x4 = e_of(e)
            x = x4 * 4
            slab = jax.lax.dynamic_slice(pl, (r0 + 8, x), (n, 16))
            wd4 = jax.lax.dynamic_slice(
                wmap, (r0 // 4, x4), (n // 4, 1))[:, 0]
            wd = _rep(wd4, 4)
            lvl = lvlrep(e)
            E, I, Hh, lok = lvl_params(lvl)
            gate = (x4 > 0) & (x4 < lim_wp) & (wd > 0) & lok
            out = edge_filter(slab, E, I, Hh, wd, gate)
            return jax.lax.dynamic_update_slice(pl, out, (r0 + 8, x))
        return jax.lax.fori_loop(0, n // 4, body, plane)

    def h_pass(plane, n, wmap, lvlrep, e_of, lim_hp, c0):
        def body(e, pl):
            y4 = e_of(e)
            yy = y4 * 4
            slab = jax.lax.dynamic_slice(pl, (yy, c0 + 8), (16, n)).T
            wd4 = jax.lax.dynamic_slice(
                wmap, (y4, c0 // 4), (1, n // 4))[0]
            wd = _rep(wd4, 4)
            lvl = lvlrep(e)
            E, I, Hh, lok = lvl_params(lvl)
            gate = (y4 > 0) & (y4 < lim_hp) & (wd > 0) & lok
            out = edge_filter(slab, E, I, Hh, wd, gate).T
            return jax.lax.dynamic_update_slice(pl, out, (yy, c0 + 8))
        return jax.lax.fori_loop(0, n // 4, body, plane)

    # luma: lvl per pixel-row from lvl8[r*8 + i//8, x4//2]
    def y_v_lvl(e):
        l8 = jax.lax.dynamic_slice(lvl8, (r * 8, (c * 16 + e) // 2),
                                   (8, 1))[:, 0]
        return _rep(l8, 8)

    def y_h_lvl(e):
        l8 = jax.lax.dynamic_slice(lvl8, ((r * 16 + e) // 2, c * 8),
                                   (1, 8))[0]
        return _rep(l8, 8)

    y = v_pass(y, 64, wd_v, y_v_lvl, lambda e: c * 16 + e, lim_w,
               r * 64)
    y = h_pass(y, 64, wd_h, y_h_lvl, lambda e: r * 16 + e, lim_h,
               c * 64)

    def c_v_lvl(e):
        l8 = jax.lax.dynamic_slice(lvl8, (r * 8, c * 8 + e),
                                   (8, 1))[:, 0]
        return _rep(l8, 4)

    def c_h_lvl(e):
        l8 = jax.lax.dynamic_slice(lvl8, (r * 8 + e, c * 8), (1, 8))[0]
        return _rep(l8, 4)

    u = v_pass(u, 32, wd_v_uv, c_v_lvl, lambda e: c * 8 + e, lim_wc,
               r * 32)
    u = h_pass(u, 32, wd_h_uv, c_h_lvl, lambda e: r * 8 + e, lim_hc,
               c * 32)
    v = v_pass(v, 32, wd_v_uv, c_v_lvl, lambda e: c * 8 + e, lim_wc,
               r * 32)
    v = h_pass(v, 32, wd_h_uv, c_h_lvl, lambda e: r * 8 + e, lim_hc,
               c * 32)
    return (y, u, v)


@partial(jax.jit, static_argnums=(10, 11, 12))
def _lf_kernel(y, u, v, wd_v, wd_h, wd_v_uv, wd_h_uv, lvl8,
               lim_lut, mblim_lut, sb_rows, sb_cols, dims):
    def body(s, planes):
        r = s // sb_cols
        c = s % sb_cols
        return sb_body(r, c, planes,
                       (wd_v, wd_h, wd_v_uv, wd_h_uv, lvl8),
                       lim_lut, mblim_lut, dims)
    return jax.lax.fori_loop(0, sb_rows * sb_cols, body, (y, u, v))


def loopfilter_frame_tpu(fs):
    """Device loop filter over FrameState planes; mutates fs.y/u/v.
    Bit-exact vs lf.loopfilter_frame."""
    h = fs.h
    if not h.filter_level:
        return
    lim, mblim = _luts(h.sharpness)

    def pad8(a):
        return jnp.pad(jnp.asarray(a, jnp.int32), 8)

    y = pad8(fs.y)
    u = pad8(fs.u)
    v = pad8(fs.v)
    lvl8 = np.zeros((fs.sb_rows * 8, fs.sb_cols * 8), np.int32)
    lvl8[:fs.rows, :fs.cols] = fs.lf_lvl
    pw, ph = fs.cols * 8, fs.rows * 8
    dims = (pw >> 2, ph >> 2, pw >> 3, ph >> 3)
    yo, uo, vo = _lf_kernel(
        y, u, v, jnp.asarray(fs.wd_v), jnp.asarray(fs.wd_h),
        jnp.asarray(fs.wd_v_uv), jnp.asarray(fs.wd_h_uv),
        jnp.asarray(lvl8), jnp.asarray(lim), jnp.asarray(mblim),
        fs.sb_rows, fs.sb_cols, dims)
    fs.y[:] = np.asarray(yo)[8:-8, 8:-8].astype(np.uint8)
    fs.u[:] = np.asarray(uo)[8:-8, 8:-8].astype(np.uint8)
    fs.v[:] = np.asarray(vo)[8:-8, 8:-8].astype(np.uint8)
