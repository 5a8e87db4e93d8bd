"""VP9 in-loop deblock as a WAVEFRONT over superblocks.

lf_tpu.py runs the reference's raster-SB loop as a sequential
lax.fori_loop — 510 iterations at 1080p, a ~144 ms/frame floor
regardless of content. The raster order's true dependency set is
{left, top, top-right} (an SB's vertical edges write up to 7 px into
the LEFT neighbour and its horizontal edges up to 7 px into the TOP
neighbour, whose bottom-right corner the top-right neighbour's
vertical edge also touches), so the schedule d = 2*r + c is exact:
every SB on a step depends only on earlier steps, and same-step SBs'
80x80 working tiles are provably disjoint (their column gap is >= 2
SBs). 1080p runs in 2*16+29 = 61 steps instead of 510, each step
filtering up to ~15 SBs' tiles in parallel (vmapped, tile-local
STATIC edge offsets; the same edge_filter math as lf_tpu —
bit-exact). The step loop is a lax.scan over precomputed per-step
tile offsets, so the program traces ONE step body.

Reference: libavcodec/vp9.c loopfilter_sb order; vp9dsp loop_filter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .lf_tpu import _rep, edge_filter

T = 64          # luma SB size
PAD = 8         # halo pixels kept around each tile
TL = T + 2 * PAD            # 80: luma tile side
TC = T // 2 + 2 * PAD       # 48: chroma tile side


def _lvl_params(lvl, lim_lut, mblim_lut):
    E = mblim_lut[lvl]
    I = lim_lut[lvl]
    return E, I, lvl >> 4, lvl > 0


def _filter_tile_luma(tile, wdv, wdh, lvl8t, lim, mblim, gx, gy,
                      lim_w, lim_h):
    """tile (TL, TL) int32; wdv/wdh (TL//4, TL//4) per-4px maps for
    the same region; lvl8t (TL//8, TL//8); gx/gy absolute 4px coords
    of the tile's (PAD, PAD) corner (frame-edge gates)."""
    for e in range(16):                    # vertical edges, l->r
        xl = PAD + e * 4
        slab = tile[PAD:PAD + T, xl - 8:xl + 8]
        wd = _rep(wdv[PAD // 4:PAD // 4 + 16, PAD // 4 + e], 4)
        lvl = _rep(lvl8t[PAD // 8:PAD // 8 + 8, (PAD // 4 + e) // 2],
                   8)
        E, I, H, lok = _lvl_params(lvl, lim, mblim)
        x4 = gx + e
        gate = (x4 > 0) & (x4 < lim_w) & (wd > 0) & lok
        out = edge_filter(slab, E, I, H, wd, gate)
        tile = jax.lax.dynamic_update_slice(tile, out, (PAD, xl - 8))
    for e in range(16):                    # horizontal edges, t->b
        yl = PAD + e * 4
        slab = tile[yl - 8:yl + 8, PAD:PAD + T].T
        wd = _rep(wdh[PAD // 4 + e, PAD // 4:PAD // 4 + 16], 4)
        lvl = _rep(lvl8t[(PAD // 4 + e) // 2, PAD // 8:PAD // 8 + 8],
                   8)
        E, I, H, lok = _lvl_params(lvl, lim, mblim)
        y4 = gy + e
        gate = (y4 > 0) & (y4 < lim_h) & (wd > 0) & lok
        out = edge_filter(slab, E, I, H, wd, gate).T
        tile = jax.lax.dynamic_update_slice(tile, out, (yl - 8, PAD))
    return tile


def _filter_tile_chroma(tile, wdv, wdh, lvlt, lim, mblim, gx, gy,
                        lim_wc, lim_hc):
    """tile (TC, TC); wdv/wdh/lvlt (TC//4, TC//4) chroma-4px maps
    (lvl at MI granularity == chroma 4px)."""
    n = T // 2
    for e in range(8):
        xl = PAD + e * 4
        slab = tile[PAD:PAD + n, xl - 8:xl + 8]
        wd = _rep(wdv[PAD // 4:PAD // 4 + 8, PAD // 4 + e], 4)
        lvl = _rep(lvlt[PAD // 4:PAD // 4 + 8, PAD // 4 + e], 4)
        E, I, H, lok = _lvl_params(lvl, lim, mblim)
        x4 = gx + e
        gate = (x4 > 0) & (x4 < lim_wc) & (wd > 0) & lok
        out = edge_filter(slab, E, I, H, wd, gate)
        tile = jax.lax.dynamic_update_slice(tile, out, (PAD, xl - 8))
    for e in range(8):
        yl = PAD + e * 4
        slab = tile[yl - 8:yl + 8, PAD:PAD + n].T
        wd = _rep(wdh[PAD // 4 + e, PAD // 4:PAD // 4 + 8], 4)
        lvl = _rep(lvlt[PAD // 4 + e, PAD // 4:PAD // 4 + 8], 4)
        E, I, H, lok = _lvl_params(lvl, lim, mblim)
        y4 = gy + e
        gate = (y4 > 0) & (y4 < lim_hc) & (wd > 0) & lok
        out = edge_filter(slab, E, I, H, wd, gate).T
        tile = jax.lax.dynamic_update_slice(tile, out, (yl - 8, PAD))
    return tile


def _schedule(sb_rows, sb_cols):
    """Per-step (kmax-padded) SB index arrays for d = 2r + c."""
    nsteps = 2 * (sb_rows - 1) + sb_cols
    steps = []
    kmax = 0
    for d in range(nsteps):
        sbs = [(r, d - 2 * r) for r in range(sb_rows)
               if 0 <= d - 2 * r < sb_cols]
        steps.append(sbs)
        kmax = max(kmax, len(sbs))
    rs = np.zeros((nsteps, kmax), np.int32)
    cs = np.zeros((nsteps, kmax), np.int32)
    valid = np.zeros((nsteps, kmax), bool)
    for i, sbs in enumerate(steps):
        for j, (r, c) in enumerate(sbs):
            rs[i, j], cs[i, j], valid[i, j] = r, c, True
    return rs, cs, valid


def loopfilter_wavefront(y8, u8, v8, wd_v, wd_h, wd_v_uv, wd_h_uv,
                         lvl8, lim, mblim, sb_rows, sb_cols, dims):
    """y8/u8/v8: UNPADDED uint8/int32 planes (sb-padded dims). Returns
    filtered int32 planes of the same shapes. Bit-exact vs
    lf_tpu._lf_kernel / lf.py."""
    lim_w, lim_h, lim_wc, lim_hc = dims
    lim = jnp.asarray(lim, jnp.int32)
    mblim = jnp.asarray(mblim, jnp.int32)
    hp, wp = y8.shape
    # plane pad: PAD halo + a TL scratch band at the bottom for the
    # kmax-padding lanes (they all write the same scratch tile;
    # overlapping writes there are harmless)
    y = jnp.pad(y8.astype(jnp.int32), ((PAD, PAD + TL), (PAD, TL)))
    u = jnp.pad(u8.astype(jnp.int32), ((PAD, PAD + TC), (PAD, TC)))
    v = jnp.pad(v8.astype(jnp.int32), ((PAD, PAD + TC), (PAD, TC)))

    def pad_map(m, cells, extra):
        return jnp.pad(m, ((cells, cells + extra), (cells, extra)))

    wdv_p = pad_map(wd_v, PAD // 4, TL)
    wdh_p = pad_map(wd_h, PAD // 4, TL)
    wdvc_p = pad_map(wd_v_uv, PAD // 4, TC)
    wdhc_p = pad_map(wd_h_uv, PAD // 4, TC)
    lvl8_p = pad_map(lvl8, PAD // 8, TL)
    lvlc_p = pad_map(lvl8, PAD // 4, TC)   # MI == chroma 4px cells

    rs, cs, valid = _schedule(sb_rows, sb_cols)
    scr_y = hp + PAD                       # scratch rows (padded plane)
    scr_c = hp // 2 + PAD

    def mk(r_mul, c_mul, scratch_row):
        oy = np.where(valid, rs * r_mul, scratch_row)
        ox = np.where(valid, cs * c_mul, 0)
        return jnp.asarray(np.stack([oy, ox], -1))

    xs = {
        "o_y": mk(T, T, scr_y),
        "o_c": mk(T // 2, T // 2, scr_c),
        "m16": mk(16, 16, 0),
        "m8": mk(8, 8, 0),
        "gx": jnp.asarray(np.where(valid, cs * 16, -100)),
        "gy": jnp.asarray(np.where(valid, rs * 16, -100)),
        "gxc": jnp.asarray(np.where(valid, cs * 8, -100)),
        "gyc": jnp.asarray(np.where(valid, rs * 8, -100)),
    }

    def gather(plane, offs, side):
        return jax.vmap(lambda o: jax.lax.dynamic_slice(
            plane, (o[0], o[1]), (side, side)))(offs)

    def scatter(plane, offs, tiles):
        def body(i, pl):
            return jax.lax.dynamic_update_slice(
                pl, tiles[i], (offs[i, 0], offs[i, 1]))
        return jax.lax.fori_loop(0, offs.shape[0], body, plane)

    def step(carry, x):
        y, u, v = carry
        t = gather(y, x["o_y"], TL)
        wv = gather(wdv_p, x["m16"], TL // 4)
        wh = gather(wdh_p, x["m16"], TL // 4)
        l8 = gather(lvl8_p, x["m8"], TL // 8)
        t = jax.vmap(_filter_tile_luma,
                     in_axes=(0, 0, 0, 0, None, None, 0, 0, None,
                              None))(t, wv, wh, l8, lim, mblim,
                                     x["gx"], x["gy"], lim_w, lim_h)
        y = scatter(y, x["o_y"], t)
        wvc = gather(wdvc_p, x["m8"], TC // 4)
        whc = gather(wdhc_p, x["m8"], TC // 4)
        lc = gather(lvlc_p, x["m8"], TC // 4)
        for which in (0, 1):
            pl = u if which == 0 else v
            tc = gather(pl, x["o_c"], TC)
            tc = jax.vmap(_filter_tile_chroma,
                          in_axes=(0, 0, 0, 0, None, None, 0, 0,
                                   None, None))(tc, wvc, whc, lc,
                                                lim, mblim, x["gxc"],
                                                x["gyc"], lim_wc,
                                                lim_hc)
            if which == 0:
                u = scatter(u, x["o_c"], tc)
            else:
                v = scatter(v, x["o_c"], tc)
        return (y, u, v), 0

    (y, u, v), _ = jax.lax.scan(step, (y, u, v), xs)
    return (y[PAD:PAD + hp, PAD:PAD + wp],
            u[PAD:PAD + hp // 2, PAD:PAD + wp // 2],
            v[PAD:PAD + hp // 2, PAD:PAD + wp // 2])
