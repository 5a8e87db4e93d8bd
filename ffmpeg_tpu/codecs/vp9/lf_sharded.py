"""VP9 loop filter across a device mesh: tile columns sharded over
the 'spatial' axis, pipelined SB-row wavefront with halo exchange
(SURVEY §5; the tile-across-chips pattern of vp9.c:1996 tile decode).

The deblocker's cross-SB dependency graph is (r,c) ← (r,c-1) and
(r,c) ← (r-1,c+1), so shard k may filter SB row r at step t = 2r + k.
Each step every shard: (1) fetches fresh 16-px column halos from both
neighbours with lax.ppermute, (2) if active, filters its SB row with
the same edge kernel as lf_tpu (including writes INTO the halos:
the tile-boundary vertical edge writes up to 7px into the left
neighbour, interior edges up to 3px into the right), and (3) sends
the edited halos back, where the idle neighbour merges them. The
result is bit-exact with the unsharded filter."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .lf_tpu import _luts, edge_filter, _rep


def _v_pass(ext, n, wmap, lvlrep, r0, c4_base, col_off4, lim_w,
            lim_lut, mblim_lut, halo4):
    """Vertical edges of one SB within `ext` (rows padded by 8, cols =
    16px halo + own + 16px halo, scaled by plane). c4_base: first 4px
    edge index (local); col_off4: global 4px offset of local col 0."""
    def body(e, pl):
        x4l = c4_base + e
        x4g = x4l + col_off4
        x = x4l * 4 + halo4 * 4           # ext col of edge
        slab = jax.lax.dynamic_slice(pl, (r0 + 8, x - 8), (n, 16))
        wd4 = jax.lax.dynamic_slice(wmap, (r0 // 4, x4l),
                                    (n // 4, 1))[:, 0]
        wd = _rep(wd4, 4)
        lvl = lvlrep(e)
        E = mblim_lut[lvl]
        I = lim_lut[lvl]
        gate = (x4g > 0) & (x4g < lim_w) & (wd > 0) & (lvl > 0)
        out = edge_filter(slab, E, I, lvl >> 4, wd, gate)
        return jax.lax.dynamic_update_slice(pl, out, (r0 + 8, x - 8))
    return jax.lax.fori_loop(0, n // 4, body, ext)


def _h_pass(ext, n, wmap, lvlrep, r4_base, c0, lim_h, lim_lut,
            mblim_lut, halo4):
    def body(e, pl):
        y4 = r4_base + e
        yy = y4 * 4
        xc = c0 + halo4 * 4
        slab = jax.lax.dynamic_slice(pl, (yy, xc), (16, n)).T
        wd4 = jax.lax.dynamic_slice(wmap, (y4, c0 // 4),
                                    (1, n // 4))[0]
        wd = _rep(wd4, 4)
        lvl = lvlrep(e)
        E = mblim_lut[lvl]
        I = lim_lut[lvl]
        gate = (y4 > 0) & (y4 < lim_h) & (wd > 0) & (lvl > 0)
        out = edge_filter(slab, E, I, lvl >> 4, wd, gate).T
        return jax.lax.dynamic_update_slice(pl, out, (yy, xc))
    return jax.lax.fori_loop(0, n // 4, body, ext)


def make_sharded_lf(mesh, sb_rows, sb_cols_local, dims, axis="spatial"):
    """→ jitted fn(y, u, v, wd_v, wd_h, wd_v_uv, wd_h_uv, lvl8, lim,
    mblim) over column-sharded (never materialised whole) planes.
    Planes are (Hp+16, Wp) etc — rows pre-padded by 8, columns exact.
    dims = (lim_w, lim_h, lim_wc, lim_hc) global 4px extents."""
    from jax.sharding import PartitionSpec as P

    n_sh = mesh.shape[axis]
    lim_w, lim_h, lim_wc, lim_hc = dims
    T = 2 * sb_rows + n_sh

    def local(y, u, v, wd_v, wd_h, wd_v_uv, wd_h_uv, lvl8, lim,
              mblim):
        k = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [((i + 1) % n_sh, i) for i in range(n_sh)]
        wl = y.shape[1]                   # local luma width
        wlc = u.shape[1]

        def fetch(pl, h):
            from_left = jax.lax.ppermute(pl[:, -h:], axis, fwd)
            from_right = jax.lax.ppermute(pl[:, :h], axis, bwd)
            return jnp.concatenate([from_left, pl, from_right], 1)

        def sb_row(r, exts):
            ey, eu, ev = exts
            r0y = r * 64
            r0c = r * 32
            col4 = k * (wl // 4)          # global 4px offset (luma)
            col4c = k * (wlc // 4)

            def one_sb(ci, exts):
                ey, eu, ev = exts

                def y_v_lvl(e):
                    l8 = jax.lax.dynamic_slice(
                        lvl8, (r * 8, (ci * 16 + e) // 2),
                        (8, 1))[:, 0]
                    return _rep(l8, 8)

                def y_h_lvl(e):
                    l8 = jax.lax.dynamic_slice(
                        lvl8, ((r * 16 + e) // 2, ci * 8), (1, 8))[0]
                    return _rep(l8, 8)

                def c_v_lvl(e):
                    l8 = jax.lax.dynamic_slice(
                        lvl8, (r * 8, ci * 8 + e), (8, 1))[:, 0]
                    return _rep(l8, 4)

                def c_h_lvl(e):
                    l8 = jax.lax.dynamic_slice(
                        lvl8, (r * 8 + e, ci * 8), (1, 8))[0]
                    return _rep(l8, 4)

                ey = _v_pass(ey, 64, wd_v, y_v_lvl, r0y, ci * 16,
                             col4, lim_w, lim, mblim, 4)
                ey = _h_pass(ey, 64, wd_h, y_h_lvl, r * 16, ci * 64,
                             lim_h, lim, mblim, 4)
                eu = _v_pass(eu, 32, wd_v_uv, c_v_lvl, r0c, ci * 8,
                             col4c, lim_wc, lim, mblim, 2)
                eu = _h_pass(eu, 32, wd_h_uv, c_h_lvl, r * 8,
                             ci * 32, lim_hc, lim, mblim, 2)
                ev = _v_pass(ev, 32, wd_v_uv, c_v_lvl, r0c, ci * 8,
                             col4c, lim_wc, lim, mblim, 2)
                ev = _h_pass(ev, 32, wd_h_uv, c_h_lvl, r * 8,
                             ci * 32, lim_hc, lim, mblim, 2)
                return (ey, eu, ev)

            return jax.lax.fori_loop(0, sb_cols_local, one_sb,
                                     (ey, eu, ev))

        def step(t, planes):
            y, u, v = planes
            r = (t - k) // 2
            active = ((t - k) % 2 == 0) & (r >= 0) & (r < sb_rows)
            ey = fetch(y, 16)
            eu = fetch(u, 8)
            ev = fetch(v, 8)
            rr = jnp.clip(r, 0, sb_rows - 1)
            ney, neu, nev = sb_row(rr, (ey, eu, ev))
            ey = jnp.where(active, ney, ey)
            eu = jnp.where(active, neu, eu)
            ev = jnp.where(active, nev, ev)

            def merge(pl, ext, h):
                own = ext[:, h:-h]
                # edited halo copies travel back to their owners
                to_left = jax.lax.ppermute(ext[:, :h], axis, bwd)
                to_right = jax.lax.ppermute(ext[:, -h:], axis, fwd)
                right_act = ((t - (k + 1)) % 2 == 0) & \
                    (((t - (k + 1)) // 2 >= 0) &
                     ((t - (k + 1)) // 2 < sb_rows)) & (k + 1 < n_sh)
                left_act = ((t - (k - 1)) % 2 == 0) & \
                    (((t - (k - 1)) // 2 >= 0) &
                     ((t - (k - 1)) // 2 < sb_rows)) & (k - 1 >= 0)
                own = own.at[:, -h:].set(
                    jnp.where(right_act, to_left, own[:, -h:]))
                own = own.at[:, :h].set(
                    jnp.where(left_act, to_right, own[:, :h]))
                return own

            return (merge(y, ey, 16), merge(u, eu, 8),
                    merge(v, ev, 8))

        return jax.lax.fori_loop(0, T, step, (y, u, v))

    spec = P(None, axis)
    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec,
                  P(None, axis), P(None), P(None)),
        out_specs=(spec, spec, spec)))


def loopfilter_sharded(fs, mesh, axis="spatial"):
    """Filter fs planes with tile columns sharded over `mesh`;
    bit-exact vs lf.loopfilter_frame. Requires sb_cols divisible by
    the mesh axis size."""
    h = fs.h
    if not h.filter_level:
        return
    n_sh = mesh.shape[axis]
    if fs.sb_cols % n_sh:
        raise ValueError("sb_cols must divide over the mesh axis")
    lim, mblim = _luts(h.sharpness)
    pw, ph = fs.cols * 8, fs.rows * 8
    dims = (pw >> 2, ph >> 2, pw >> 3, ph >> 3)
    lvl8 = np.zeros((fs.sb_rows * 8, fs.sb_cols * 8), np.int32)
    lvl8[:fs.rows, :fs.cols] = fs.lf_lvl

    def padr(a):                          # pad rows only
        return jnp.pad(jnp.asarray(a, jnp.int32), ((8, 8), (0, 0)))

    fn = make_sharded_lf(mesh, fs.sb_rows, fs.sb_cols // n_sh, dims,
                         axis)
    yo, uo, vo = fn(padr(fs.y), padr(fs.u), padr(fs.v),
                    jnp.asarray(fs.wd_v), jnp.asarray(fs.wd_h),
                    jnp.asarray(fs.wd_v_uv), jnp.asarray(fs.wd_h_uv),
                    jnp.asarray(lvl8), jnp.asarray(lim),
                    jnp.asarray(mblim))
    fs.y[:] = np.asarray(yo)[8:-8].astype(np.uint8)
    fs.u[:] = np.asarray(uo)[8:-8].astype(np.uint8)
    fs.v[:] = np.asarray(vo)[8:-8].astype(np.uint8)
