"""HEVC in-loop filters on the TPU (deblock + SAO), bit-exact with
the host filter.py (spec 8.7.2/8.7.3; reference libavcodec/hevc/
filter.c hevc_loop_filter_luma/chroma + sao_filter_CTB).

Layout: the whole picture filters as a handful of dense int32 tensor
ops — no per-edge Python loops. Vertical luma edges sit at x = 8k, so
`plane[:, 4 : 4 + 8*nE].reshape(H, nE, 8)` is exactly the (p3..q3)
slab of every edge at once; decisions (d < beta, strong/weak, dSam)
become per-segment masks over a (H/4, nE) grid. Horizontal edges are
the transpose. SAO builds per-pixel offset maps from the per-CTB
parameters (band LUT gather / EO neighbour compare) in one shot.

`sharded_filters` runs the same math with the picture sharded in tile
columns over a mesh axis: the vertical-edge pass needs the 4 boundary
columns of the left neighbour (fetched and written back via
lax.ppermute inside shard_map — parallel/halo.py pattern); horizontal
edges and band SAO are shard-local; edge SAO exchanges 1-px column
halos. With loop_filter_across_tiles=0 the tiles are fully
independent and no communication is emitted.
"""

from __future__ import annotations

import numpy as np

from . import tables as T


def _jnp():
    import jax.numpy as jnp
    return jnp


# ---------------------------------------------------------------------------
# deblock


def _luma_edge_filter(slab, tc, beta, bd):
    """slab (S, 4, E, 8) int32: S 4-row segments x E edges, cols are
    p3..p0 q0..q3. tc/beta (S, E) int32 (already bit-depth scaled,
    0 = edge off). Returns filtered slab."""
    jnp = _jnp()
    pmax = (1 << bd) - 1
    p = slab[..., 3::-1]                      # p0..p3 at [...,0..3]
    q = slab[..., 4:]

    dp_r = jnp.abs(p[:, :, :, 2] - 2 * p[:, :, :, 1] + p[:, :, :, 0])
    dq_r = jnp.abs(q[:, :, :, 2] - 2 * q[:, :, :, 1] + q[:, :, :, 0])
    dp0, dp3 = dp_r[:, 0], dp_r[:, 3]         # (S, E)
    dq0, dq3 = dq_r[:, 0], dq_r[:, 3]
    d0 = dp0 + dq0
    d3 = dp3 + dq3
    on = (tc > 0) & (d0 + d3 < beta)          # (S, E)

    def dsam(i, d):
        return ((2 * d < (beta >> 2))
                & (jnp.abs(p[:, i, :, 3] - p[:, i, :, 0])
                   + jnp.abs(q[:, i, :, 0] - q[:, i, :, 3])
                   < (beta >> 3))
                & (jnp.abs(p[:, i, :, 0] - q[:, i, :, 0])
                   < ((5 * tc + 1) >> 1)))

    strong = on & dsam(0, d0) & dsam(3, d3)   # (S, E)

    # strong filter (8.7.2.5.7), per row
    tc2 = (2 * tc)[:, None, :]
    P0, P1, P2, P3 = (p[..., 0], p[..., 1], p[..., 2], p[..., 3])
    Q0, Q1, Q2, Q3 = (q[..., 0], q[..., 1], q[..., 2], q[..., 3])
    cl = lambda ref, v: jnp.clip(v, ref - tc2, ref + tc2)  # noqa: E731
    sp0 = cl(P0, (P2 + 2 * P1 + 2 * P0 + 2 * Q0 + Q1 + 4) >> 3)
    sp1 = cl(P1, (P2 + P1 + P0 + Q0 + 2) >> 2)
    sp2 = cl(P2, (2 * P3 + 3 * P2 + P1 + P0 + Q0 + 4) >> 3)
    sq0 = cl(Q0, (P1 + 2 * P0 + 2 * Q0 + 2 * Q1 + Q2 + 4) >> 3)
    sq1 = cl(Q1, (P0 + Q0 + Q1 + Q2 + 2) >> 2)
    sq2 = cl(Q2, (P0 + Q0 + Q1 + 3 * Q2 + 2 * Q3 + 4) >> 3)

    # weak filter (8.7.2.5.3), per row with per-segment side flags
    side = ((beta + (beta >> 1)) >> 3)
    filt_p = (dp0 + dp3 < side)[:, None, :]
    filt_q = (dq0 + dq3 < side)[:, None, :]
    delta = (9 * (Q0 - P0) - 3 * (Q1 - P1) + 8) >> 4
    wk_on = jnp.abs(delta) < (tc * 10)[:, None, :]
    tcb = tc[:, None, :]
    delta = jnp.clip(delta, -tcb, tcb)
    wp0 = jnp.clip(P0 + delta, 0, pmax)
    dp = jnp.clip((((P2 + P0 + 1) >> 1) - P1 + delta) >> 1,
                  -(tcb >> 1), tcb >> 1)
    wp1 = jnp.clip(P1 + dp, 0, pmax)
    wq0 = jnp.clip(Q0 - delta, 0, pmax)
    dq = jnp.clip((((Q2 + Q0 + 1) >> 1) - Q1 - delta) >> 1,
                  -(tcb >> 1), tcb >> 1)
    wq1 = jnp.clip(Q1 + dq, 0, pmax)

    sb = strong[:, None, :]
    wb = (on & ~strong)[:, None, :] & wk_on
    np0 = jnp.where(sb, sp0, jnp.where(wb, wp0, P0))
    np1 = jnp.where(sb, sp1, jnp.where(wb & filt_p, wp1, P1))
    np2 = jnp.where(sb, sp2, P2)
    nq0 = jnp.where(sb, sq0, jnp.where(wb, wq0, Q0))
    nq1 = jnp.where(sb, sq1, jnp.where(wb & filt_q, wq1, Q1))
    nq2 = jnp.where(sb, sq2, Q2)
    out = jnp.stack([p[..., 3], np2, np1, np0, nq0, nq1, nq2,
                     q[..., 3]], axis=-1)
    return out


def _luma_pass_v(plane, tcm, betam, bd):
    """All vertical luma edges. plane (H, W) int32; tcm/betam
    (H//4, W//8 - 1) for edges at x = 8, 16, ..."""
    jnp = _jnp()
    H, W = plane.shape
    nE = W // 8 - 1
    if nE <= 0:
        return plane
    slab = plane[:, 4:4 + 8 * nE].reshape(H // 4, 4, nE, 8)
    out = _luma_edge_filter(slab, tcm, betam, bd)
    return plane.at[:, 4:4 + 8 * nE].set(
        out.reshape(H, nE * 8))


def _luma_pass_h(plane, tcm, betam, bd):
    """All horizontal luma edges via transpose."""
    return _luma_pass_v(plane.T, tcm, betam, bd).T


def _chroma_edge_filter(slab, tc, bd):
    """slab (S, 4, E, 4): p1 p0 q0 q1. tc (S, E) (0 = off)."""
    jnp = _jnp()
    pmax = (1 << bd) - 1
    p1, p0 = slab[..., 0], slab[..., 1]
    q0, q1 = slab[..., 2], slab[..., 3]
    tcb = tc[:, None, :]
    delta = jnp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tcb, tcb)
    on = (tc > 0)[:, None, :]
    np0 = jnp.where(on, jnp.clip(p0 + delta, 0, pmax), p0)
    nq0 = jnp.where(on, jnp.clip(q0 - delta, 0, pmax), q0)
    return jnp.stack([p1, np0, nq0, q1], axis=-1)


def _chroma_pass_v(plane, tcm, bd):
    """Vertical chroma edges at x = 8k (chroma coords, 4:2:0 means
    16-luma grid). plane (Hc, Wc); tcm (Hc//4, Wc//8 - 1)."""
    H, W = plane.shape
    nE = W // 8 - 1
    if nE <= 0:
        return plane
    slab = plane[:, 4:4 + 8 * nE].reshape(H // 4, 4, nE, 8)
    out = _chroma_edge_filter(slab[..., 2:6], tcm, bd)
    slab = slab.at[..., 2:6].set(out)
    return plane.at[:, 4:4 + 8 * nE].set(slab.reshape(H, nE * 8))


def _chroma_pass_h(plane, tcm, bd):
    return _chroma_pass_v(plane.T, tcm, bd).T


def build_deblock_params(dec):
    """Host-side: per-edge tc/beta maps from the bs maps + slice
    params (everything data-independent of the pixels)."""
    sps, sh = dec.sps, dec.sh
    bd = sps.bit_depth
    bdsh = bd - 8
    W, H = sps.width, sps.height
    qp = dec.qp
    from .recon import chroma_qp
    beta_t = np.asarray(T.BETA_TABLE, np.int32)
    tc_t = np.asarray(T.TC_TABLE, np.int32)

    bs_v = np.asarray(dec.bs_v)
    bs_h = np.asarray(dec.bs_h)
    if dec.pps.tiles_enabled and not dec.pps.loop_filter_across_tiles:
        bs_v = bs_v.copy()
        bs_h = bs_h.copy()
        for cb in dec.col_bd[1:-1]:
            bs_v[:, (cb << sps.log2_ctb) >> 2] = 0
        for rb in dec.row_bd[1:-1]:
            bs_h[(rb << sps.log2_ctb) >> 2, :] = 0

    def luma_maps(bs, nseg, nedge, col):
        # bs sampled at the edge, 4-sample granularity
        m = bs[:nseg * 1, col]                  # (nseg, nedge)
        beta = beta_t[np.clip(qp + sh.beta_offset, 0, 51)] << bdsh
        idxt = np.clip(qp + 2 * (m - 1) + sh.tc_offset, 0, 53)
        tc = np.where(m > 0, tc_t[idxt] << bdsh, 0).astype(np.int32)
        betam = np.where(tc > 0, beta, 0).astype(np.int32)
        return tc, betam

    # vertical luma: edges at x = 8(k+1), segments of 4 rows
    nEv = W // 8 - 1
    colv = (np.arange(nEv) * 8 + 8) >> 2
    tc_v, beta_v = luma_maps(bs_v, H // 4, nEv, colv)
    # horizontal luma (transposed plane): edges at y = 8(k+1)
    nEh = H // 8 - 1
    colh = (np.arange(nEh) * 8 + 8) >> 2
    tc_h, beta_h = luma_maps(bs_h.T, W // 4, nEh, colh)

    # chroma: edges on the 16-luma grid, bS == 2 only
    out_c = {}
    for c_idx in (1, 2):
        off = (dec.pps.cb_qp_offset + dec.sh.cb_qp_offset) if c_idx == 1 \
            else (dec.pps.cr_qp_offset + dec.sh.cr_qp_offset)
        qpc = chroma_qp(qp, off)
        tcc = int(tc_t[np.clip(qpc + 2 + sh.tc_offset, 0, 53)]) << bdsh
        nEcv = (W // 2) // 8 - 1
        colc = (np.arange(nEcv) * 16 + 16) >> 2        # luma cols
        m = bs_v[::2, :][:(H // 2) // 4, colc]          # luma rows 8k
        tc_cv = np.where(m == 2, tcc, 0).astype(np.int32)
        nEch = (H // 2) // 8 - 1
        rowc = (np.arange(nEch) * 16 + 16) >> 2
        m = bs_h.T[::2, :][:(W // 2) // 4, rowc]
        tc_ch = np.where(m == 2, tcc, 0).astype(np.int32)
        out_c[c_idx] = (tc_cv, tc_ch)
    return dict(tc_v=tc_v, beta_v=beta_v, tc_h=tc_h, beta_h=beta_h,
                chroma=out_c, bd=bd)


def deblock_frame_tpu(y, u, v, prm):
    """Device deblock: y/u/v int32 arrays, prm from
    build_deblock_params. Returns filtered (y, u, v)."""
    bd = prm["bd"]
    y = _luma_pass_v(y, prm["tc_v"], prm["beta_v"], bd)
    y = _luma_pass_h(y, prm["tc_h"], prm["beta_h"], bd)
    tc_cv1, tc_ch1 = prm["chroma"][1]
    tc_cv2, tc_ch2 = prm["chroma"][2]
    u = _chroma_pass_v(u, tc_cv1, bd)
    u = _chroma_pass_h(u, tc_ch1, bd)
    v = _chroma_pass_v(v, tc_cv2, bd)
    v = _chroma_pass_h(v, tc_ch2, bd)
    return y, u, v


# ---------------------------------------------------------------------------
# SAO

_EO_NEIGH = ((0, -1, 0, 1), (-1, 0, 1, 0),
             (-1, -1, 1, 1), (-1, 1, 1, -1))


def build_sao_params(dec):
    """Host-side per-plane SAO parameter maps at CTB granularity."""
    sps, sh = dec.sps, dec.sh
    bd = sps.bit_depth
    osc = bd - min(bd, 10)
    out = []
    restrict = (dec.pps.tiles_enabled
                and not dec.pps.loop_filter_across_tiles)
    for c_idx in range(3):
        use = sh.sao_luma if c_idx == 0 else sh.sao_chroma
        ch, cw = sps.ctb_height, sps.ctb_width
        typ = np.asarray(dec.sao_type[:, :, c_idx], np.int32)
        if not use:
            typ = np.zeros_like(typ)
        eo = np.asarray(dec.sao_eo_class[:, :, c_idx], np.int32)
        offs = np.asarray(dec.sao_offset[:, :, c_idx], np.int32) << osc
        # band LUT per CTB: 32 entries
        lut = np.zeros((ch, cw, 32), np.int32)
        pos = np.asarray(dec.sao_band_pos[:, :, c_idx], np.int32)
        for i in range(4):
            np.put_along_axis(lut, ((pos + i) & 31)[..., None],
                              offs[:, :, i + 1:i + 2], axis=2)
        # tile bounds per CTB (component coords) for EO restriction
        shift = 0 if c_idx == 0 else 1
        Hc = sps.height >> shift
        Wc = sps.width >> shift
        lo_x = np.zeros((ch, cw), np.int32)
        hi_x = np.full((ch, cw), Wc - 1, np.int32)
        lo_y = np.zeros((ch, cw), np.int32)
        hi_y = np.full((ch, cw), Hc - 1, np.int32)
        if restrict:
            col_bd, row_bd = dec.col_bd, dec.row_bd
            for tc_i in range(len(col_bd) - 1):
                a, b = col_bd[tc_i], col_bd[tc_i + 1]
                lo_x[:, a:b] = (a << sps.log2_ctb) >> shift
                hi_x[:, a:b] = np.minimum(
                    ((b << sps.log2_ctb) >> shift) - 1, Wc - 1)
            for tr in range(len(row_bd) - 1):
                a, b = row_bd[tr], row_bd[tr + 1]
                lo_y[a:b, :] = (a << sps.log2_ctb) >> shift
                hi_y[a:b, :] = np.minimum(
                    ((b << sps.log2_ctb) >> shift) - 1, Hc - 1)
        out.append(dict(typ=typ, eo=eo, offs=offs, lut=lut,
                        lo_x=lo_x, hi_x=hi_x, lo_y=lo_y, hi_y=hi_y))
    return dict(planes=out, bd=bd, log2_ctb=sps.log2_ctb)


def _px_map(ctb_map, log2, shift, Hc, Wc):
    """Upsample a per-CTB map to per-pixel (component coords)."""
    jnp = _jnp()
    n = 1 << (log2 - shift)
    m = jnp.repeat(jnp.repeat(ctb_map, n, axis=0), n, axis=1)
    return m[:Hc, :Wc]


def sao_plane_tpu(plane, p, log2_ctb, bd, shift):
    """One plane of SAO on device. plane int32 (Hc, Wc)."""
    jnp = _jnp()
    Hc, Wc = plane.shape
    pmax = (1 << bd) - 1
    typ = _px_map(p["typ"], log2_ctb, shift, Hc, Wc)
    if not int(np.any(np.asarray(p["typ"]))):
        return plane
    # band offset: per-pixel LUT gather
    lut_px = _px_map(p["lut"], log2_ctb, shift, Hc, Wc)   # (H, W, 32)
    band = plane >> (bd - 5)
    band_off = jnp.take_along_axis(lut_px, band[..., None],
                                   axis=2)[..., 0]
    band_out = jnp.clip(plane + band_off, 0, pmax)
    # edge offset
    eo = _px_map(p["eo"], log2_ctb, shift, Hc, Wc)
    offs = _px_map(p["offs"], log2_ctb, shift, Hc, Wc)    # (H, W, 5)
    ys = jnp.arange(Hc)[:, None]
    xs = jnp.arange(Wc)[None, :]
    lo_x = _px_map(p["lo_x"], log2_ctb, shift, Hc, Wc)
    hi_x = _px_map(p["hi_x"], log2_ctb, shift, Hc, Wc)
    lo_y = _px_map(p["lo_y"], log2_ctb, shift, Hc, Wc)
    hi_y = _px_map(p["hi_y"], log2_ctb, shift, Hc, Wc)
    edge_res = plane
    ok_any = jnp.zeros_like(plane, dtype=bool)
    cat_val = jnp.zeros_like(plane)
    for cls, (ady, adx, bdy, bdx) in enumerate(_EO_NEIGH):
        a = jnp.roll(jnp.roll(plane, -ady, 0), -adx, 1)
        b = jnp.roll(jnp.roll(plane, -bdy, 0), -bdx, 1)
        okc = ((ys + min(ady, bdy) >= lo_y)
               & (ys + max(ady, bdy) <= hi_y)
               & (xs + min(adx, bdx) >= lo_x)
               & (xs + max(adx, bdx) <= hi_x))
        edge = 2 + jnp.sign(plane - a) + jnp.sign(plane - b)
        cat = jnp.where(edge == 2, 0,
                        jnp.where(edge < 2, edge + 1, edge))
        val = jnp.take_along_axis(offs, cat[..., None], axis=2)[..., 0]
        sel = eo == cls
        ok_any = ok_any | (sel & okc)
        cat_val = jnp.where(sel & okc, val, cat_val)
    edge_out = jnp.where(ok_any,
                         jnp.clip(plane + cat_val, 0, pmax), plane)
    return jnp.where(typ == 1, band_out,
                     jnp.where(typ == 2, edge_out, plane))


def sao_frame_tpu(y, u, v, prm):
    pl = prm["planes"]
    lc = prm["log2_ctb"]
    bd = prm["bd"]
    y = sao_plane_tpu(y, pl[0], lc, bd, 0)
    u = sao_plane_tpu(u, pl[1], lc, bd, 1)
    v = sao_plane_tpu(v, pl[2], lc, bd, 1)
    return y, u, v


def filters_tpu(dec):
    """Run deblock + SAO for one decoded picture on the device;
    returns (y, u, v) numpy arrays (same dtype as dec planes)."""
    import jax
    jnp = _jnp()
    dt = dec.y.dtype
    y = jnp.asarray(dec.y, jnp.int32)
    u = jnp.asarray(dec.u, jnp.int32)
    v = jnp.asarray(dec.v, jnp.int32)
    if not dec.sh.deblocking_disabled:
        dprm = build_deblock_params(dec)
        y, u, v = deblock_frame_tpu(y, u, v, dprm)
    if dec.sps.sao_enabled and (dec.sh.sao_luma or dec.sh.sao_chroma):
        sprm = build_sao_params(dec)
        y, u, v = sao_frame_tpu(y, u, v, sprm)
    return (np.asarray(y).astype(dt), np.asarray(u).astype(dt),
            np.asarray(v).astype(dt))


# ---------------------------------------------------------------------------
# tile-column sharding across the mesh (P3 across chips)


def _split_cols(a, n, axis=1):
    return np.split(np.asarray(a), n, axis=axis)


def sharded_filters(dec, mesh, axis="spatial"):
    """Deblock + SAO with the picture sharded in equal tile columns
    over `mesh[axis]` (one tile column per device). Bit-exact with
    filters_tpu. Cross-shard traffic: the vertical-edge pass fetches
    the left neighbour's 8 boundary columns and returns the 3 (luma) /
    1 (chroma) filtered p-side columns over lax.ppermute; edge SAO
    exchanges 1-px column halos. With loop_filter_across_tiles=0 the
    boundary tc is zero and the halo contents are never used.

    Reference analog: tiles decoded by execute2 jobs + cross-tile
    deblock (hevcdec.c:1118); here the tiles live on different chips
    and the halos ride ICI."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    sps = dec.sps
    ndev = mesh.shape[axis]
    W, H = sps.width, sps.height
    if W % (ndev * 16) or sps.ctb_width % ndev:
        raise ValueError("sharded_filters: width must split into "
                         "16px-aligned, whole-CTB equal columns")
    Ws = W // ndev
    bd = sps.bit_depth
    dt = dec.y.dtype

    do_deblock = not dec.sh.deblocking_disabled
    do_sao = dec.sps.sao_enabled and (dec.sh.sao_luma
                                      or dec.sh.sao_chroma)
    dprm = build_deblock_params(dec) if do_deblock else None
    sprm = build_sao_params(dec) if do_sao else None

    # --- per-shard parameter maps (host numpy, tiny) ----------------
    def pad_edge_map(m, nseg, nedge_full):
        """(nseg, nedge) edge map for edges at x=8(k+1) → padded to
        one edge per 8px block (edge j at x=8j, j=0 zeroed)."""
        out = np.zeros((nseg, nedge_full), np.int32)
        out[:, 1:] = m
        return out

    shards = {}
    if do_deblock:
        tc_v = pad_edge_map(dprm["tc_v"], H // 4, W // 8)
        beta_v = pad_edge_map(dprm["beta_v"], H // 4, W // 8)
        shards["tc_v"] = _split_cols(tc_v, ndev)
        shards["beta_v"] = _split_cols(beta_v, ndev)
        # horizontal maps shard along the W//4 segment axis
        shards["tc_h"] = _split_cols(dprm["tc_h"], ndev, axis=0)
        shards["beta_h"] = _split_cols(dprm["beta_h"], ndev, axis=0)
        for c in (1, 2):
            tcv, tch = dprm["chroma"][c]
            tcv = pad_edge_map(tcv, (H // 2) // 4, (W // 2) // 8)
            shards[f"tc_cv{c}"] = _split_cols(tcv, ndev)
            shards[f"tc_ch{c}"] = _split_cols(tch, ndev, axis=0)

    def local_filters(y, u, v, prms):
        (tc_v, beta_v, tc_h, beta_h,
         tc_cv1, tc_ch1, tc_cv2, tc_ch2, sao_maps) = prms
        n = jax.lax.psum(1, axis)
        idx = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [((i + 1) % n, i) for i in range(n)]

        def v_pass_luma(pl, tcm, betam):
            left = jax.lax.ppermute(pl[:, -8:], axis, fwd)
            ext = jnp.concatenate([left, pl], axis=1)
            hh, ww = ext.shape
            nE = ww // 8 - 1
            slab = ext[:, 4:4 + 8 * nE].reshape(hh // 4, 4, nE, 8)
            out = _luma_edge_filter(slab, tcm, betam, bd)
            ext = ext.at[:, 4:4 + 8 * nE].set(out.reshape(hh, nE * 8))
            # the boundary edge edits only p0..p2 of the halo (ext
            # cols 5..7); merging more would clobber this shard's own
            # q-side edits near its right edge with stale halo copies
            back = jax.lax.ppermute(ext[:, 5:8], axis, bwd)
            own = ext[:, 8:]
            merged = jnp.concatenate([own[:, :-3], back], axis=1)
            return jnp.where(idx < n - 1, merged, own)

        def v_pass_chroma(pl, tcm):
            left = jax.lax.ppermute(pl[:, -4:], axis, fwd)
            ext = jnp.concatenate([left, pl], axis=1)
            hh, ww = ext.shape
            nE = ww // 8
            slab = ext[:, :8 * nE].reshape(hh // 4, 4, nE, 8)
            outc = _chroma_edge_filter(slab[..., 2:6], tcm, bd)
            slab = slab.at[..., 2:6].set(outc)
            ext = ext.at[:, :8 * nE].set(slab.reshape(hh, nE * 8))
            # chroma boundary edge edits only p0 (ext col 3)
            back = jax.lax.ppermute(ext[:, 3:4], axis, bwd)
            own = ext[:, 4:]
            merged = jnp.concatenate([own[:, :-1], back], axis=1)
            return jnp.where(idx < n - 1, merged, own)

        if tc_v is not None:
            y = v_pass_luma(y, tc_v, beta_v)
            y = _luma_pass_h(y, tc_h, beta_h, bd)
            u = v_pass_chroma(u, tc_cv1)
            u = _chroma_pass_h(u, tc_ch1, bd)
            v = v_pass_chroma(v, tc_cv2)
            v = _chroma_pass_h(v, tc_ch2, bd)
        if sao_maps is not None:
            xs0 = idx * Ws

            def sao_one(pl, maps, shift):
                l1 = jax.lax.ppermute(pl[:, -1:], axis, fwd)
                r1 = jax.lax.ppermute(pl[:, :1], axis, bwd)
                return _sao_local(pl, l1, r1, maps, xs0 >> shift,
                                  sprm["log2_ctb"], bd, shift)

            y = sao_one(y, sao_maps[0], 0)
            u = sao_one(u, sao_maps[1], 1)
            v = sao_one(v, sao_maps[2], 1)
        return y, u, v

    # stage shard tuples
    import jax
    dev_prms = []
    for k in range(ndev):
        if do_deblock:
            tpl = (shards["tc_v"][k], shards["beta_v"][k],
                   shards["tc_h"][k], shards["beta_h"][k],
                   shards["tc_cv1"][k], shards["tc_ch1"][k],
                   shards["tc_cv2"][k], shards["tc_ch2"][k])
        else:
            tpl = (None,) * 8
        if do_sao:
            sm = []
            for c_idx in range(3):
                p = sprm["planes"][c_idx]
                sh_ = 0 if c_idx == 0 else 1
                cw = sps.ctb_width // ndev
                sl = slice(k * cw, (k + 1) * cw)
                sm.append(dict(
                    typ=p["typ"][:, sl], eo=p["eo"][:, sl],
                    offs=p["offs"][:, sl], lut=p["lut"][:, sl],
                    lo_x=p["lo_x"][:, sl], hi_x=p["hi_x"][:, sl],
                    lo_y=p["lo_y"][:, sl], hi_y=p["hi_y"][:, sl]))
            tpl = tpl + (sm,)
        else:
            tpl = tpl + (None,)
        dev_prms.append(tpl)

    # run via shard_map with per-shard params closed over by stacking
    import jax.numpy as jnp
    y = jnp.asarray(dec.y, jnp.int32)
    u = jnp.asarray(dec.u, jnp.int32)
    v = jnp.asarray(dec.v, jnp.int32)

    def stack(i):
        return jax.tree.map(lambda *xs: jnp.stack(
            [jnp.asarray(x) for x in xs]),
            *[p[i] for p in dev_prms]) if dev_prms[0][i] is not None \
            else None

    stacked = tuple(stack(i) for i in range(9))
    spec_pl = P(None, axis)
    spec_prm = jax.tree.map(lambda _: P(axis), stacked,
                            is_leaf=lambda x: x is None)

    def wrapper(y, u, v, prms):
        prms = jax.tree.map(
            lambda a: a[0] if a is not None else None, prms,
            is_leaf=lambda x: x is None)
        return local_filters(y, u, v, prms)

    fn = jax.jit(jax.shard_map(
        wrapper, mesh=mesh,
        in_specs=(spec_pl, spec_pl, spec_pl, spec_prm),
        out_specs=(spec_pl, spec_pl, spec_pl)))
    oy, ou, ov = fn(y, u, v, stacked)
    return (np.asarray(oy).astype(dt), np.asarray(ou).astype(dt),
            np.asarray(ov).astype(dt))


def _sao_local(pl, l1, r1, maps, xs0, log2_ctb, bd, shift):
    """SAO for one column shard with 1-px halos and global x masks."""
    import jax.numpy as jnp
    Hc, Wc = pl.shape
    pmax = (1 << bd) - 1
    typ = _px_map(maps["typ"], log2_ctb, shift, Hc, Wc)
    lut_px = _px_map(maps["lut"], log2_ctb, shift, Hc, Wc)
    band = pl >> (bd - 5)
    band_off = jnp.take_along_axis(lut_px, band[..., None],
                                   axis=2)[..., 0]
    band_out = jnp.clip(pl + band_off, 0, pmax)
    eo = _px_map(maps["eo"], log2_ctb, shift, Hc, Wc)
    offs = _px_map(maps["offs"], log2_ctb, shift, Hc, Wc)
    ys = jnp.arange(Hc)[:, None]
    xs = xs0 + jnp.arange(Wc)[None, :]
    lo_x = _px_map(maps["lo_x"], log2_ctb, shift, Hc, Wc)
    hi_x = _px_map(maps["hi_x"], log2_ctb, shift, Hc, Wc)
    lo_y = _px_map(maps["lo_y"], log2_ctb, shift, Hc, Wc)
    hi_y = _px_map(maps["hi_y"], log2_ctb, shift, Hc, Wc)
    ext = jnp.concatenate([l1, pl, r1], axis=1)
    ok_any = jnp.zeros_like(pl, dtype=bool)
    cat_val = jnp.zeros_like(pl)
    for cls, (ady, adx, bdy, bdx) in enumerate(_EO_NEIGH):
        a = jnp.roll(jnp.roll(ext, -ady, 0), -adx, 1)[:, 1:-1]
        b = jnp.roll(jnp.roll(ext, -bdy, 0), -bdx, 1)[:, 1:-1]
        okc = ((ys + min(ady, bdy) >= lo_y)
               & (ys + max(ady, bdy) <= hi_y)
               & (xs + min(adx, bdx) >= lo_x)
               & (xs + max(adx, bdx) <= hi_x))
        edge = 2 + jnp.sign(pl - a) + jnp.sign(pl - b)
        cat = jnp.where(edge == 2, 0,
                        jnp.where(edge < 2, edge + 1, edge))
        val = jnp.take_along_axis(offs, cat[..., None], axis=2)[..., 0]
        sel = eo == cls
        ok_any = ok_any | (sel & okc)
        cat_val = jnp.where(sel & okc, val, cat_val)
    edge_out = jnp.where(ok_any, jnp.clip(pl + cat_val, 0, pmax), pl)
    return jnp.where(typ == 1, band_out,
                     jnp.where(typ == 2, edge_out, pl))
