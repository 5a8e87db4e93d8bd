"""VP9 frame reconstruction as one jitted device program.

Replays a recorder.ReconRecorder: inter MC (all tiles in parallel —
no intra-frame dependency), inter residual add, then a lax.scan over
intra dependency levels with every tx-block of a level predicted,
residual-added and scattered in parallel — the same record/replay
strategy as codecs/hevc/recon_tpu.py.

Exact integer math throughout (int32; the reference C uses int):
 * MC mirrors vp9recon.c mc_luma/chroma_unscaled + do_8tap_2d via an
   always-on separable 8-tap pair — phase-0 taps are [..,128,..] and
   (128*p + 64) >> 7 == p, so the pass-through cases need no branch.
 * The inverse transforms are the SAME 1-D kernels as the host path
   (itxfm.py, stack=jnp.stack), so host==device is exact by
   construction.
 * The 15 intra predictors (vp9dsp_template.c) are vectorized over
   blocks; all edge-availability control flow was resolved by the
   recorder into gather index counts.

Compiled programs are cached by frame geometry + padded work-item
counts (powers of two), so a steady-state stream reuses one program.
"""

from __future__ import annotations

import functools

import numpy as np

from . import intra as IP
from . import itxfm as TX
from .inter import FILTERS

INVALID = 1 << 20
SENT16 = -(1 << 15)      # int16 wire sentinel for INVALID

_CLASSES = [(True, 4), (True, 8), (True, 16), (True, 32),
            (False, 4), (False, 8), (False, 16), (False, 32)]
_MC_CLASSES = [(True, 8), (True, 4), (False, 8), (False, 4)]


def _jnp():
    import jax.numpy as jnp
    return jnp


def _pow2(k, lo=1):
    n = lo
    while n < k:
        n *= 2
    return n


# -- residual ------------------------------------------------------------

def _itx_batch(jnp, coef, adst_col, adst_row, n):
    """Batched itxfm (itxfm.py itxfm_add without the add): coef
    [K, n, n] int32, adst_* [K] bool -> residual [K, n, n] int32."""
    K = coef.shape[0]
    bits = TX._BITS[n]

    def mask16(a):
        return ((a + 0x8000) & 0xFFFF) - 0x8000

    # pass 1: transform columns. x[i] spans (k, j) columns.
    x = coef.transpose(1, 0, 2).reshape(n, K * n)
    a_dct = TX._KERNELS[(n, "dct")](x, stack=jnp.stack)
    if n < 32:
        a_adst = TX._KERNELS[(n, "adst")](x, stack=jnp.stack)
        sel = jnp.repeat(adst_col, n)[None, :]
        a = jnp.where(sel, a_adst, a_dct)
    else:
        a = a_dct
    a = mask16(a).reshape(n, K, n).transpose(1, 0, 2)   # [K, n, n]
    # pass 2: transform rows of a (kernel input x[i] = a[:, i])
    x2 = a.transpose(2, 0, 1).reshape(n, K * n)
    r_dct = TX._KERNELS[(n, "dct")](x2, stack=jnp.stack)
    if n < 32:
        r_adst = TX._KERNELS[(n, "adst")](x2, stack=jnp.stack)
        sel = jnp.repeat(adst_row, n)[None, :]
        r = jnp.where(sel, r_adst, r_dct)
    else:
        r = r_dct
    r = mask16(r).reshape(n, K, n).transpose(1, 0, 2)
    return (r + (1 << (bits - 1))) >> bits


# -- inter MC -------------------------------------------------------------

def _mc_tiles(jnp, dpb, pw, ph, t, shift, args):
    """dpb [R, H, W] (or [R, 2, H, W] w/ cpl folded by caller);
    args: dy, dx, mvx0, mvy0, s0, mvx1, mvy1, s1, comp, filt
    -> [K, t, t] int32 predictions."""
    dy, dx, mvx0, mvy0, s0, mvx1, mvy1, s1, comp, filt = args
    mask = (1 << shift) - 1

    def one(mvx, mvy, slot):
        x = dx + (mvx >> shift)
        y = dy + (mvy >> shift)
        fx = (mvx & mask) << (4 - shift)
        fy = (mvy & mask) << (4 - shift)
        rows = jnp.clip(y[:, None] + jnp.arange(-3, t + 4)[None, :],
                        0, ph - 1)
        cols = jnp.clip(x[:, None] + jnp.arange(-3, t + 4)[None, :],
                        0, pw - 1)
        win = dpb[slot[:, None, None], rows[:, :, None],
                  cols[:, None, :]].astype(jnp.int32)
        ftab = jnp.asarray(FILTERS)               # [4][16][8]
        Fx = ftab[filt, fx]                       # [K, 8]
        Fy = ftab[filt, fy]
        acc = jnp.zeros((win.shape[0], t + 7, t), jnp.int32)
        for j in range(8):
            acc = acc + Fx[:, j, None, None] * win[:, :, j:j + t]
        h = jnp.clip((acc + 64) >> 7, 0, 255)
        acc = jnp.zeros((win.shape[0], t, t), jnp.int32)
        for j in range(8):
            acc = acc + Fy[:, j, None, None] * h[:, j:j + t, :]
        return jnp.clip((acc + 64) >> 7, 0, 255)

    p0 = one(mvx0, mvy0, s0)
    p1 = one(mvx1, mvy1, s1)
    return jnp.where(comp[:, None, None] > 0, (p0 + p1 + 1) >> 1, p0)


def _mc_tiles_sliced(jnp, dpb_pad, P, pw, ph, t, shift, args):
    """_mc_tiles on an edge-padded DPB via vmapped dynamic_slice —
    a slice-gather (~3x faster than the per-element gather on TPU).
    Exact: VP9's per-coordinate source clamp == reading the
    edge-replicated padded plane, provided every window stays inside
    the pad (P is computed from the window's actual max |mv| by the
    caller). dpb_pad [R, ph+2P, pw+2P]."""
    import jax
    dy, dx, mvx0, mvy0, s0, mvx1, mvy1, s1, comp, filt = args
    mask = (1 << shift) - 1
    Hp, Wp = ph + 2 * P, pw + 2 * P

    def one(mvx, mvy, slot):
        y = jnp.clip(dy + (mvy >> shift) - 3 + P, 0, Hp - (t + 7))
        x = jnp.clip(dx + (mvx >> shift) - 3 + P, 0, Wp - (t + 7))
        fx = (mvx & mask) << (4 - shift)
        fy = (mvy & mask) << (4 - shift)
        win = jax.vmap(lambda s, yy, xx: jax.lax.dynamic_slice(
            dpb_pad, (s, yy, xx), (1, t + 7, t + 7))[0])(
            slot, y, x).astype(jnp.int32)
        ftab = jnp.asarray(FILTERS)
        Fx = ftab[filt, fx]
        Fy = ftab[filt, fy]
        acc = jnp.zeros((win.shape[0], t + 7, t), jnp.int32)
        for j in range(8):
            acc = acc + Fx[:, j, None, None] * win[:, :, j:j + t]
        h = jnp.clip((acc + 64) >> 7, 0, 255)
        acc = jnp.zeros((win.shape[0], t, t), jnp.int32)
        for j in range(8):
            acc = acc + Fy[:, j, None, None] * h[:, j:j + t, :]
        return jnp.clip((acc + 64) >> 7, 0, 255)

    p0 = one(mvx0, mvy0, s0)
    p1 = one(mvx1, mvy1, s1)
    return jnp.where(comp[:, None, None] > 0, (p0 + p1 + 1) >> 1, p0)


# -- intra predictors ------------------------------------------------------

def _interleave(jnp, a, b):
    """[K, m], [K, m] -> [K, 2m] with a at even, b at odd indices."""
    return jnp.stack([a, b], axis=2).reshape(a.shape[0], -1)


def _gather(jnp, v, idx):
    """v [K, m], idx static [n, n] int -> [K, n, n]."""
    return v[:, jnp.asarray(idx)]


def _predict_all(jnp, left, top, tl, n):
    """All 15 VP9 predictors, vectorized over K blocks.
    left [K, n] (bottom-up for every mode except HU, whose caller
    gathered it top-down), top [K, 2n], tl [K] -> [15, K, n, n]."""
    K = left.shape[0]
    ii = np.arange(n)
    t, lf = top, left
    lrev = left[:, ::-1]                      # left in row order
    out = [None] * 15
    full = (K, n, n)
    out[IP.VERT] = jnp.broadcast_to(t[:, None, :n], full)
    out[IP.HOR] = jnp.broadcast_to(lrev[:, :, None], full)
    dc = (jnp.sum(lf[:, :n], 1) + jnp.sum(t[:, :n], 1) + n) >> \
        int(n).bit_length()
    out[IP.DC] = jnp.broadcast_to(dc[:, None, None], full)
    ldc = (jnp.sum(lf[:, :n], 1) + (n >> 1)) >> (int(n).bit_length()
                                                 - 1)
    out[IP.LEFT_DC] = jnp.broadcast_to(ldc[:, None, None], full)
    tdc = (jnp.sum(t[:, :n], 1) + (n >> 1)) >> (int(n).bit_length()
                                                - 1)
    out[IP.TOP_DC] = jnp.broadcast_to(tdc[:, None, None], full)
    for m, c in ((IP.DC_128, 128), (IP.DC_127, 127), (IP.DC_129, 129)):
        out[m] = jnp.full(full, c, jnp.int32)
    out[IP.TM] = jnp.clip(
        t[:, None, :n] + (lrev - tl[:, None])[:, :, None], 0, 255)

    # DDL
    if n == 4:
        a = t[:, :8]
        vals = (a[:, :6] + 2 * a[:, 1:7] + a[:, 2:8] + 2) >> 2
        v2 = jnp.concatenate([vals, a[:, 7:8]], 1)
        idx = np.minimum(ii[:, None] + ii[None, :], 6)
    else:
        t3 = jnp.concatenate([t[:, 2:n], t[:, n - 1:n]], 1)
        v = (t[:, :n - 1] + 2 * t[:, 1:n] + t3 + 2) >> 2
        v2 = jnp.concatenate([v, t[:, n - 1:n]], 1)
        idx = np.minimum(ii[:, None] + ii[None, :], n - 1)
    out[IP.DDL] = _gather(jnp, v2, idx)

    # DDR: v = [left-smoothed (n-2), 3 corner terms, top-smoothed]
    vl_ = (lf[:, :n - 2] + 2 * lf[:, 1:n - 1] + lf[:, 2:n] + 2) >> 2
    c0 = (lf[:, n - 2] + 2 * lf[:, n - 1] + tl + 2) >> 2
    c1 = (lf[:, n - 1] + 2 * tl + t[:, 0] + 2) >> 2
    c2 = (tl + 2 * t[:, 0] + t[:, 1] + 2) >> 2
    vt_ = (t[:, :n - 2] + 2 * t[:, 1:n - 1] + t[:, 2:n] + 2) >> 2
    v = jnp.concatenate([vl_, c0[:, None], c1[:, None], c2[:, None],
                         vt_], 1)
    idx = (n - 1) - ii[:, None] + ii[None, :]
    out[IP.DDR] = _gather(jnp, v, idx)

    # VR
    h = n // 2
    vo_h = (lf[:, 3:n - 1:2] + 2 * lf[:, 2:n - 2:2]
            + lf[:, 1:n - 4 + 1:2] + 2) >> 2
    ve_h = (lf[:, 4:n - 1 + 1:2] + 2 * lf[:, 3:n - 1:2]
            + lf[:, 2:n - 2:2] + 2) >> 2
    vo_m = (lf[:, n - 1] + 2 * lf[:, n - 2] + lf[:, n - 3] + 2) >> 2
    ve_m = (tl + 2 * lf[:, n - 1] + lf[:, n - 2] + 2) >> 2
    ve_c = (tl + t[:, 0] + 1) >> 1
    vo_c = (lf[:, n - 1] + 2 * tl + t[:, 0] + 2) >> 2
    ve_t = (t[:, :n - 1] + t[:, 1:n] + 1) >> 1
    pm1 = jnp.concatenate([tl[:, None], t[:, :n - 2]], 1)
    vo_t = (pm1 + 2 * t[:, :n - 1] + t[:, 1:n] + 2) >> 2
    ve = jnp.concatenate([ve_h, ve_m[:, None], ve_c[:, None], ve_t], 1)
    vo = jnp.concatenate([vo_h, vo_m[:, None], vo_c[:, None], vo_t], 1)
    jj = np.arange(h)
    idx = (h - 1) - jj[:, None] + ii[None, :]     # [h, n]
    rows_e = _gather(jnp, ve, idx)
    rows_o = _gather(jnp, vo, idx)
    out[IP.VR] = jnp.stack([rows_e, rows_o], 2).reshape(K, n, n)

    # HD: v = [interleaved left pairs (2n-4), 4 corners, top (n-2)]
    e_h = (lf[:, 1:n - 1] + lf[:, :n - 2] + 1) >> 1
    o_h = (lf[:, 2:n] + 2 * lf[:, 1:n - 1] + lf[:, :n - 2] + 2) >> 2
    head = _interleave(jnp, e_h, o_h)
    c0 = (lf[:, n - 1] + lf[:, n - 2] + 1) >> 1
    c1 = (tl + 2 * lf[:, n - 1] + lf[:, n - 2] + 2) >> 2
    c2 = (tl + lf[:, n - 1] + 1) >> 1
    c3 = (t[:, 0] + 2 * tl + lf[:, n - 1] + 2) >> 2
    tail = (pm1[:, :n - 2] + 2 * t[:, :n - 2] + t[:, 1:n - 1] + 2) >> 2
    v = jnp.concatenate([head, c0[:, None], c1[:, None], c2[:, None],
                         c3[:, None], tail], 1)
    idx = (2 * n - 2) - 2 * ii[:, None] + ii[None, :]
    out[IP.HD] = _gather(jnp, v, idx)

    # VL
    if n == 4:
        a = t[:, :7]
        E = (a[:, :5] + a[:, 1:6] + 1) >> 1
        O = (a[:, :5] + 2 * a[:, 1:6] + a[:, 2:7] + 2) >> 2
        rows_e = _gather(jnp, E, np.arange(2)[:, None]
                         + np.arange(4)[None, :])
        rows_o = _gather(jnp, O, np.arange(2)[:, None]
                         + np.arange(4)[None, :])
        out[IP.VL] = jnp.stack([rows_e, rows_o], 2).reshape(K, 4, 4)
    else:
        t3 = jnp.concatenate([t[:, 2:n], t[:, n - 1:n]], 1)
        ve = (t[:, :n - 1] + t[:, 1:n] + 1) >> 1
        vo = (t[:, :n - 1] + 2 * t[:, 1:n] + t3 + 2) >> 2
        ve2 = jnp.concatenate([ve, t[:, n - 1:n]], 1)
        vo2 = jnp.concatenate([vo, t[:, n - 1:n]], 1)
        jj = np.arange(n // 2)
        idx = np.minimum(jj[:, None] + ii[None, :], n - 1)
        rows_e = _gather(jnp, ve2, idx)
        rows_o = _gather(jnp, vo2, idx)
        out[IP.VL] = jnp.stack([rows_e, rows_o], 2).reshape(K, n, n)

    # HU (left gathered top-down by the caller for this mode)
    if n == 4:
        l0, l1, l2, l3 = (lf[:, 0], lf[:, 1], lf[:, 2], lf[:, 3])
        q = jnp.stack([(l0 + l1 + 1) >> 1, (l0 + 2 * l1 + l2 + 2) >> 2,
                       (l1 + l2 + 1) >> 1, (l1 + 2 * l2 + l3 + 2) >> 2,
                       (l2 + l3 + 1) >> 1, (l2 + 3 * l3 + 2) >> 2,
                       l3], 1)
        idx = np.minimum(2 * ii[:, None] + ii[None, :], 6)
        out[IP.HU] = _gather(jnp, q, idx)
    else:
        lf3 = jnp.concatenate([lf[:, 2:n], lf[:, n - 1:n]], 1)
        e_h = (lf[:, :n - 1] + lf[:, 1:n] + 1) >> 1
        o_h = (lf[:, :n - 1] + 2 * lf[:, 1:n] + lf3 + 2) >> 2
        v = _interleave(jnp, e_h, o_h)           # [K, 2n-2]
        v2 = jnp.concatenate([v, lf[:, n - 1:n]], 1)
        idx = np.minimum(2 * ii[:, None] + ii[None, :], 2 * n - 2)
        out[IP.HU] = _gather(jnp, v2, idx)

    return jnp.stack(out)


def _intra_level(jnp, P, pw, ph, n, args, chroma):
    """One level's blocks for one class against plane(s) P
    (luma: [H, W]; chroma: [2, H, W] indexed by cpl) -> new P."""
    (px, py, mode, m_top, m_left, tl_sel, cpl, acol, arow, coef) = args
    K = px.shape[0]
    ii = jnp.arange(n)

    def rd(r, c):
        r = jnp.clip(r, 0, ph - 1)
        c = jnp.clip(c, 0, pw - 1)
        if chroma:
            return P[cpl[:, None], r, c] if r.ndim == 2 else \
                P[cpl, r, c]
        return P[r, c]

    i2 = jnp.arange(2 * n)
    t_c = px[:, None] + jnp.minimum(i2[None, :], m_top[:, None] - 1)
    top = jnp.where(m_top[:, None] > 0,
                    rd((py - 1)[:, None], t_c), 127)
    inv = (mode == IP.HU)[:, None]
    l_off = jnp.where(
        inv, jnp.minimum(ii[None, :], m_left[:, None] - 1),
        jnp.minimum(n - 1 - ii[None, :], m_left[:, None] - 1))
    left = jnp.where(m_left[:, None] > 0,
                     rd(py[:, None] + l_off, (px - 1)[:, None]), 129)
    tlp = rd(py - 1, px - 1)
    tl = jnp.where(tl_sel == 2, tlp, jnp.where(tl_sel == 1, 129, 127))

    preds = _predict_all(jnp, left, top, tl, n)
    pred = jnp.take_along_axis(
        preds, mode[None, :, None, None], 0)[0]
    pred = jnp.clip(pred, 0, 255)
    res = _itx_batch(jnp, coef, acol, arow, n)
    vals = jnp.clip(pred + res, 0, 255)
    rr = py[:, None] + ii[None, :]
    cc = px[:, None] + ii[None, :]
    if chroma:
        return P.at[cpl[:, None, None], rr[:, :, None],
                    cc[:, None, :]].set(vals, mode="drop")
    return P.at[rr[:, :, None], cc[:, None, :]].set(vals, mode="drop")


# -- program ---------------------------------------------------------------

def _recon_frame(key, dpb_y, dpb_c, mc_args, tu_args, intra_args):
    """Traceable one-frame reconstruction body (shared by the
    per-frame program below and the windowed decoder in
    models/vp9_tpu.py)."""
    import jax
    jnp = _jnp()
    if len(key) == 11:                  # legacy key (no MC pad)
        key = key + (None,)
    (H, W, Hc, Wc, Rn, nlev, dw, dh, mc_shapes, tu_shapes,
     intra_shapes, mc_pad) = key
    dwc, dhc = (dw + 1) // 2, (dh + 1) // 2

    def program(dpb_y, dpb_c, mc_args, tu_args, intra_args):
        # widen int16 wire-format args (native path) to int32; map the
        # int16 pad sentinel back to INVALID on position fields
        def _w(x):
            return x.astype(jnp.int32) if x.dtype == jnp.int16 else x

        def _wi(x):
            if x.dtype == jnp.int16:
                x = x.astype(jnp.int32)
                return jnp.where(x == SENT16, INVALID, x)
            return x

        mc_args = {k: (_wi(v[0]),) + tuple(_w(x) for x in v[1:])
                   for k, v in mc_args.items()}
        tu_args = {k: (_wi(v[0]), _wi(v[1]), _w(v[2]), _w(v[3]))
                   for k, v in tu_args.items()}
        intra_args = {k: (_wi(v[0]), _wi(v[1]))
                      + tuple(_w(x) for x in v[2:])
                      for k, v in intra_args.items()}
        Y = jnp.zeros((H, W), jnp.int32)
        C = jnp.zeros((2, Hc, Wc), jnp.int32)

        if mc_pad:
            # slice-gather MC: edge-pad the display-cropped DPB so
            # every tile window is one in-bounds dynamic_slice
            P = mc_pad
            Pc = P // 2 + 8
            ypad = jnp.pad(dpb_y[:, :dh, :dw],
                           ((0, 0), (P, P), (P, P)), mode="edge")
            cpad = jnp.pad(dpb_c[:, :, :dhc, :dwc],
                           ((0, 0), (0, 0), (Pc, Pc), (Pc, Pc)),
                           mode="edge")
            cpadf = cpad.reshape(Rn * 2, dhc + 2 * Pc, dwc + 2 * Pc)

        # stage A: inter MC
        for (is_luma, t), K in mc_shapes:
            if K == 0:
                continue
            a = mc_args[(is_luma, t)]
            dy, dx, cpl = a[0], a[1], a[-1]
            if mc_pad:
                if is_luma:
                    pred = _mc_tiles_sliced(jnp, ypad, P, dw, dh, t,
                                            3, a[:-1])
                else:
                    aa = list(a[:-1])
                    aa[4] = a[4] * 2 + cpl
                    aa[7] = a[7] * 2 + cpl
                    pred = _mc_tiles_sliced(jnp, cpadf, Pc, dwc, dhc,
                                            t, 4, tuple(aa))
            elif is_luma:
                pred = _mc_tiles(jnp, dpb_y, dw, dh, t, 3, a[:-1])
            else:
                dpbf = dpb_c.reshape(Rn * 2, Hc, Wc)
                aa = list(a[:-1])
                # fold cpl into the slot index
                aa[4] = a[4] * 2 + cpl
                aa[7] = a[7] * 2 + cpl
                pred = _mc_tiles(jnp, dpbf, (dw + 1) // 2,
                                 (dh + 1) // 2, t, 4, tuple(aa))
            rr = dy[:, None] + jnp.arange(t)[None, :]
            cc = dx[:, None] + jnp.arange(t)[None, :]
            if is_luma:
                Y = Y.at[rr[:, :, None], cc[:, None, :]].set(
                    pred, mode="drop")
            else:
                C = C.at[cpl[:, None, None], rr[:, :, None],
                         cc[:, None, :]].set(pred, mode="drop")

        # stage B: inter residual
        for (is_luma, n), K in tu_shapes:
            if K == 0:
                continue
            px, py, coef, cpl = tu_args[(is_luma, n)]
            res = _itx_batch(jnp, coef, jnp.zeros(K, bool),
                             jnp.zeros(K, bool), n)
            rr = py[:, None] + jnp.arange(n)[None, :]
            cc = px[:, None] + jnp.arange(n)[None, :]
            if is_luma:
                cur = Y[jnp.clip(rr, 0, H - 1)[:, :, None],
                        jnp.clip(cc, 0, W - 1)[:, None, :]]
                Y = Y.at[rr[:, :, None], cc[:, None, :]].set(
                    jnp.clip(cur + res, 0, 255), mode="drop")
            else:
                cur = C[cpl[:, None, None],
                        jnp.clip(rr, 0, Hc - 1)[:, :, None],
                        jnp.clip(cc, 0, Wc - 1)[:, None, :]]
                C = C.at[cpl[:, None, None], rr[:, :, None],
                         cc[:, None, :]].set(
                    jnp.clip(cur + res, 0, 255), mode="drop")

        # stage C: intra wavefront over dependency levels. Args are
        # FLAT level-sorted arrays + per-level offsets (a dense
        # (nlev, kmax) layout costs nlev*kmax slots — 19 GB on a 1080p
        # keyframe whose dependency chains run ~1024 levels deep);
        # each scan step slices its level's window and masks the tail.
        if nlev:
            def step(carry, lv):
                Y, C = carry
                for (is_luma, n), shp in intra_shapes:
                    if not shp or shp[1] == 0:
                        continue
                    KT, kmax = shp
                    a = intra_args[(is_luma, n)]
                    offs = a[-1]
                    off = offs[lv]
                    cnt = offs[lv + 1] - off

                    def sl(arr):
                        return jax.lax.dynamic_slice(
                            arr, (off,) + (0,) * (arr.ndim - 1),
                            (kmax,) + arr.shape[1:])

                    valid = jnp.arange(kmax) < cnt
                    px = jnp.where(valid, sl(a[0]), INVALID)
                    py = jnp.where(valid, sl(a[1]), INVALID)
                    args2 = (px, py) + tuple(sl(x) for x in a[2:-1])
                    if is_luma:
                        Y = _intra_level(jnp, Y, W, H, n, args2, False)
                    else:
                        C = _intra_level(jnp, C, Wc, Hc, n, args2, True)
                return (Y, C), 0

            (Y, C), _ = jax.lax.scan(step, (Y, C), jnp.arange(nlev))
        return (Y.astype(jnp.uint8), C[0].astype(jnp.uint8),
                C[1].astype(jnp.uint8))

    return program(dpb_y, dpb_c, mc_args, tu_args, intra_args)


@functools.lru_cache(maxsize=64)
def _build_program(key):
    import jax
    return jax.jit(functools.partial(_recon_frame, key))


def prepare(fs, rec):
    """Build the device program + argument tensors for one frame;
    returns (fn, args) so callers (bench replay) can re-execute the
    device stage without re-marshaling the record."""
    H, W = fs.y.shape
    Hc, Wc = fs.u.shape
    dw, dh = fs.h.width, fs.h.height

    # DPB (dedupe shared planes)
    slots, slot_of = [], {}
    for r in fs.refs:
        if r is not None and id(r[0]) not in slot_of:
            slot_of[id(r[0])] = len(slots)
            slots.append(r)
    Rn = max(1, len(slots))
    dpb_y = np.zeros((Rn, H, W), np.uint8)
    dpb_c = np.zeros((Rn, 2, Hc, Wc), np.uint8)
    for i, (ry, ru, rv, _w, _h) in enumerate(slots):
        dpb_y[i, :ry.shape[0], :ry.shape[1]] = ry
        dpb_c[i, 0, :ru.shape[0], :ru.shape[1]] = ru
        dpb_c[i, 1, :rv.shape[0], :rv.shape[1]] = rv

    def smap(i):
        return slot_of[id(fs.refs[i][0])] if fs.refs and \
            fs.refs[i] is not None else 0

    mc_args, mc_shapes = {}, []
    for cls in _MC_CLASSES:
        lst = rec.mc.get(cls, [])
        K = _pow2(len(lst)) if lst else 0
        arr = np.zeros((11, max(K, 1)), np.int32)
        arr[0] = INVALID                       # dy
        for i, (pl, dy, dx, mx0, my0, r0, mx1, my1, r1, comp,
                filt) in enumerate(lst):
            arr[:, i] = (dy, dx, mx0, my0, smap(r0), mx1, my1,
                         smap(r1), comp, filt, max(pl - 1, 0))
        mc_args[cls] = tuple(arr)
        mc_shapes.append((cls, K))

    tu_args, tu_shapes = {}, []
    for cls in _CLASSES:
        lst = rec.tus.get(cls, [])
        K = _pow2(len(lst)) if lst else 0
        n = cls[1]
        px = np.full(max(K, 1), INVALID, np.int32)
        py = np.full(max(K, 1), INVALID, np.int32)
        coef = np.zeros((max(K, 1), n, n), np.int32)
        cpl = np.zeros(max(K, 1), np.int32)
        for i, (x, y, cf, pl) in enumerate(lst):
            px[i], py[i], coef[i], cpl[i] = x, y, cf, pl
        tu_args[cls] = (px, py, coef, cpl)
        tu_shapes.append((cls, K))

    nlev = _pow2(rec.max_level, lo=4) if rec.max_level else 0
    intra_args, intra_shapes = {}, []
    nl = max(nlev, 1)
    for cls in _CLASSES:
        lst = rec.intra.get(cls, [])
        per = {}
        kmax0 = 0
        for it in lst:
            per.setdefault(it[0] - 1, []).append(it)
            kmax0 = max(kmax0, len(per[it[0] - 1]))
        kmax = _pow2(kmax0, lo=2) if lst else 0
        KT = _pow2(len(lst) + kmax) if lst else 0
        n = cls[1]
        kt = max(KT, 1)
        px = np.full(kt, INVALID, np.int32)
        py = np.full(kt, INVALID, np.int32)
        mode = np.zeros(kt, np.int32)
        m_top = np.zeros(kt, np.int32)
        m_left = np.zeros(kt, np.int32)
        tl_sel = np.zeros(kt, np.int32)
        cpl = np.zeros(kt, np.int32)
        acol = np.zeros(kt, bool)
        arow = np.zeros(kt, bool)
        coef = np.zeros((kt, n, n), np.int32)
        offsets = np.zeros(nl + 1, np.int32)
        j = 0
        for lv in range(nl):
            offsets[lv] = j
            for (_l, x0, y0, m, mt, ml, ts, txtp, cf,
                 pl) in per.get(lv, ()):
                px[j], py[j] = x0, y0
                mode[j], m_top[j] = m, mt
                m_left[j], tl_sel[j] = ml, ts
                cpl[j] = pl
                ka, kb = TX._TXTP[txtp]
                acol[j] = ka == "adst"
                arow[j] = kb == "adst"
                coef[j] = cf
                j += 1
        offsets[nl] = j
        intra_args[cls] = (px, py, mode, m_top, m_left, tl_sel, cpl,
                           acol, arow, coef, offsets)
        intra_shapes.append((cls, (KT, kmax) if kmax else 0))

    key = (H, W, Hc, Wc, Rn, nlev, dw, dh, tuple(mc_shapes),
           tuple(tu_shapes), tuple(intra_shapes))
    fn = _build_program(key)
    return fn, (dpb_y, dpb_c, mc_args, tu_args, intra_args)


def _dpb_arrays(fs):
    """DPB planes + slot map for the frame's (up to 3) refs."""
    H, W = fs.y.shape
    Hc, Wc = fs.u.shape
    slots, slot_of = [], {}
    for r in fs.refs:
        if r is not None and id(r[0]) not in slot_of:
            slot_of[id(r[0])] = len(slots)
            slots.append(r)
    Rn = max(1, len(slots))
    dpb_y = np.zeros((Rn, H, W), np.uint8)
    dpb_c = np.zeros((Rn, 2, Hc, Wc), np.uint8)
    for i, (ry, ru, rv, _w, _h) in enumerate(slots):
        dpb_y[i, :ry.shape[0], :ry.shape[1]] = ry
        dpb_c[i, 0, :ru.shape[0], :ru.shape[1]] = ru
        dpb_c[i, 1, :rv.shape[0], :rv.shape[1]] = rv
    smap = np.zeros(3, np.int32)
    for i in range(3):
        if fs.refs and i < len(fs.refs) and fs.refs[i] is not None:
            smap[i] = slot_of[id(fs.refs[i][0])]
    return dpb_y, dpb_c, smap


def build_frame_args(rec, smap, shapes=None):
    """Padded device-arg tensors from a NativeRecord.

    smap: int32 [3] mapping record ref ids (0..2) to DPB slot indices.
    shapes: optional (mc_shapes, tu_shapes, intra_shapes, nlev) to pad
    to — used by the windowed decoder so every frame of a window
    shares ONE compiled program. Returns (mc_args, tu_args,
    intra_args, (mc_shapes, tu_shapes, intra_shapes, nlev))."""
    from .itxfm import _TXTP as TXTP_TAB
    want_mc = dict(shapes[0]) if shapes else None
    want_tu = dict(shapes[1]) if shapes else None
    want_in = dict(shapes[2]) if shapes else None

    mc_args, mc_shapes = {}, []
    for cls in _MC_CLASSES:
        raw = rec.mc_arr.get(cls)
        k0 = 0 if raw is None else len(raw)
        K = want_mc[cls] if want_mc else (_pow2(k0) if k0 else 0)
        # int16 wire format (every field fits; the device widens and
        # maps the -32768 pad sentinel back to INVALID) — halves the
        # per-frame h2d bytes, which ride a ~30-45 MB/s tunnel
        arr = np.zeros((11, max(K, 1)), np.int16)
        arr[0] = SENT16                        # dy pad sentinel
        if k0:
            r = raw.T
            arr[0, :k0] = r[1]                 # dy
            arr[1, :k0] = r[2]                 # dx
            arr[2, :k0] = r[3]                 # mx0
            arr[3, :k0] = r[4]                 # my0
            arr[4, :k0] = smap[r[5]]
            arr[5, :k0] = r[6]                 # mx1
            arr[6, :k0] = r[7]                 # my1
            arr[7, :k0] = smap[r[8]]
            arr[8, :k0] = r[9]                 # comp
            arr[9, :k0] = r[10]                # filt
            arr[10, :k0] = np.maximum(r[0] - 1, 0)   # cpl
        mc_args[cls] = tuple(arr)
        mc_shapes.append((cls, K))

    tu_args, tu_shapes = {}, []
    for cls in _CLASSES:
        meta, coefs = rec.tu_arr.get(cls, (None, None))
        k0 = 0 if meta is None else len(meta)
        K = want_tu[cls] if want_tu else (_pow2(k0) if k0 else 0)
        n = cls[1]
        px = np.full(max(K, 1), SENT16, np.int16)
        py = np.full(max(K, 1), SENT16, np.int16)
        coef = np.zeros((max(K, 1), n, n), np.int16)
        cpl = np.zeros(max(K, 1), np.int16)
        if k0:
            px[:k0] = meta[:, 0]
            py[:k0] = meta[:, 1]
            cpl[:k0] = meta[:, 2]
            coef[:k0] = coefs.reshape(k0, n, n)
        tu_args[cls] = (px, py, coef, cpl)
        tu_shapes.append((cls, K))

    nlev = shapes[3] if shapes else (
        _pow2(rec.max_level, lo=4) if rec.max_level else 0)
    txtp_adst_col = np.zeros(4, bool)
    txtp_adst_row = np.zeros(4, bool)
    for t in range(4):
        ka, kb = TXTP_TAB[t]
        txtp_adst_col[t] = ka == "adst"
        txtp_adst_row[t] = kb == "adst"
    intra_args, intra_shapes = {}, []
    nl = max(nlev, 1)
    for cls in _CLASSES:
        meta, coefs = rec.in_arr.get(cls, (None, None))
        k0 = 0 if meta is None else len(meta)
        n = cls[1]
        if k0:
            lv = meta[:, 0] - 1
            order = np.argsort(lv, kind="stable")
            lv_s = lv[order]
            counts = np.bincount(lv_s, minlength=nl)
            kmax0 = int(counts.max())
        else:
            kmax0 = 0
        if want_in:
            KT, kmax = want_in[cls] if want_in[cls] else (0, 0)
        else:
            kmax = _pow2(kmax0, lo=2) if k0 else 0
            KT = _pow2(k0 + kmax) if k0 else 0
        # flat level-sorted layout + per-level offsets
        kt = max(KT, 1)
        px = np.full(kt, SENT16, np.int16)
        py = np.full(kt, SENT16, np.int16)
        mode = np.zeros(kt, np.int16)
        m_top = np.zeros(kt, np.int16)
        m_left = np.zeros(kt, np.int16)
        tl_sel = np.zeros(kt, np.int16)
        cpl = np.zeros(kt, np.int16)
        acol = np.zeros(kt, bool)
        arow = np.zeros(kt, bool)
        coef = np.zeros((kt, n, n), np.int16)
        offsets = np.zeros(nl + 1, np.int32)
        if k0:
            ms = meta[order]
            px[:k0] = ms[:, 1]
            py[:k0] = ms[:, 2]
            mode[:k0] = ms[:, 3]
            m_top[:k0] = ms[:, 4]
            m_left[:k0] = ms[:, 5]
            tl_sel[:k0] = ms[:, 6]
            cpl[:k0] = ms[:, 8]
            acol[:k0] = txtp_adst_col[ms[:, 7]]
            arow[:k0] = txtp_adst_row[ms[:, 7]]
            coef[:k0] = coefs[order].reshape(k0, n, n)
            offsets[1:] = np.cumsum(counts)
        intra_args[cls] = (px, py, mode, m_top, m_left, tl_sel, cpl,
                           acol, arow, coef, offsets)
        intra_shapes.append((cls, (KT, kmax) if kmax else 0))

    return (mc_args, tu_args, intra_args,
            (tuple(mc_shapes), tuple(tu_shapes), tuple(intra_shapes),
             nlev))


def prepare_native(fs, rec):
    """prepare() from a native_parse.NativeRecord (flat arrays,
    numpy-vectorized — no per-record Python)."""
    H, W = fs.y.shape
    Hc, Wc = fs.u.shape
    dw, dh = fs.h.width, fs.h.height
    dpb_y, dpb_c, smap = _dpb_arrays(fs)
    Rn = dpb_y.shape[0]
    mc_args, tu_args, intra_args, (mc_shapes, tu_shapes,
                                   intra_shapes, nlev) = \
        build_frame_args(rec, smap)
    key = (H, W, Hc, Wc, Rn, nlev, dw, dh, mc_shapes, tu_shapes,
           intra_shapes)
    fn = _build_program(key)
    return fn, (dpb_y, dpb_c, mc_args, tu_args, intra_args)


def reconstruct(fs, rec) -> None:
    """Fill fs.y/u/v (pre-loop-filter) from the recorded work."""
    from .native_parse import NativeRecord
    if isinstance(rec, NativeRecord):
        fn, args = prepare_native(fs, rec)
    else:
        fn, args = prepare(fs, rec)
    y, u, v = fn(*args)
    fs.y[:] = np.asarray(y)
    fs.u[:] = np.asarray(u)
    fs.v[:] = np.asarray(v)
