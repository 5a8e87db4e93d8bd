"""HEVC reconstruction on the TPU — device path of the host-entropy /
device-transform split (replaces the per-CTU pixel loops of
libavcodec/hevc/hevcdec.c hls_coding_unit: intra pred_template.c,
inter dsp_template.c put_hevc_qpel/epel, IDCT dsp_template.c).

Byte-exact with the inline host path in ctu.py/recon.py/inter.py.
Architecture (one jitted program per frame geometry):

  1. residual: every TU inverse-transformed in parallel, batched by
     size class (4/8/16/32, DCT-II / DST-VII / transform-skip) as int32
     matmuls, scattered into full residual planes.
  2. inter: per (DPB slot, x-phase) the horizontally filtered plane is
     computed ONCE as a full-plane 8-tap (luma) / 4-tap (chroma)
     convolution; each output pixel then needs 8 (luma) / 4 (chroma)
     row-gathers combined with its y-phase filter — MV/ref/pred-flag
     fields live at 4x4 granularity exactly like the reference's
     tab_mvf.  Uni/bi combination uses the spec's 14-bit intermediate
     scale.  The prediction is written where the pf grid is inter and
     the residual is added immediately (those pixels have no intra
     dependences).
  3. intra: lax.scan over *measured dependency levels* (recorder.py):
     every intra TU of a level is predicted in parallel — reference
     sample cascade (pred_template.c "Infer the unavailable"),
     [1 2 1] / strong-bilinear smoothing, and the 33 angular modes as
     two-tap gathers with precomputed (index, weight) tables over the
     combined left+top reference vector; planar/DC computed closed-form
     and selected by mode.  Residual is added in the same step.

The in-loop filters (deblock + SAO) then run via filter_tpu.py, so a
P/B frame touches the host only for CABAC parse and packing.
"""

from __future__ import annotations

import functools

import numpy as np

from . import recorder as R
from . import tables as T
from .inter import CHROMA_FILTERS, LUMA_FILTERS

INVALID = 1 << 20          # scatter-drop sentinel for padded records
PAD_L, PAD_C = 8, 4         # MV clamp ranges (fully-outside-equivalent)


# ---------------------------------------------------------------------------
# angular prediction tables: pred[p] = ((32-f)*C[i0] + f*C[i1] + 16)>>5
# over the combined reference vector C = [left[0..2n], top[0..2n]]
# (index 0 = corner; top[0] duplicates it).


@functools.lru_cache(maxsize=None)
def _angular_tables(n: int):
    idx = np.zeros((33, n * n, 2), np.int32)
    wgt = np.zeros((33, n * n, 2), np.int32)
    for mode in range(2, 35):
        angle = int(T.INTRA_PRED_ANGLE[mode - 2])
        vertical = mode >= 18
        last = (n * angle) >> 5

        def combined(p):
            """ref[OFF + p] -> combined index (derivation mirrors
            recon.pred_intra's ref[] fill)."""
            if p >= 0:
                return (2 * n + 2 + p) if vertical else (1 + p)
            if p == -1:
                return 0
            xk = p + 1                      # filled as ref[OFF+xk-1]
            inv = int(T.INV_ANGLE[mode - 11])
            i2 = -1 + ((xk * inv + 128) >> 8)
            if i2 < 0:
                return 0
            return (1 + i2) if vertical else (2 * n + 2 + i2)

        for a in range(n):                 # row (vertical) / col (horiz)
            off = ((a + 1) * angle) >> 5
            fact = ((a + 1) * angle) & 31
            for b in range(n):
                p = (a * n + b) if vertical else (b * n + a)
                idx[mode - 2, p, 0] = combined(off + b)
                idx[mode - 2, p, 1] = combined(off + b + 1)
                wgt[mode - 2, p, 0] = 32 - fact
                wgt[mode - 2, p, 1] = fact
    return idx, wgt


# ---------------------------------------------------------------------------
# device helpers (imported lazily so the module imports without jax)


def _jnp():
    import jax.numpy as jnp
    return jnp


def _ref_cascade(jnp, Lr, Tr, corner, avail, bd):
    """Vectorized build_refs substitution cascade.

    Lr/Tr: (K, 2n) raw side samples (rows y..y+2n-1 / cols x..x+2n-1,
    gathered with index clamping so the beyond-picture replication of
    build_refs comes for free), corner (K,), avail (K, 5) bool in
    (l, bl, t, tr, tl) order.  Returns L, T of shape (K, 2n+1) exactly
    matching recon.build_refs output."""
    K, twon = Lr.shape
    n = twon // 2
    dcf = 1 << (bd - 1)
    l, bl, t, tr, tl = (avail[:, i] for i in range(5))

    L = jnp.concatenate([jnp.where(tl, corner, 0)[:, None],
                         jnp.where(l[:, None], Lr[:, :n], 0),
                         jnp.where(bl[:, None], Lr[:, n:], 0)], axis=1)
    Tt = jnp.concatenate([jnp.where(tl, corner, 0)[:, None],
                          jnp.where(t[:, None], Tr[:, :n], 0),
                          jnp.where(tr[:, None], Tr[:, n:], 0)], axis=1)

    caseA = ~bl & l
    caseB = ~bl & ~l & tl
    caseC = ~bl & ~l & ~tl & t
    caseD = ~bl & ~l & ~tl & ~t & tr
    caseE = ~bl & ~l & ~tl & ~t & ~tr

    # case D first: T[1:n+1] = T[n+1]
    fillD = Tt[:, n + 1][:, None]
    Tt = jnp.where(caseD[:, None],
                   jnp.concatenate([Tt[:, :1],
                                    jnp.broadcast_to(fillD, (K, n)),
                                    Tt[:, n + 1:]], axis=1), Tt)
    # L[0] for cases C (top[1]) and D (top[n+1])
    L0 = jnp.where(caseC, Tt[:, 1],
                   jnp.where(caseD, Tt[:, n + 1], L[:, 0]))
    L = jnp.concatenate([L0[:, None], L[:, 1:]], axis=1)
    # L[1:] = L[0] for B/C/D; L[n+1:] = L[n] for A
    bcd = (caseB | caseC | caseD)[:, None]
    L = jnp.where(bcd,
                  jnp.concatenate(
                      [L[:, :1],
                       jnp.broadcast_to(L[:, :1], (K, 2 * n))], axis=1),
                  L)
    L = jnp.where(caseA[:, None],
                  jnp.concatenate(
                      [L[:, :n + 1],
                       jnp.broadcast_to(L[:, n][:, None], (K, n))],
                      axis=1), L)
    # case E: everything dc_fill
    L = jnp.where(caseE[:, None], jnp.full_like(L, dcf), L)
    Tt = jnp.where(caseE[:, None], jnp.full_like(Tt, dcf), Tt)

    l2 = l | caseB | caseC | caseD | caseE
    tl2 = tl | caseC | caseD | caseE
    t2 = t | caseD | caseE
    tr2 = tr | caseE

    # if not l: L[1:n+1] = L[n+1]
    L = jnp.where((~l2)[:, None],
                  jnp.concatenate(
                      [L[:, :1],
                       jnp.broadcast_to(L[:, n + 1][:, None], (K, n)),
                       L[:, n + 1:]], axis=1), L)
    # if not tl: L[0] = L[1]
    L = jnp.where((~tl2)[:, None],
                  jnp.concatenate([L[:, 1:2], L[:, 1:]], axis=1), L)
    # if not t: T[1:n+1] = L[0]
    Tt = jnp.where((~t2)[:, None],
                   jnp.concatenate(
                       [Tt[:, :1],
                        jnp.broadcast_to(L[:, :1], (K, n)),
                        Tt[:, n + 1:]], axis=1), Tt)
    # if not tr: T[n+1:] = T[n]
    Tt = jnp.where((~tr2)[:, None],
                   jnp.concatenate(
                       [Tt[:, :n + 1],
                        jnp.broadcast_to(Tt[:, n][:, None], (K, n))],
                       axis=1), Tt)
    # T[0] = L[0]
    Tt = jnp.concatenate([L[:, :1], Tt[:, 1:]], axis=1)
    return L, Tt


def _filter_refs_dev(jnp, L, Tt, filt, n, bd):
    """[1 2 1] smoothing + strong bilinear (n == 32) per record:
    filt 0 none / 1 smooth / 2 strong-candidate (data test)."""
    K = L.shape[0]
    c = (L[:, 1] + 2 * L[:, 0] + Tt[:, 1] + 2) >> 2
    sL = jnp.concatenate(
        [c[:, None],
         (L[:, 0:2 * n - 1] + 2 * L[:, 1:2 * n] + L[:, 2:2 * n + 1] + 2)
         >> 2,
         L[:, 2 * n:]], axis=1)
    sT = jnp.concatenate(
        [c[:, None],
         (Tt[:, 0:2 * n - 1] + 2 * Tt[:, 1:2 * n]
          + Tt[:, 2:2 * n + 1] + 2) >> 2,
         Tt[:, 2 * n:]], axis=1)
    if n == 32:
        thr = 1 << (bd - 5)
        ok = (jnp.abs(Tt[:, 0] + Tt[:, 2 * n] - 2 * Tt[:, n]) < thr) & \
             (jnp.abs(L[:, 0] + L[:, 2 * n] - 2 * L[:, n]) < thr)
        i = jnp.arange(2 * n + 1, dtype=jnp.int32)[None, :]
        bT = ((64 - i) * Tt[:, 0][:, None]
              + i * Tt[:, 2 * n][:, None] + 32) >> 6
        bL = ((64 - i) * L[:, 0][:, None]
              + i * L[:, 2 * n][:, None] + 32) >> 6
        bT = jnp.concatenate([Tt[:, :1], bT[:, 1:2 * n], Tt[:, 2 * n:]],
                             axis=1)
        bL = jnp.concatenate([L[:, :1], bL[:, 1:2 * n], L[:, 2 * n:]],
                             axis=1)
        strong = (filt == R.F_STRONG) & ok
        sL = jnp.where(strong[:, None], bL, sL)
        sT = jnp.where(strong[:, None], bT, sT)
    do = (filt != R.F_NONE)[:, None]
    return jnp.where(do, sL, L), jnp.where(do, sT, Tt)


def _intra_predict(jnp, L, Tt, mode, n, is_luma, bd):
    """All 35 modes for a batch of (K,) TUs with refs L/T (K, 2n+1).
    Returns (K, n, n) int32 predictions (pre-clip, like pred_intra)."""
    K = L.shape[0]
    pmax = (1 << bd) - 1
    log2n = int(np.log2(n))
    C = jnp.concatenate([L, Tt], axis=1)           # (K, 4n+2)
    lv = L[:, 1:]                                  # l[0..2n-1]
    tv = Tt[:, 1:]
    corner = L[:, 0]

    # angular
    aidx, awgt = _angular_tables(n)
    ai = jnp.asarray(aidx)[jnp.clip(mode - 2, 0, 32)]     # (K, n*n, 2)
    aw = jnp.asarray(awgt)[jnp.clip(mode - 2, 0, 32)]
    g0 = jnp.take_along_axis(C, ai[:, :, 0], axis=1)
    g1 = jnp.take_along_axis(C, ai[:, :, 1], axis=1)
    ang = (aw[:, :, 0] * g0 + aw[:, :, 1] * g1 + 16) >> 5
    ang = ang.reshape(K, n, n)
    if is_luma and n < 32:
        # mode 26 / mode 10 edge filters
        col0 = jnp.clip(tv[:, 0][:, None]
                        + ((lv[:, :n] - corner[:, None]) >> 1), 0, pmax)
        row0 = jnp.clip(lv[:, 0][:, None]
                        + ((tv[:, :n] - corner[:, None]) >> 1), 0, pmax)
        ang = jnp.where((mode == 26)[:, None, None],
                        ang.at[:, :, 0].set(col0), ang)
        ang = jnp.where((mode == 10)[:, None, None],
                        ang.at[:, 0, :].set(row0), ang)

    # planar
    xx = jnp.arange(n, dtype=jnp.int32)
    planar = ((n - 1 - xx)[None, None, :] * lv[:, :n][:, :, None]
              + (xx + 1)[None, None, :] * tv[:, n][:, None, None]
              + (n - 1 - xx)[None, :, None] * tv[:, :n][:, None, :]
              + (xx + 1)[None, :, None] * lv[:, n][:, None, None]
              + n) >> (log2n + 1)

    # DC
    dc = (jnp.sum(lv[:, :n], axis=1) + jnp.sum(tv[:, :n], axis=1)
          + n) >> (log2n + 1)
    dcblk = jnp.broadcast_to(dc[:, None, None], (K, n, n))
    if is_luma and n < 32:
        e00 = (lv[:, 0] + 2 * dc + tv[:, 0] + 2) >> 2
        erow = (tv[:, 1:n] + 3 * dc[:, None] + 2) >> 2
        ecol = (lv[:, 1:n] + 3 * dc[:, None] + 2) >> 2
        dcblk = dcblk.at[:, 0, 1:].set(erow)
        dcblk = dcblk.at[:, 1:, 0].set(ecol)
        dcblk = dcblk.at[:, 0, 0].set(e00)

    out = jnp.where((mode == 0)[:, None, None], planar,
                    jnp.where((mode == 1)[:, None, None], dcblk, ang))
    return out


# ---------------------------------------------------------------------------
# inter prediction


def _phase_planes(jnp, dpb, filters, pad, bd):
    """(R, H, W) refs -> (R, P, H+2*pad, W+2*pad) int32 stage-1 planes:
    plane 0 = edge-replicated raw samples, plane p>0 = horizontal
    p-phase filter >> (bd-8)."""
    taps = np.asarray(filters, np.int32)
    P, nt = taps.shape
    lo = nt // 2 - 1                    # 3 for 8-tap, 1 for 4-tap
    hi = nt - lo                        # 5 / 3 -> pad right hi-1? no:
    # window offsets are -lo .. nt-1-lo
    s1 = bd - 8
    ext = jnp.pad(dpb.astype(jnp.int32),
                  ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    ext2 = jnp.pad(ext, ((0, 0), (0, 0), (lo, nt - 1 - lo)),
                   mode="edge")
    W2 = ext.shape[2]
    planes = [ext]
    for p in range(1, P):
        acc = None
        for i in range(nt):
            t = int(taps[p, i])
            if not t:
                continue
            term = t * ext2[:, :, i:i + W2]
            acc = term if acc is None else acc + term
        planes.append(acc >> s1 if s1 else acc)
    return jnp.stack(planes, axis=1)


def _mc_plane(jnp, S, vtaps, slot_px, mvx_px, mvy_px, frac_bits,
              H, W, pad, bd):
    """Motion-compensate one plane for one list.

    S: (R, P, Hp, Wp) stage-1 stack; vtaps (P, nt) vertical filters;
    per-pixel slot (-1 = unused), mv in (1<<frac_bits)-pel units.
    Returns raw 14-bit-scale prediction (H, W) int32 (garbage where
    slot < 0)."""
    nt = vtaps.shape[1]
    lo = nt // 2 - 1
    s1 = bd - 8
    Rn, P, Hp, Wp = S.shape
    ox = jnp.arange(W, dtype=jnp.int32)[None, :]
    oy = jnp.arange(H, dtype=jnp.int32)[:, None]
    xi = jnp.clip(ox + (mvx_px >> frac_bits), -pad, W - 1 + pad) + pad
    yi = jnp.clip(oy + (mvy_px >> frac_bits), -pad, H - 1 + pad) + pad
    fx = mvx_px & ((1 << frac_bits) - 1)
    fy = mvy_px & ((1 << frac_bits) - 1)
    slot = jnp.maximum(slot_px, 0)
    Sf = S.reshape(-1)
    base = ((slot * P + fx) * Hp)
    vt = jnp.asarray(vtaps, jnp.int32)[fy]          # (H, W, nt)
    acc = jnp.zeros((H, W), jnp.int32)
    g_mid = None
    for j in range(nt):
        row = jnp.clip(yi + (j - lo), 0, Hp - 1)
        g = Sf[(base + row) * Wp + xi]
        if j == lo:
            g_mid = g
        acc = acc + vt[:, :, j] * g
    raw_hv = acc >> 6                                # fx!=0, fy!=0
    raw_v = acc >> s1 if s1 else acc                 # fx==0, fy!=0
    raw_h = g_mid                                    # fx!=0, fy==0
    raw_0 = g_mid << (14 - bd)                       # fx==0, fy==0
    return jnp.where(fy == 0,
                     jnp.where(fx == 0, raw_0, raw_h),
                     jnp.where(fx == 0, raw_v, raw_hv))


def _inter_pred(jnp, dpb, slot4, mvx4, mvy4, pf4, filters, frac_bits,
                sub, pad, bd):
    """Full-plane inter prediction for one picture plane.

    dpb (R, H, W); slot4/mvx4/mvy4 (2, H4, W4) grids at 4x4 LUMA
    granularity; pf4 (H4, W4); sub = luma-to-plane subsampling shift
    (0 luma, 1 chroma).  Returns clipped (H, W) int32 prediction."""
    Rn, H, W = dpb.shape
    rep = 4 >> sub
    S = _phase_planes(jnp, dpb, filters, pad, bd)
    vtaps = np.asarray(filters, np.int32)

    def px(a):
        return jnp.repeat(jnp.repeat(a, rep, axis=0), rep, axis=1)[
            :H, :W]

    pf = px(pf4)
    raws = []
    for ll in range(2):
        raw = _mc_plane(jnp, S, vtaps, px(slot4[ll]), px(mvx4[ll]),
                        px(mvy4[ll]), frac_bits, H, W, pad, bd)
        raws.append(raw)
    sh_u, sh_b = 14 - bd, 15 - bd
    pmax = (1 << bd) - 1
    uni0 = (raws[0] + (1 << (sh_u - 1))) >> sh_u
    uni1 = (raws[1] + (1 << (sh_u - 1))) >> sh_u
    bi = (raws[0] + raws[1] + (1 << (sh_b - 1))) >> sh_b
    out = jnp.where(pf == 3, bi, jnp.where(pf == 2, uni1, uni0))
    return jnp.clip(out, 0, pmax)


# ---------------------------------------------------------------------------
# residual


def _idct_mats(n, bd):
    t = {4: T.T4, 8: T.T8, 16: T.T16, 32: T.T32}[n].astype(np.int32)
    return t, 20 - bd


def _residual_blocks(jnp, coef, kind, n, is_luma, bd):
    """(K, n, n) int32 dequantized coeffs -> residual (exact
    dsp_template.c IDCT / DST-VII / transform-skip)."""
    def c16(x):
        return jnp.clip(x, -32768, 32767)

    t, sh2 = _idct_mats(n, bd)
    tj = jnp.asarray(t)
    tmp = c16((jnp.einsum("ij,kjl->kil", tj.T, coef,
                          preferred_element_type=jnp.int32) + 64) >> 7)
    idct = c16((jnp.einsum("kij,jl->kil", tmp, tj,
                           preferred_element_type=jnp.int32)
                + (1 << (sh2 - 1))) >> sh2)
    out = idct
    if n == 4:
        if is_luma:
            s = jnp.asarray(T.DST4.astype(np.int32))
            tm = c16((jnp.einsum("ij,kjl->kil", s.T, coef,
                                 preferred_element_type=jnp.int32)
                      + 64) >> 7)
            dst = c16((jnp.einsum("kij,jl->kil", tm, s,
                                  preferred_element_type=jnp.int32)
                       + (1 << (sh2 - 1))) >> sh2)
            out = jnp.where((kind == R.K_DST)[:, None, None], dst, out)
        tshift = 15 - bd - 2
        tsk = (coef + (1 << (tshift - 1))) >> tshift
        out = jnp.where((kind == R.K_TSKIP)[:, None, None], tsk, out)
    return out


# ---------------------------------------------------------------------------
# the jitted frame program


@functools.lru_cache(maxsize=8)
def _build_program(key):
    (H, W, bd, Rn, nlev, has_inter, tu_shapes, intra_shapes) = key
    import jax
    jnp = _jnp()
    Hc, Wc = H // 2, W // 2
    pmax = (1 << bd) - 1

    def program(dpb_y, dpb_u, dpb_v, slot4, mvx4, mvy4, pf4,
                tu_args, intra_args):
        # ---- 1. residual planes ---------------------------------------
        res_y = jnp.zeros((H, W), jnp.int32)
        res_c = jnp.zeros((2, Hc, Wc), jnp.int32)
        for (is_luma, n), _K in tu_shapes:
            pos, coef, kind, cpl = tu_args[(is_luma, n)]
            blocks = _residual_blocks(jnp, coef, kind, n, is_luma, bd)
            dy = jnp.arange(n, dtype=jnp.int32)
            ys = pos[:, 1][:, None, None] + dy[None, :, None]
            xs = pos[:, 0][:, None, None] + dy[None, None, :]
            if is_luma:
                res_y = res_y.at[ys, xs].set(blocks, mode="drop")
            else:
                pl = jnp.broadcast_to(cpl[:, None, None], ys.shape)
                res_c = res_c.at[pl, ys, xs].set(blocks, mode="drop")

        # ---- 2. inter prediction + residual add -----------------------
        y = jnp.zeros((H, W), jnp.int32)
        u = jnp.zeros((Hc, Wc), jnp.int32)
        v = jnp.zeros((Hc, Wc), jnp.int32)
        if has_inter:
            py = _inter_pred(jnp, dpb_y, slot4, mvx4, mvy4, pf4,
                             LUMA_FILTERS, 2, 0, PAD_L, bd)
            pu = _inter_pred(jnp, dpb_u, slot4, mvx4, mvy4, pf4,
                             CHROMA_FILTERS, 3, 1, PAD_C, bd)
            pv = _inter_pred(jnp, dpb_v, slot4, mvx4, mvy4, pf4,
                             CHROMA_FILTERS, 3, 1, PAD_C, bd)
            m_y = jnp.repeat(jnp.repeat(pf4 > 0, 4, 0), 4, 1)[:H, :W]
            m_c = jnp.repeat(jnp.repeat(pf4 > 0, 2, 0), 2, 1)[:Hc, :Wc]
            y = jnp.where(m_y, jnp.clip(py + res_y, 0, pmax), y)
            u = jnp.where(m_c, jnp.clip(pu + res_c[0], 0, pmax), u)
            v = jnp.where(m_c, jnp.clip(pv + res_c[1], 0, pmax), v)

        # ---- 3. intra wavefront over dependency levels -----------------
        if nlev:
            def step(carry, xs):
                y, u, v = carry
                for (is_luma, n), _K in intra_shapes:
                    px, pyy, mode, ab, filt, cpl = xs[(is_luma, n)]
                    K = px.shape[0]
                    pw, ph = (W, H) if is_luma else (Wc, Hc)
                    if is_luma:
                        plane = y
                    else:
                        cstack = jnp.stack([u, v])
                    # raw side gathers with index clamping
                    k2 = jnp.arange(2 * n, dtype=jnp.int32)[None, :]
                    lrow = jnp.clip(pyy[:, None] + k2, 0, ph - 1)
                    lcol = jnp.clip(px - 1, 0, pw - 1)[:, None]
                    trow = jnp.clip(pyy - 1, 0, ph - 1)[:, None]
                    tcol = jnp.clip(px[:, None] + k2, 0, pw - 1)
                    crow = jnp.clip(pyy - 1, 0, ph - 1)
                    ccol = jnp.clip(px - 1, 0, pw - 1)
                    if is_luma:
                        Lr = plane[lrow, lcol]
                        Tr = plane[trow, tcol]
                        corner = plane[crow, ccol]
                    else:
                        Lr = cstack[cpl[:, None], lrow, lcol]
                        Tr = cstack[cpl[:, None], trow, tcol]
                        corner = cstack[cpl, crow, ccol]
                    avail = jnp.stack(
                        [(ab >> i) & 1 for i in range(5)],
                        axis=1).astype(bool)
                    L, Tt = _ref_cascade(jnp, Lr, Tr, corner, avail, bd)
                    L, Tt = _filter_refs_dev(jnp, L, Tt, filt, n, bd)
                    pred = _intra_predict(jnp, L, Tt, mode, n,
                                          bool(is_luma), bd)
                    dn = jnp.arange(n, dtype=jnp.int32)
                    gys = jnp.clip(pyy[:, None, None]
                                   + dn[None, :, None], 0, ph - 1)
                    gxs = jnp.clip(px[:, None, None]
                                   + dn[None, None, :], 0, pw - 1)
                    if is_luma:
                        r = res_y[gys, gxs]
                    else:
                        r = res_c[jnp.broadcast_to(
                            cpl[:, None, None], gys.shape), gys, gxs]
                    blk = jnp.clip(pred + r, 0, pmax)
                    sys = pyy[:, None, None] + dn[None, :, None]
                    sxs = px[:, None, None] + dn[None, None, :]
                    if is_luma:
                        y = y.at[sys, sxs].set(blk, mode="drop")
                    else:
                        pl3 = jnp.broadcast_to(cpl[:, None, None],
                                               sys.shape)
                        cstack = cstack.at[pl3, sys, sxs].set(
                            blk, mode="drop")
                        u, v = cstack[0], cstack[1]
                return (y, u, v), 0

            (y, u, v), _ = jax.lax.scan(step, (y, u, v), intra_args)

        dt = jnp.uint8 if bd == 8 else jnp.uint16
        return y.astype(dt), u.astype(dt), v.astype(dt)

    return jax.jit(program)


def _pow2(k, lo=4):
    n = lo
    while n < k:
        n *= 2
    return n


def prepare(dec, rec: R.ReconRecorder):
    """Build the device program + argument tensors for one frame;
    returns (fn, args) so callers (bench replay) can re-execute the
    device stage without re-marshaling the record."""
    sps = dec.sps
    H, W = sps.height, sps.width
    bd = dec.bd
    H4, W4 = H // 4, W // 4

    # DPB slots (dedupe planes shared between lists, like h264)
    slots, slot_of, slot_map = [], {}, ({}, {})
    for ll in range(2):
        for r, planes in enumerate(dec.refs[ll]):
            key = id(planes[0])
            if key not in slot_of:
                slot_of[key] = len(slots)
                slots.append(planes)
            slot_map[ll][r] = slot_of[key]
    Rn = max(1, len(slots))
    dpb_y = np.zeros((Rn, H, W), dec.y.dtype)
    dpb_u = np.zeros((Rn, H // 2, W // 2), dec.y.dtype)
    dpb_v = np.zeros((Rn, H // 2, W // 2), dec.y.dtype)
    for i, (py, pu, pv) in enumerate(slots):
        dpb_y[i], dpb_u[i], dpb_v[i] = py, pu, pv

    slot4 = np.full((2, H4, W4), -1, np.int32)
    for ll in range(2):
        use = (dec.pf & (1 << ll)) > 0
        for r, s in slot_map[ll].items():
            slot4[ll][use & (dec.refidx[:, :, ll] == r)] = s
    mvx4 = np.ascontiguousarray(dec.mvx.transpose(2, 0, 1))
    mvy4 = np.ascontiguousarray(dec.mvy.transpose(2, 0, 1))
    has_inter = bool((dec.pf > 0).any())

    # TU tensors per class. Every class is always instantiated (empty
    # ones at minimal K) so the program key — and hence the compile —
    # depends only on geometry + padded counts, not on which classes a
    # particular frame happens to use.
    all_classes = [(True, 4), (True, 8), (True, 16), (True, 32),
                   (False, 4), (False, 8), (False, 16)]
    tu_args, tu_shapes = {}, []
    for (is_luma, n) in all_classes:
        lst = rec.tus.get((is_luma, n), [])
        K = _pow2(len(lst))
        pos = np.full((K, 2), INVALID, np.int32)
        coef = np.zeros((K, n, n), np.int32)
        kind = np.zeros(K, np.int32)
        cpl = np.zeros(K, np.int32)
        for i, (x, y, kd, cf, pl) in enumerate(lst):
            pos[i] = (x, y)
            coef[i] = cf
            kind[i] = kd
            cpl[i] = pl
        tu_args[(is_luma, n)] = (pos, coef, kind, cpl)
        tu_shapes.append(((is_luma, n), K))

    # intra tensors: level-major; nlev bucketed to a power of two so
    # frames with similar depth chains share one compiled program
    nlev = _pow2(rec.max_level, lo=8) if rec.max_level else 0
    intra_args, intra_shapes = {}, []
    for (is_luma, n) in all_classes:
        lst = rec.intra.get((is_luma, n), [])
        per = {}
        kmax = 0
        for it in lst:
            per.setdefault(it[0] - 1, []).append(it)
            kmax = max(kmax, len(per[it[0] - 1]))
        K = _pow2(kmax, lo=2)
        px = np.full((nlev, K), INVALID, np.int32)
        py = np.full((nlev, K), INVALID, np.int32)
        mode = np.zeros((nlev, K), np.int32)
        ab = np.zeros((nlev, K), np.int32)
        filt = np.zeros((nlev, K), np.int32)
        cpl = np.zeros((nlev, K), np.int32)
        for lv, items in per.items():
            for i, (_l, x, y, m, a, f, p) in enumerate(items):
                px[lv, i], py[lv, i] = x, y
                mode[lv, i], ab[lv, i] = m, a
                filt[lv, i], cpl[lv, i] = f, p
        intra_args[(is_luma, n)] = (px, py, mode, ab, filt, cpl)
        intra_shapes.append(((is_luma, n), K))

    key = (H, W, bd, Rn, nlev, has_inter,
           tuple(tu_shapes), tuple(intra_shapes))
    fn = _build_program(key)
    return fn, (dpb_y, dpb_u, dpb_v, slot4, mvx4, mvy4,
                dec.pf.astype(np.int32), tu_args, intra_args)


def reconstruct(dec, rec: R.ReconRecorder) -> None:
    """Fill dec.y/u/v (pre-loop-filter) from the recorded work items,
    running transforms + inter MC + intra prediction on the device."""
    fn, args = prepare(dec, rec)
    y, u, v = fn(*args)
    dec.y[:] = np.asarray(y)
    dec.u[:] = np.asarray(u)
    dec.v[:] = np.asarray(v)
