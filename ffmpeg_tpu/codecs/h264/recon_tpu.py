"""H.264 reconstruction on the TPU (device path of the host-entropy /
device-transform split; replaces the per-MB hot loop of
libavcodec/h264_slice.c:2571 decode_slice → ff_h264_hl_decode_mb).

Byte-exact with recon_host.py. Architecture (all inside ONE jitted
program per frame geometry):

  1. residual: every 4x4 block IDCT'd in parallel (vectorized exact
     integer transform), assembled into full int32 residual planes.
  2. inter: per reference frame, the three half-pel intermediate planes
     (b/h/j of §8.4.2.2.1) are computed ONCE as full-plane separable
     6-tap filters; each output pixel then needs at most two gathers
     selected by its quarter-pel phase (a 16-entry case table). Chroma
     is a 4-gather bilinear. Bi-prediction averages the two lists.
  3. intra: wavefront lax.scan over MB anti-diagonals d = mbx + 2*mby
     (skew 2 covers the top-right dependency), vectorized across the
     diagonal; I_NxN blocks run a 10-substep inner wavefront
     (sx + 2*sy), I_16x16/chroma predict whole-MB at substep 0.
     Prediction modes are evaluated as gathers from a 13-sample
     reference vector with precomputed (index, weight, shift) tables.
  4. deblock: second wavefront scan; boundary strengths and
     alpha/beta/tc0 are precomputed host-side from parse metadata
     (they need no pixels), the device does only the pixel math.

This is the P3/long-context "skewed iteration" strategy of SURVEY §5
applied to intra prediction and the loop filter.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from . import tables as T

# ---------------------------------------------------------------------------
# intra 4x4 mode tables: value = (w0*r[i0] + w1*r[i1] + w2*r[i2] + rnd) >> sh
# over the reference vector r = [l0..l3, tl, t0..t3, tr0..tr3].


def _gen_i4_tables():
    idx = np.zeros((9, 16, 3), np.int32)
    w = np.zeros((9, 16, 3), np.int32)
    sh = np.zeros((9, 16), np.int32)

    def Tk(k):
        return 4 if k < 0 else 5 + k

    def Lk(k):
        return 4 if k < 0 else k

    for j in range(4):
        for i in range(4):
            p = j * 4 + i
            idx[0, p], w[0, p], sh[0, p] = (5 + i, 0, 0), (1, 0, 0), 0
            idx[1, p], w[1, p], sh[1, p] = (j, 0, 0), (1, 0, 0), 0
            # mode 3: diagonal down-left
            k = i + j
            idx[3, p] = (11, 12, 12) if k == 6 else (5 + k, 6 + k, 7 + k)
            w[3, p], sh[3, p] = (1, 2, 1), 2
            # mode 4: diagonal down-right
            if i > j:
                k = i - j
                idx[4, p] = (Tk(k - 2), Tk(k - 1), Tk(k))
            elif i < j:
                k = j - i
                idx[4, p] = (Lk(k - 2), Lk(k - 1), Lk(k))
            else:
                idx[4, p] = (5, 4, 0)
            w[4, p], sh[4, p] = (1, 2, 1), 2
            # mode 5: vertical-right
            z = 2 * i - j
            if z >= 0 and z % 2 == 0:
                k = i - (j >> 1)
                idx[5, p], w[5, p], sh[5, p] = \
                    (Tk(k - 1), Tk(k), 0), (1, 1, 0), 1
            elif z > 0:
                k = i - (j >> 1)
                idx[5, p], w[5, p], sh[5, p] = \
                    (Tk(k - 2), Tk(k - 1), Tk(k)), (1, 2, 1), 2
            elif z == -1:
                idx[5, p], w[5, p], sh[5, p] = (0, 4, 5), (1, 2, 1), 2
            else:
                k = j - 2 * i
                idx[5, p], w[5, p], sh[5, p] = \
                    (Lk(k - 1), Lk(k - 2), Lk(k - 3)), (1, 2, 1), 2
            # mode 6: horizontal-down
            z = 2 * j - i
            if z >= 0 and z % 2 == 0:
                k = j - (i >> 1)
                idx[6, p], w[6, p], sh[6, p] = \
                    (Lk(k - 1), Lk(k), 0), (1, 1, 0), 1
            elif z > 0:
                k = j - (i >> 1)
                idx[6, p], w[6, p], sh[6, p] = \
                    (Lk(k - 2), Lk(k - 1), Lk(k)), (1, 2, 1), 2
            elif z == -1:
                idx[6, p], w[6, p], sh[6, p] = (5, 4, 0), (1, 2, 1), 2
            else:
                k = i - 2 * j
                idx[6, p], w[6, p], sh[6, p] = \
                    (Tk(k - 1), Tk(k - 2), Tk(k - 3)), (1, 2, 1), 2
            # mode 7: vertical-left
            k = i + (j >> 1)
            if j % 2 == 0:
                idx[7, p], w[7, p], sh[7, p] = \
                    (5 + k, 6 + k, 0), (1, 1, 0), 1
            else:
                idx[7, p], w[7, p], sh[7, p] = \
                    (5 + k, 6 + k, 7 + k), (1, 2, 1), 2
            # mode 8: horizontal-up
            z = i + 2 * j
            if z > 5:
                idx[8, p], w[8, p], sh[8, p] = (3, 0, 0), (1, 0, 0), 0
            elif z == 5:
                idx[8, p], w[8, p], sh[8, p] = (2, 3, 3), (1, 2, 1), 2
            elif z % 2 == 0:
                k = j + (i >> 1)
                idx[8, p], w[8, p], sh[8, p] = (k, k + 1, 0), (1, 1, 0), 1
            else:
                k = j + (i >> 1)
                idx[8, p], w[8, p], sh[8, p] = \
                    (k, k + 1, k + 2), (1, 2, 1), 2
    return idx, w, sh


_I4_IDX, _I4_W, _I4_SH = _gen_i4_tables()


# ---------------------------------------------------------------------------
# Intra_8x8 mode tables over the FILTERED reference vector
# r = [lf0..lf7 (0..7), tlf (8), tf0..tf15 (9..24)] (spec 8.3.2.2.2-10;
# mirrors recon.pred8x8's per-pixel formulas; DC handled separately).


def _gen_i8_tables():
    idx = np.zeros((9, 64, 3), np.int32)
    w = np.zeros((9, 64, 3), np.int32)
    sh = np.zeros((9, 64), np.int32)

    def Tk(k):
        return 8 if k < 0 else 9 + k

    def Lk(k):
        return 8 if k < 0 else k

    for j in range(8):
        for i in range(8):
            p = j * 8 + i
            idx[0, p], w[0, p], sh[0, p] = (Tk(i), 0, 0), (1, 0, 0), 0
            idx[1, p], w[1, p], sh[1, p] = (Lk(j), 0, 0), (1, 0, 0), 0
            # mode 3: diagonal down-left
            k = i + j
            idx[3, p] = (Tk(14), Tk(15), Tk(15)) if k == 14 else \
                (Tk(k), Tk(k + 1), Tk(k + 2))
            w[3, p], sh[3, p] = (1, 2, 1), 2
            # mode 4: diagonal down-right
            if i > j:
                k = i - j
                idx[4, p] = (Tk(k - 2), Tk(k - 1), Tk(k))
            elif i < j:
                k = j - i
                idx[4, p] = (Lk(k - 2), Lk(k - 1), Lk(k))
            else:
                idx[4, p] = (Tk(0), 8, Lk(0))
            w[4, p], sh[4, p] = (1, 2, 1), 2
            # mode 5: vertical-right
            z = 2 * i - j
            k = i - (j >> 1)
            if z >= 0 and z % 2 == 0:
                idx[5, p], w[5, p], sh[5, p] = \
                    (Tk(k - 1), Tk(k), 0), (1, 1, 0), 1
            elif z > 0:
                idx[5, p], w[5, p], sh[5, p] = \
                    (Tk(k - 2), Tk(k - 1), Tk(k)), (1, 2, 1), 2
            elif z == -1:
                idx[5, p], w[5, p], sh[5, p] = \
                    (Lk(0), 8, Tk(0)), (1, 2, 1), 2
            else:
                k = j - 2 * i
                idx[5, p], w[5, p], sh[5, p] = \
                    (Lk(k - 1), Lk(k - 2), Lk(k - 3)), (1, 2, 1), 2
            # mode 6: horizontal-down
            z = 2 * j - i
            k = j - (i >> 1)
            if z >= 0 and z % 2 == 0:
                idx[6, p], w[6, p], sh[6, p] = \
                    (Lk(k - 1), Lk(k), 0), (1, 1, 0), 1
            elif z > 0:
                idx[6, p], w[6, p], sh[6, p] = \
                    (Lk(k - 2), Lk(k - 1), Lk(k)), (1, 2, 1), 2
            elif z == -1:
                idx[6, p], w[6, p], sh[6, p] = \
                    (Tk(0), 8, Lk(0)), (1, 2, 1), 2
            else:
                k = i - 2 * j
                idx[6, p], w[6, p], sh[6, p] = \
                    (Tk(k - 1), Tk(k - 2), Tk(k - 3)), (1, 2, 1), 2
            # mode 7: vertical-left
            k = i + (j >> 1)
            if j % 2 == 0:
                idx[7, p], w[7, p], sh[7, p] = \
                    (Tk(k), Tk(k + 1), 0), (1, 1, 0), 1
            else:
                idx[7, p], w[7, p], sh[7, p] = \
                    (Tk(k), Tk(k + 1), Tk(k + 2)), (1, 2, 1), 2
            # mode 8: horizontal-up
            z = i + 2 * j
            k = j + (i >> 1)
            if z > 13:
                idx[8, p], w[8, p], sh[8, p] = (Lk(7), 0, 0), (1, 0, 0), 0
            elif z == 13:
                idx[8, p], w[8, p], sh[8, p] = \
                    (Lk(6), Lk(7), Lk(7)), (1, 2, 1), 2
            elif z % 2 == 0:
                idx[8, p], w[8, p], sh[8, p] = \
                    (Lk(k), Lk(k + 1), 0), (1, 1, 0), 1
            else:
                idx[8, p], w[8, p], sh[8, p] = \
                    (Lk(k), Lk(k + 1), Lk(k + 2)), (1, 2, 1), 2
    return idx, w, sh


_I8_IDX, _I8_W, _I8_SH = _gen_i8_tables()

# quarter-pel case table: phase yf*4+xf -> (plane1, dy1, dx1,
# plane2, dy2, dx2); result = (v1 + v2 + 1) >> 1 (duplicated entries make
# the plain cases exact too). Planes: 0=G int-pel, 1=B h-half, 2=H v-half,
# 3=J center (libavcodec/h264qpel_template.c case split).
_QPEL_CASES = np.array([
    # xf = 0..3 for each yf row
    (0, 0, 0, 0, 0, 0), (0, 0, 0, 1, 0, 0),
    (1, 0, 0, 1, 0, 0), (1, 0, 0, 0, 0, 1),      # yf=0
    (0, 0, 0, 2, 0, 0), (1, 0, 0, 2, 0, 0),
    (1, 0, 0, 3, 0, 0), (1, 0, 0, 2, 0, 1),      # yf=1
    (2, 0, 0, 2, 0, 0), (2, 0, 0, 3, 0, 0),
    (3, 0, 0, 3, 0, 0), (2, 0, 1, 3, 0, 0),      # yf=2
    (2, 0, 0, 0, 1, 0), (1, 1, 0, 2, 0, 0),
    (1, 1, 0, 3, 0, 0), (1, 1, 0, 2, 0, 1),      # yf=3
], np.int32)

_PAD = 32        # luma replication pad (covers any mv: beyond it the
_PAD_C = 16      # filters see constant rows/cols == the spec's edge clamp)

# inner wavefront: substep s -> 4x4 block offsets with sx + 2*sy == s
_SUBSTEPS = [[(sx, sy) for sy in range(4) for sx in range(4)
              if sx + 2 * sy == s] for s in range(10)]


def _pad_replicate(x, pad):
    import jax.numpy as jnp
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="edge")


def _halfpel_planes(gpad):
    """gpad: (R, Hp, Wp) int32 padded int-pel. Returns (G, B, H, J)
    full planes, values clipped to [0,255]; border margin of 3 px is
    garbage (callers clamp gather indices inside)."""
    import jax.numpy as jnp

    def tap6(a, axis):
        def sl(k):
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(2 + k, a.shape[axis] - 3 + k)
            return a[tuple(idx)]
        # taps at offsets -2..+3: the half-pel between positions 0 and +1
        s = (sl(-2) - 5 * sl(-1) + 20 * sl(0)
             + 20 * sl(1) - 5 * sl(2) + sl(3))
        pad_width = [(0, 0)] * a.ndim
        pad_width[axis] = (2, 3)
        return jnp.pad(s, pad_width)

    b1 = tap6(gpad, 2)                       # unnormalized horizontal
    B = jnp.clip((b1 + 16) >> 5, 0, 255)
    H = jnp.clip((tap6(gpad, 1) + 16) >> 5, 0, 255)
    J = jnp.clip((tap6(b1, 1) + 512) >> 10, 0, 255)
    return gpad, B, H, J


def _idct_blocks(coeff):
    """coeff: (..., 16) int32 raster-order dequantized blocks ->
    (..., 4, 4) int32 residual (exact h264idct_template.c math)."""
    b = coeff.reshape(coeff.shape[:-1] + (4, 4)).astype(np.int32)
    b = b.at[..., 0, 0].add(32)
    z0 = b[..., 0, :] + b[..., 2, :]
    z1 = b[..., 0, :] - b[..., 2, :]
    z2 = (b[..., 1, :] >> 1) - b[..., 3, :]
    z3 = b[..., 1, :] + (b[..., 3, :] >> 1)
    import jax.numpy as jnp
    r = jnp.stack([z0 + z3, z1 + z2, z1 - z2, z0 - z3], axis=-2)
    z0 = r[..., 0] + r[..., 2]
    z1 = r[..., 0] - r[..., 2]
    z2 = (r[..., 1] >> 1) - r[..., 3]
    z3 = r[..., 1] + (r[..., 3] >> 1)
    return jnp.stack([z0 + z3, z1 + z2, z1 - z2, z0 - z3], axis=-1) >> 6


def _residual_plane(coeff):
    """(n4y, n4x, 16) -> (H, W) int32 residual plane."""
    n4y, n4x = coeff.shape[:2]
    blocks = _idct_blocks(coeff)                     # (n4y, n4x, 4, 4)
    return blocks.transpose(0, 2, 1, 3).reshape(n4y * 4, n4x * 4)


def _idct8_blocks(coeff):
    """coeff: (..., 64) int32 raster dequantized 8x8 blocks ->
    (..., 8, 8) residual (exact spec 8.5.12.3 / recon.idct8_add math:
    horizontal pass, then vertical)."""
    import jax.numpy as jnp
    b = coeff.reshape(coeff.shape[:-1] + (8, 8)).astype(np.int32)

    def p(x):
        # 1-D transform along the LAST axis
        x0, x1, x2, x3, x4, x5, x6, x7 = [x[..., i] for i in range(8)]
        a0 = x0 + x4
        a2 = x0 - x4
        a4 = (x2 >> 1) - x6
        a6 = (x6 >> 1) + x2
        b0 = a0 + a6
        b2 = a2 + a4
        b4 = a2 - a4
        b6 = a0 - a6
        a1 = -x3 + x5 - x7 - (x7 >> 1)
        a3 = x1 + x7 - x3 - (x3 >> 1)
        a5 = -x1 + x7 + x5 + (x5 >> 1)
        a7 = x3 + x5 + x1 + (x1 >> 1)
        b1 = a1 + (a7 >> 2)
        b7 = a7 - (a1 >> 2)
        b3 = a3 + (a5 >> 2)
        b5 = (a3 >> 2) - a5
        return jnp.stack([b0 + b7, b2 + b5, b4 + b3, b6 + b1,
                          b6 - b1, b4 - b3, b2 - b5, b0 - b7], axis=-1)

    t = p(b)                             # (..., row, hout)
    s = p(t.swapaxes(-1, -2))            # (..., hout, vout)
    return (s.swapaxes(-1, -2) + 32) >> 6


def _residual_plane8(coeff8):
    """(n8y, n8x, 64) -> (H, W) int32 residual plane (zero outside
    8x8-transform MBs because their coefficients are zero)."""
    n8y, n8x = coeff8.shape[:2]
    blocks = _idct8_blocks(coeff8)
    return blocks.transpose(0, 2, 1, 3).reshape(n8y * 8, n8x * 8)


def _avg(a, b):
    return (a + b + 1) >> 1


def _inter_luma(stacked, mv, slot, H, W):
    """stacked: (4, R, Hp, Wp) int32 G/B/H/J planes. mv: (2, n4y, n4x, 2)
    int32 quarter-pel. slot: (2, n4y, n4x) DPB slot or -1.
    Returns pred (H, W) int32 and used (H, W) bool per list."""
    import jax.numpy as jnp
    _, R, Hp, Wp = stacked.shape
    flat = stacked.reshape(-1)
    cases = jnp.asarray(_QPEL_CASES)
    yy, xx = jnp.mgrid[0:H, 0:W]
    by4, bx4 = yy >> 2, xx >> 2
    preds, useds = [], []
    for lst in range(2):
        mvx = mv[lst, :, :, 0][by4, bx4]
        mvy = mv[lst, :, :, 1][by4, bx4]
        sl = slot[lst][by4, bx4]
        used = sl >= 0
        s0 = jnp.maximum(sl, 0)
        Y = yy + (mvy >> 2) + _PAD
        X = xx + (mvx >> 2) + _PAD
        phase = (mvy & 3) * 4 + (mvx & 3)
        c = cases[phase]                              # (H, W, 6)
        vals = []
        for t in range(2):
            p = c[..., 3 * t]
            gy = jnp.clip(Y + c[..., 3 * t + 1], 3, Hp - 4)
            gx = jnp.clip(X + c[..., 3 * t + 2], 3, Wp - 4)
            fi = ((p * R + s0) * Hp + gy) * Wp + gx
            vals.append(jnp.take(flat, fi))
        preds.append(_avg(vals[0], vals[1]))
        useds.append(used)
    return preds, useds


def _inter_chroma(cpad, mv, slot, Hc, Wc):
    """cpad: (R, Hp, Wp) int32 padded chroma. Eighth-pel bilinear."""
    import jax.numpy as jnp
    R, Hp, Wp = cpad.shape
    flat = cpad.reshape(-1)
    yy, xx = jnp.mgrid[0:Hc, 0:Wc]
    by4, bx4 = yy >> 1, xx >> 1
    preds, useds = [], []
    for lst in range(2):
        mvx = mv[lst, :, :, 0][by4, bx4]
        mvy = mv[lst, :, :, 1][by4, bx4]
        sl = slot[lst][by4, bx4]
        s0 = jnp.maximum(sl, 0)
        Y = jnp.clip(yy + (mvy >> 3) + _PAD_C, 0, Hp - 2)
        X = jnp.clip(xx + (mvx >> 3) + _PAD_C, 0, Wp - 2)
        fx, fy = mvx & 7, mvy & 7
        base = (s0 * Hp + Y) * Wp + X
        A = jnp.take(flat, base)
        Bv = jnp.take(flat, base + 1)
        C = jnp.take(flat, base + Wp)
        D = jnp.take(flat, base + Wp + 1)
        out = ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * Bv +
               (8 - fx) * fy * C + fx * fy * D + 32) >> 6
        preds.append(out)
        useds.append(sl >= 0)
    return preds, useds


def _combine_lists(preds, useds, w=None, o=None, d=None, rep=4):
    """Weighted bi/uni prediction combine (8.4.2.3). With the default
    per-block arrays (w=1, o=0, d=0) this reduces exactly to plain
    averaging / copy. w/o: (2, n4y, n4x); d: (n4y, n4x); rep: pixels per
    block cell in this plane (4 luma, 2 chroma)."""
    import jax.numpy as jnp
    both = useds[0] & useds[1]

    def expand(a):
        return jnp.repeat(jnp.repeat(a, rep, -2), rep, -1)

    if w is None:
        out = jnp.where(both, _avg(preds[0], preds[1]),
                        jnp.where(useds[0], preds[0], preds[1]))
        return jnp.where(useds[0] | useds[1], out, 0)
    w0, w1 = expand(w[0]), expand(w[1])
    o0, o1 = expand(o[0]), expand(o[1])
    dd = expand(d)
    uni_p = jnp.where(useds[0], preds[0], preds[1])
    uni_w = jnp.where(useds[0], w0, w1)
    uni_o = jnp.where(useds[0], o0, o1)
    uni = ((uni_p * uni_w + ((1 << dd) >> 1)) >> dd) + uni_o
    bi = ((preds[0] * w0 + preds[1] * w1 + (1 << dd)) >> (dd + 1)) \
        + ((o0 + o1 + 1) >> 1)
    out = jnp.clip(jnp.where(both, bi, uni), 0, 255)
    return jnp.where(useds[0] | useds[1], out, 0)


# ---------------------------------------------------------------------------
# intra wavefront


def _dc4(left, top, al, at):
    import jax.numpy as jnp
    ls, ts = left.sum(-1), top.sum(-1)
    return jnp.where(
        al & at, (ls + ts + 4) >> 3,
        jnp.where(al, (ls + 2) >> 2,
                  jnp.where(at, (ts + 2) >> 2, 128)))


def _pred16(y, mbx, mby, mode, al, at, W16=16):
    """Whole-block intra prediction (luma 16x16 when W16=16, chroma 8x8
    handled separately). mbx/mby: (L,) lane coords. Returns (L, 16, 16)."""
    import jax.numpy as jnp
    L = mbx.shape[0]
    Hh, Ww = y.shape
    x0, y0 = mbx * 16, mby * 16
    cols = x0[:, None] + jnp.arange(16)[None, :]
    rows = y0[:, None] + jnp.arange(16)[None, :]
    top = y[jnp.clip(y0 - 1, 0, Hh - 1)[:, None], jnp.clip(cols, 0, Ww - 1)]
    left = y[jnp.clip(rows, 0, Hh - 1), jnp.clip(x0 - 1, 0, Ww - 1)[:, None]]
    tl = y[jnp.clip(y0 - 1, 0, Hh - 1), jnp.clip(x0 - 1, 0, Ww - 1)]
    v = jnp.broadcast_to(top[:, None, :], (L, 16, 16))
    h = jnp.broadcast_to(left[:, :, None], (L, 16, 16))
    dc = jnp.where(
        al & at, (left.sum(-1) + top.sum(-1) + 16) >> 5,
        jnp.where(al, (left.sum(-1) + 8) >> 4,
                  jnp.where(at, (top.sum(-1) + 8) >> 4, 128)))
    dcb = jnp.broadcast_to(dc[:, None, None], (L, 16, 16))
    # plane mode: 17-sample top/left rows including the corner
    t17 = jnp.concatenate([tl[:, None], top], axis=1)
    l17 = jnp.concatenate([tl[:, None], left], axis=1)
    iw = jnp.arange(1, 9)
    hsum = (iw[None, :] * (t17[:, 9:17] - t17[:, 7::-1])).sum(-1)
    vsum = (iw[None, :] * (l17[:, 9:17] - l17[:, 7::-1])).sum(-1)
    a = 16 * (l17[:, 16] + t17[:, 16])
    bb = (5 * hsum + 32) >> 6
    cc = (5 * vsum + 32) >> 6
    jj, ii = jnp.mgrid[0:16, 0:16]
    pl = jnp.clip((a[:, None, None] + bb[:, None, None] * (ii - 7)
                   + cc[:, None, None] * (jj - 7) + 16) >> 5, 0, 255)
    return jnp.stack([v, h, dcb, pl], axis=1)[jnp.arange(L), mode]


def _pred_chroma(pl, mbx, mby, mode, al, at):
    """(L, 8, 8) chroma intra prediction from plane pl."""
    import jax.numpy as jnp
    L = mbx.shape[0]
    Hh, Ww = pl.shape
    x0, y0 = mbx * 8, mby * 8
    cols = x0[:, None] + jnp.arange(8)[None, :]
    rows = y0[:, None] + jnp.arange(8)[None, :]
    top = pl[jnp.clip(y0 - 1, 0, Hh - 1)[:, None], jnp.clip(cols, 0, Ww - 1)]
    left = pl[jnp.clip(rows, 0, Hh - 1), jnp.clip(x0 - 1, 0, Ww - 1)[:, None]]
    tl = pl[jnp.clip(y0 - 1, 0, Hh - 1), jnp.clip(x0 - 1, 0, Ww - 1)]
    hmode = jnp.broadcast_to(left[:, :, None], (L, 8, 8))
    vmode = jnp.broadcast_to(top[:, None, :], (L, 8, 8))
    # plane
    t9 = jnp.concatenate([tl[:, None], top], axis=1)
    l9 = jnp.concatenate([tl[:, None], left], axis=1)
    iw = jnp.arange(1, 5)
    hsum = (iw[None, :] * (t9[:, 5:9] - t9[:, 3::-1])).sum(-1)
    vsum = (iw[None, :] * (l9[:, 5:9] - l9[:, 3::-1])).sum(-1)
    a = 16 * (l9[:, 8] + t9[:, 8])
    bb = (17 * hsum + 16) >> 5
    cc = (17 * vsum + 16) >> 5
    jj, ii = jnp.mgrid[0:8, 0:8]
    plane = jnp.clip((a[:, None, None] + bb[:, None, None] * (ii - 3)
                      + cc[:, None, None] * (jj - 3) + 16) >> 5, 0, 255)
    # DC: per-quadrant rules (spec 8.3.4.1)
    dcq = jnp.zeros((L, 2, 2), np.int32)
    for qy in range(2):
        for qx in range(2):
            tsum = top[:, qx * 4:qx * 4 + 4].sum(-1)
            lsum = left[:, qy * 4:qy * 4 + 4].sum(-1)
            if qx == qy:
                d = jnp.where(at & al, (tsum + lsum + 4) >> 3,
                              jnp.where(at, (tsum + 2) >> 2,
                                        jnp.where(al, (lsum + 2) >> 2, 128)))
            elif qx == 1:
                d = jnp.where(at, (tsum + 2) >> 2,
                              jnp.where(al, (lsum + 2) >> 2, 128))
            else:
                d = jnp.where(al, (lsum + 2) >> 2,
                              jnp.where(at, (tsum + 2) >> 2, 128))
            dcq = dcq.at[:, qy, qx].set(d)
    dc = jnp.repeat(jnp.repeat(dcq, 4, axis=1), 4, axis=2)
    return jnp.stack([dc, hmode, vmode, plane], axis=1)[jnp.arange(L), mode]


def _i4_predict(y, px, py, mode, avail):
    """4x4 intra prediction for a batch of blocks.
    px/py: (L,) pixel coords; mode: (L,); avail: (L, 4) [l, t, tr, tl].
    Returns (L, 16) int32."""
    import jax.numpy as jnp
    L = px.shape[0]
    Hh, Ww = y.shape

    def g(r, c):
        return y[jnp.clip(r, 0, Hh - 1), jnp.clip(c, 0, Ww - 1)]

    off = jnp.arange(4)
    left = g(py[:, None] + off[None, :], (px - 1)[:, None])
    top = g((py - 1)[:, None], px[:, None] + off[None, :])
    tr = g((py - 1)[:, None], px[:, None] + 4 + off[None, :])
    tl = g(py - 1, px - 1)
    atr = avail[:, 2]
    tr = jnp.where(atr[:, None], tr, top[:, 3:4])
    r = jnp.concatenate([left, tl[:, None], top, tr], axis=1)  # (L, 13)
    idx = jnp.asarray(_I4_IDX)          # (9, 16, 3)
    wts = jnp.asarray(_I4_W)
    shs = jnp.asarray(_I4_SH)
    m = jnp.clip(mode, 0, 8)
    bi = idx[m]                          # (L, 16, 3)
    bw = wts[m]
    bs = shs[m]
    vals = jnp.take_along_axis(r[:, None, :],
                               bi.reshape(L, 1, 48), axis=2)
    vals = vals.reshape(L, 16, 3)
    rnd = (1 << bs) >> 1
    out = ((vals * bw).sum(-1) + rnd) >> bs
    dc = _dc4(left, top, avail[:, 0], avail[:, 1])
    return jnp.where((m == 2)[:, None], dc[:, None], out)


def _i8_predict(y, px, py, mode, avail):
    """Intra_8x8 prediction for a batch of blocks: gathers raw refs,
    applies the 8.3.2.2.1 reference filter, then the mode tables.
    px/py: (L,) pixel coords; avail: (L, 4) [l, t, tr, tl].
    Returns (L, 8, 8) int32."""
    import jax.numpy as jnp
    L = px.shape[0]
    Hh, Ww = y.shape

    def g(r, c):
        return y[jnp.clip(r, 0, Hh - 1), jnp.clip(c, 0, Ww - 1)]

    al, at, atr, atl = (avail[:, k] for k in range(4))
    off8 = jnp.arange(8)
    left = g(py[:, None] + off8[None, :], (px - 1)[:, None])   # (L, 8)
    t16 = g((py - 1)[:, None], px[:, None] + jnp.arange(16)[None, :])
    t16 = jnp.where(atr[:, None], t16,
                    jnp.concatenate([t16[:, :8],
                                     jnp.tile(t16[:, 7:8], (1, 8))], 1))
    tl = g(py - 1, px - 1)                                      # (L,)
    # --- reference filtering (recon.filter_ref8)
    tf0 = jnp.where(atl, (tl + 2 * t16[:, 0] + t16[:, 1] + 2) >> 2,
                    (3 * t16[:, 0] + t16[:, 1] + 2) >> 2)
    tfm = (t16[:, 0:14] + 2 * t16[:, 1:15] + t16[:, 2:16] + 2) >> 2
    tf15 = (t16[:, 14] + 3 * t16[:, 15] + 2) >> 2
    tf = jnp.concatenate([tf0[:, None], tfm, tf15[:, None]], 1)
    lf0 = jnp.where(atl, (tl + 2 * left[:, 0] + left[:, 1] + 2) >> 2,
                    (3 * left[:, 0] + left[:, 1] + 2) >> 2)
    lfm = (left[:, 0:6] + 2 * left[:, 1:7] + left[:, 2:8] + 2) >> 2
    lf7 = (left[:, 6] + 3 * left[:, 7] + 2) >> 2
    lf = jnp.concatenate([lf0[:, None], lfm, lf7[:, None]], 1)
    tlf = jnp.where(
        at & al, (t16[:, 0] + 2 * tl + left[:, 0] + 2) >> 2,
        jnp.where(at, (3 * tl + t16[:, 0] + 2) >> 2,
                  jnp.where(al, (3 * tl + left[:, 0] + 2) >> 2, tl)))
    r = jnp.concatenate([lf, tlf[:, None], tf], axis=1)        # (L, 25)
    idx = jnp.asarray(_I8_IDX)
    wts = jnp.asarray(_I8_W)
    shs = jnp.asarray(_I8_SH)
    m = jnp.clip(mode, 0, 8)
    bi = idx[m]                                                # (L, 64, 3)
    bw = wts[m]
    bs = shs[m]
    vals = jnp.take_along_axis(r[:, None, :],
                               bi.reshape(L, 1, 192), axis=2)
    vals = vals.reshape(L, 64, 3)
    rnd = (1 << bs) >> 1
    out = ((vals * bw).sum(-1) + rnd) >> bs
    dc = jnp.where(
        al & at, (lf.sum(-1) + tf[:, :8].sum(-1) + 8) >> 4,
        jnp.where(al, (lf.sum(-1) + 4) >> 3,
                  jnp.where(at, (tf[:, :8].sum(-1) + 4) >> 3, 128)))
    out = jnp.where((m == 2)[:, None], dc[:, None], out)
    return out.reshape(L, 8, 8)


def _scatter_blocks(plane, px, py, vals, do, bh, bw):
    """Scatter (L, bh, bw) vals at pixel coords (py, px) masked by do."""
    import jax.numpy as jnp
    OOB = 1 << 20
    rows = jnp.where(do, py, OOB)[:, None, None] + \
        jnp.arange(bh)[None, :, None]
    cols = jnp.where(do, px, OOB)[:, None, None] + \
        jnp.arange(bw)[None, None, :]
    return plane.at[rows, cols].set(vals, mode="drop")


def _gather_blocks(plane, px, py, bh, bw):
    import jax.numpy as jnp
    Hh, Ww = plane.shape
    rows = jnp.clip(py[:, None, None] + jnp.arange(bh)[None, :, None],
                    0, Hh - 1)
    cols = jnp.clip(px[:, None, None] + jnp.arange(bw)[None, None, :],
                    0, Ww - 1)
    return plane[rows, cols]


# ---------------------------------------------------------------------------
# deblocking (device pixel math; strengths/thresholds precomputed on host)


def _deblock_luma_edge(samples, bs, alpha, beta, tc0, on):
    """samples: list of 8 arrays p3..p0,q0..q3. Returns 6 filtered
    arrays p2',p1',p0',q0',q1',q2' (exact h264_loopfilter.c math)."""
    import jax.numpy as jnp
    p3, p2, p1, p0, q0, q1, q2, q3 = samples
    filt = on & (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    # bs < 4
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    tc = tc0 + ap.astype(np.int32) + aq.astype(np.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    w_p0 = jnp.clip(p0 + delta, 0, 255)
    w_q0 = jnp.clip(q0 - delta, 0, 255)
    w_p1 = jnp.where(ap, p1 + jnp.clip(
        (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0), p1)
    w_q1 = jnp.where(aq, q1 + jnp.clip(
        (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0), q1)
    # bs == 4
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = strong & (jnp.abs(p2 - p0) < beta)
    s_p0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                     (2 * p1 + p0 + q1 + 2) >> 2)
    s_p1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    s_p2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq = strong & (jnp.abs(q2 - q0) < beta)
    s_q0 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                     (2 * q1 + q0 + p1 + 2) >> 2)
    s_q1 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    s_q2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    is4 = bs == 4
    n_p2 = jnp.where(is4, s_p2, p2)
    n_p1 = jnp.where(is4, s_p1, w_p1)
    n_p0 = jnp.where(is4, s_p0, w_p0)
    n_q0 = jnp.where(is4, s_q0, w_q0)
    n_q1 = jnp.where(is4, s_q1, w_q1)
    n_q2 = jnp.where(is4, s_q2, q2)
    return [jnp.where(filt, v, o) for v, o in
            ((n_p2, p2), (n_p1, p1), (n_p0, p0),
             (n_q0, q0), (n_q1, q1), (n_q2, q2))]


def _deblock_chroma_edge(p1, p0, q0, q1, bs, alpha, beta, tc, on):
    import jax.numpy as jnp
    filt = on & (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    w_p0 = jnp.clip(p0 + delta, 0, 255)
    w_q0 = jnp.clip(q0 - delta, 0, 255)
    s_p0 = (2 * p1 + p0 + q1 + 2) >> 2
    s_q0 = (2 * q1 + q0 + p1 + 2) >> 2
    n_p0 = jnp.where(bs == 4, s_p0, w_p0)
    n_q0 = jnp.where(bs == 4, s_q0, w_q0)
    return jnp.where(filt, n_p0, p0), jnp.where(filt, n_q0, q0)


# ---------------------------------------------------------------------------
# the jitted frame program


def _build_recon(nmbx: int, nmby: int, R: int, do_deblock: bool):
    import jax
    import jax.numpy as jnp

    H, W = nmby * 16, nmbx * 16
    Hc, Wc = H // 2, W // 2
    LANES = min(nmby, (nmbx + 1) // 2 + 1)
    NDIAG = (nmbx - 1) + 2 * (nmby - 1) + 1
    DLANES = min(nmby, (nmbx + 1) // 2 + 1)
    NDDIAG = NDIAG

    def recon(coeff_y, coeff8_y, coeff_u, coeff_v, i4_pred, i8_pred,
              blk_avail, blk8_avail, i16_mode,
              chroma_imode, mb_nbr_avail, mb_intra, mb_avail, is_pcm,
              pcm_y, pcm_u, pcm_v, mv, slot, wp,
              dpb_y, dpb_u, dpb_v, dbp):
        wl, ol, dl, wu, ou, wv_, ov, dcc = wp
        # 1. residuals (4x4 and 8x8 planes are disjoint per MB: summing
        # them selects the right transform without a mask)
        ry = _residual_plane(coeff_y) + _residual_plane8(coeff8_y)
        ru = _residual_plane(coeff_u)
        rv = _residual_plane(coeff_v)

        # 2. inter prediction
        gy = _pad_replicate(dpb_y.astype(np.int32), _PAD)
        stacked = jnp.stack(_halfpel_planes(gy))
        preds, useds = _inter_luma(stacked, mv, slot, H, W)
        pred_y = _combine_lists(preds, useds, wl, ol, dl, rep=4)
        cu = _pad_replicate(dpb_u.astype(np.int32), _PAD_C)
        cv = _pad_replicate(dpb_v.astype(np.int32), _PAD_C)
        pu, uu = _inter_chroma(cu, mv, slot, Hc, Wc)
        pv, uv = _inter_chroma(cv, mv, slot, Hc, Wc)
        pred_u = _combine_lists(pu, uu, wu, ou, dcc, rep=2)
        pred_v = _combine_lists(pv, uv, wv_, ov, dcc, rep=2)

        y = jnp.clip(pred_y + ry, 0, 255)
        u = jnp.clip(pred_u + ru, 0, 255)
        v = jnp.clip(pred_v + rv, 0, 255)
        # PCM overwrite (PCM MBs are "done" before the wavefront)
        pcm_pix = jnp.repeat(jnp.repeat(is_pcm, 16, 0), 16, 1)
        y = jnp.where(pcm_pix, pcm_y.astype(np.int32), y)
        pcm_cpix = jnp.repeat(jnp.repeat(is_pcm, 8, 0), 8, 1)
        u = jnp.where(pcm_cpix, pcm_u.astype(np.int32), u)
        v = jnp.where(pcm_cpix, pcm_v.astype(np.int32), v)

        intra_mb = mb_intra & mb_avail & (~is_pcm)

        # 3. intra wavefront over MB diagonals d = mbx + 2*mby
        def intra_step(carry, d):
            y, u, v = carry
            base = jnp.maximum(0, (d - nmbx + 2) // 2)
            mby = base + jnp.arange(LANES)
            mbx = d - 2 * mby
            valid = (mby < nmby) & (mbx >= 0) & (mbx < nmbx)
            mbyc = jnp.clip(mby, 0, nmby - 1)
            mbxc = jnp.clip(mbx, 0, nmbx - 1)
            act = valid & intra_mb[mbyc, mbxc]
            al = mb_nbr_avail[mbyc, mbxc, 0]
            at = mb_nbr_avail[mbyc, mbxc, 1]
            # --- I_16x16 at substep 0
            is16 = act & (i16_mode[mbyc, mbxc] >= 0)
            p16 = _pred16(y, mbxc, mbyc,
                          jnp.clip(i16_mode[mbyc, mbxc], 0, 3), al, at)
            res = _gather_blocks(ry, mbxc * 16, mbyc * 16, 16, 16)
            out16 = jnp.clip(jnp.clip(p16, 0, 255) + res, 0, 255)
            y = _scatter_blocks(y, mbxc * 16, mbyc * 16, out16, is16,
                                16, 16)
            # --- chroma for every intra MB at substep 0
            cm = jnp.clip(chroma_imode[mbyc, mbxc], 0, 3)
            for pl_name in range(2):
                pl, res_c = (u, ru) if pl_name == 0 else (v, rv)
                pc = _pred_chroma(pl, mbxc, mbyc, cm, al, at)
                rc = _gather_blocks(res_c, mbxc * 8, mbyc * 8, 8, 8)
                outc = jnp.clip(jnp.clip(pc, 0, 255) + rc, 0, 255)
                pl = _scatter_blocks(pl, mbxc * 8, mbyc * 8, outc, act,
                                     8, 8)
                if pl_name == 0:
                    u = pl
                else:
                    v = pl
            # --- Intra_8x8 inner wavefront: zscan blk8 order covers
            # the left/top/top-right deps inside the MB
            for (sx8, sy8) in ((0, 0), (1, 0), (0, 1), (1, 1)):
                bx8 = mbxc * 2 + sx8
                by8 = mbyc * 2 + sy8
                mode8 = i8_pred[by8, bx8]
                do8 = act & (mode8 >= 0)
                px8, py8 = bx8 * 8, by8 * 8
                pred8 = _i8_predict(y, px8, py8, mode8,
                                    blk8_avail[by8, bx8])
                res8 = _gather_blocks(ry, px8, py8, 8, 8)
                out8 = jnp.clip(jnp.clip(pred8, 0, 255) + res8, 0, 255)
                y = _scatter_blocks(y, px8, py8, out8, do8, 8, 8)
            # --- I_NxN inner wavefront
            for s, blocks in enumerate(_SUBSTEPS):
                for (sx, sy) in blocks:
                    bx4 = mbxc * 4 + sx
                    by4 = mbyc * 4 + sy
                    mode = i4_pred[by4, bx4]
                    do = act & (mode >= 0)
                    px, py = bx4 * 4, by4 * 4
                    pred = _i4_predict(y, px, py, mode,
                                       blk_avail[by4, bx4])
                    res = _gather_blocks(ry, px, py, 4, 4)
                    out = jnp.clip(jnp.clip(pred.reshape(-1, 4, 4),
                                            0, 255) + res, 0, 255)
                    y = _scatter_blocks(y, px, py, out, do, 4, 4)
            return (y, u, v), None

        (y, u, v), _ = jax.lax.scan(intra_step, (y, u, v),
                                    jnp.arange(NDIAG))

        if do_deblock:
            (y, u, v) = _deblock_scan(y, u, v, dbp)

        return (y.astype(np.uint8), u.astype(np.uint8),
                v.astype(np.uint8))

    def _deblock_scan(y, u, v, dbp):
        def step(carry, d):
            y, u, v = carry
            base = jnp.maximum(0, (d - nmbx + 2) // 2)
            mby = base + jnp.arange(DLANES)
            mbx = d - 2 * mby
            valid = (mby < nmby) & (mbx >= 0) & (mbx < nmbx)
            mbyc = jnp.clip(mby, 0, nmby - 1)
            mbxc = jnp.clip(mbx, 0, nmbx - 1)
            on_mb = valid & mb_avail_arr[mbyc, mbxc]
            r16 = jnp.arange(16)
            r8 = jnp.arange(8)
            # ---- vertical edges
            for e in range(4):
                x = mbxc * 16 + e * 4                     # (L,)
                rows = mbyc[:, None] * 16 + r16[None, :]  # (L, 16)
                byq = rows >> 2
                bxq = (mbxc * 4 + e)[:, None]
                bs = dbp["bs_v"][byq, bxq]
                alpha = dbp["al_v"][byq, bxq]
                beta = dbp["be_v"][byq, bxq]
                tc0 = dbp["tc_v"][byq, bxq]
                xcol = x[:, None]
                cols = [jnp.clip(xcol - 4 + k, 0, W - 1) for k in range(8)]
                smp = [y[rows, c] for c in cols]
                f = _deblock_luma_edge(smp, bs, alpha, beta, tc0,
                                       on_mb[:, None])
                OOB = 1 << 20
                xs = jnp.where(on_mb & (x > 0), x, OOB)[:, None]
                for k, val in enumerate(f):
                    y = y.at[rows, xs - 3 + k].set(val, mode="drop")
                if e in (0, 2):
                    cx = mbxc * 8 + (e // 2) * 4
                    crows = mbyc[:, None] * 8 + r8[None, :]
                    byqc = (mbyc * 4)[:, None] + (r8 >> 1)[None, :]
                    bsc = dbp["bs_v"][byqc, bxq]
                    for ci, pl in enumerate((u, v)):
                        alc = dbp["al_cv"][ci][byqc, bxq]
                        bec = dbp["be_cv"][ci][byqc, bxq]
                        tcc = dbp["tc_cv"][ci][byqc, bxq]
                        cxc = cx[:, None]
                        p1 = pl[crows, jnp.clip(cxc - 2, 0, Wc - 1)]
                        p0 = pl[crows, jnp.clip(cxc - 1, 0, Wc - 1)]
                        q0 = pl[crows, jnp.clip(cxc, 0, Wc - 1)]
                        q1 = pl[crows, jnp.clip(cxc + 1, 0, Wc - 1)]
                        np0, nq0 = _deblock_chroma_edge(
                            p1, p0, q0, q1, bsc, alc, bec, tcc,
                            on_mb[:, None])
                        cxs = jnp.where(on_mb & (cx > 0), cx, OOB)[:, None]
                        pl = pl.at[crows, cxs - 1].set(np0, mode="drop")
                        pl = pl.at[crows, cxs].set(nq0, mode="drop")
                        if ci == 0:
                            u = pl
                        else:
                            v = pl
            # ---- horizontal edges
            for e in range(4):
                yy0 = mbyc * 16 + e * 4
                cols = mbxc[:, None] * 16 + r16[None, :]
                bxq = cols >> 2
                byq = (mbyc * 4 + e)[:, None]
                bs = dbp["bs_h"][byq, bxq]
                alpha = dbp["al_h"][byq, bxq]
                beta = dbp["be_h"][byq, bxq]
                tc0 = dbp["tc_h"][byq, bxq]
                yrow = yy0[:, None]
                rws = [jnp.clip(yrow - 4 + k, 0, H - 1) for k in range(8)]
                smp = [y[r, cols] for r in rws]
                f = _deblock_luma_edge(smp, bs, alpha, beta, tc0,
                                       on_mb[:, None])
                OOB = 1 << 20
                ys = jnp.where(on_mb & (yy0 > 0), yy0, OOB)[:, None]
                for k, val in enumerate(f):
                    y = y.at[ys - 3 + k, cols].set(val, mode="drop")
                if e in (0, 2):
                    cy = mbyc * 8 + (e // 2) * 4
                    ccols = mbxc[:, None] * 8 + r8[None, :]
                    bxqc = (mbxc * 4)[:, None] + (r8 >> 1)[None, :]
                    bsc = dbp["bs_h"][byq, bxqc]
                    for ci, pl in enumerate((u, v)):
                        alc = dbp["al_ch"][ci][byq, bxqc]
                        bec = dbp["be_ch"][ci][byq, bxqc]
                        tcc = dbp["tc_ch"][ci][byq, bxqc]
                        cyc = cy[:, None]
                        p1 = pl[jnp.clip(cyc - 2, 0, Hc - 1), ccols]
                        p0 = pl[jnp.clip(cyc - 1, 0, Hc - 1), ccols]
                        q0 = pl[jnp.clip(cyc, 0, Hc - 1), ccols]
                        q1 = pl[jnp.clip(cyc + 1, 0, Hc - 1), ccols]
                        np0, nq0 = _deblock_chroma_edge(
                            p1, p0, q0, q1, bsc, alc, bec, tcc,
                            on_mb[:, None])
                        cys = jnp.where(on_mb & (cy > 0), cy, OOB)[:, None]
                        pl = pl.at[cys - 1, ccols].set(np0, mode="drop")
                        pl = pl.at[cys, ccols].set(nq0, mode="drop")
                        if ci == 0:
                            u = pl
                        else:
                            v = pl
            return (y, u, v), None

        mb_avail_arr = dbp["mb_avail"]
        (y, u, v), _ = jax.lax.scan(step, (y, u, v), jnp.arange(NDDIAG))
        return y, u, v

    return jax.jit(recon)


_RECON_CACHE: Dict[Tuple, object] = {}


def _get_recon(nmbx, nmby, R, do_deblock):
    key = (nmbx, nmby, R, do_deblock)
    fn = _RECON_CACHE.get(key)
    if fn is None:
        fn = _build_recon(nmbx, nmby, R, do_deblock)
        _RECON_CACHE[key] = fn
    return fn


# ---------------------------------------------------------------------------
# host-side deblock metadata (strengths + thresholds from parse tensors)


def _clip3(x, lo, hi):
    return np.clip(x, lo, hi)


def _bs_mv_term(picP, mvP, picQ, mvQ):
    """Vectorized spec 8.7.2.1 motion-based bS (0 or 1). pic*: (2, N)
    slot ids (-9 unused); mv*: (2, N, 2)."""
    usedP = picP >= 0
    usedQ = picQ >= 0
    nP = usedP.sum(0)
    nQ = usedQ.sum(0)
    BIG = 1 << 20

    def far(a, b):
        return (np.abs(a[..., 0] - b[..., 0]) >= 4) | \
               (np.abs(a[..., 1] - b[..., 1]) >= 4)

    picP_ = np.where(usedP, picP, -9)
    picQ_ = np.where(usedQ, picQ, -9)
    sameset = (np.minimum(picP_[0], picP_[1]) ==
               np.minimum(picQ_[0], picQ_[1])) & \
              (np.maximum(picP_[0], picP_[1]) ==
               np.maximum(picQ_[0], picQ_[1]))
    # single-reference case: pick the used entry on each side
    selP = np.where(usedP[0][..., None], mvP[0], mvP[1])
    selQ = np.where(usedQ[0][..., None], mvQ[0], mvQ[1])
    one_far = far(selP, selQ)
    # two-reference case
    same_pic = picP_[0] == picP_[1]
    ok_fwd = (~far(mvP[0], mvQ[0])) & (~far(mvP[1], mvQ[1]))
    ok_rev = (~far(mvP[0], mvQ[1])) & (~far(mvP[1], mvQ[0]))
    two_same = ~(ok_fwd | ok_rev)
    # distinct pictures: match Q entries to P entries by picture id
    q_for_p0 = np.where((picQ_[0] == picP_[0])[..., None], mvQ[0], mvQ[1])
    q_for_p1 = np.where((picQ_[1] == picP_[1])[..., None], mvQ[1], mvQ[0])
    two_diff = far(mvP[0], q_for_p0) | far(mvP[1], q_for_p1)
    bs = np.where(nP != nQ, 1,
                  np.where(~sameset, 1,
                           np.where(nP == 1, one_far.astype(np.int64),
                                    np.where(same_pic, two_same,
                                             two_diff).astype(np.int64))))
    return np.where((nP == 0) & (nQ == 0), 0, bs)


def deblock_params(dec, alpha_off=0, beta_off=0):
    """Precompute per-4x4-edge bS and alpha/beta/tc0 maps (numpy,
    metadata only — mirrors loopfilter.py's scalar logic)."""
    sps, pps = dec.sps, dec.pps
    nmbx, nmby = sps.mb_width, sps.mb_height
    n4y, n4x = nmby * 4, nmbx * 4
    ALPHA = np.asarray(T.ALPHA_TABLE, np.int32)
    BETA = np.asarray(T.BETA_TABLE, np.int32)
    TC0 = np.asarray(T.TC0_TABLE, np.int32)      # (104, 4): bs-1 idx 0..2
    CQP = np.asarray(T.CHROMA_QP_8BIT, np.int32)

    # per-block picture ids (DPB slot of the referenced entry)
    picid = np.full((2, n4y, n4x), -9, np.int64)
    slot_map = getattr(dec, "_slot_map", None)
    for lst in range(2):
        lstref = dec.list0 if lst == 0 else dec.list1
        refs = dec.mv_ref[lst]
        for r in range(len(lstref)):
            if slot_map is not None:
                uid = slot_map[lst].get(r, -1 - lst)
            else:
                uid = id(lstref[r]) % (1 << 31)
            picid[lst][refs == r] = uid
    mv = dec.mv.astype(np.int64)

    mb_intra4 = np.repeat(np.repeat(dec.mb_intra, 4, 0), 4, 1)
    # 8x8-transform MBs: a 4x4 cell is "coded" when its covering 8x8
    # block is (loopfilter.py nnz_eff); their interior e∈{1,3} luma
    # edges are not filtered (8.7: transform-block edges only)
    nnz_src = dec.nnz_y
    trans8 = getattr(dec, "trans8", None)
    t84 = None
    if trans8 is not None and trans8.any():
        g8 = nnz_src.reshape(nmby * 2, 2, nmbx * 2, 2).max((1, 3))
        t8c = np.repeat(np.repeat(trans8, 2, 0), 2, 1)
        g8 = np.where(t8c, g8, 0)
        t84 = np.repeat(np.repeat(trans8, 4, 0), 4, 1)
        nnz_src = np.where(t84, np.repeat(np.repeat(g8, 2, 0), 2, 1),
                           nnz_src)
    nnz = nnz_src > 0
    qp_mb = dec.mb_qp.astype(np.int64)

    out = {}
    for direction in ("v", "h"):
        if direction == "v":
            # P = block to the left
            picP = np.full_like(picid, -9)
            picP[:, :, 1:] = picid[:, :, :-1]
            mvP = np.zeros_like(mv)
            mvP[:, :, 1:] = mv[:, :, :-1]
            intraP = np.zeros_like(mb_intra4)
            intraP[:, 1:] = mb_intra4[:, :-1]
            nnzP = np.zeros_like(nnz)
            nnzP[:, 1:] = nnz[:, :-1]
            mb_edge = (np.arange(n4x) % 4 == 0)[None, :] & \
                np.ones((n4y, 1), bool)
            frame_edge = (np.arange(n4x) == 0)[None, :] & \
                np.ones((n4y, 1), bool)
            qpP = np.zeros((n4y, n4x), np.int64)
            qp_cur = np.repeat(np.repeat(qp_mb, 4, 0), 4, 1)
            qpP[:, 1:] = qp_cur[:, :-1]
        else:
            picP = np.full_like(picid, -9)
            picP[:, 1:, :] = picid[:, :-1, :]
            mvP = np.zeros_like(mv)
            mvP[:, 1:, :] = mv[:, :-1, :]
            intraP = np.zeros_like(mb_intra4)
            intraP[1:, :] = mb_intra4[:-1, :]
            nnzP = np.zeros_like(nnz)
            nnzP[1:, :] = nnz[:-1, :]
            mb_edge = (np.arange(n4y) % 4 == 0)[:, None] & \
                np.ones((1, n4x), bool)
            frame_edge = (np.arange(n4y) == 0)[:, None] & \
                np.ones((1, n4x), bool)
            qpP = np.zeros((n4y, n4x), np.int64)
            qp_cur = np.repeat(np.repeat(qp_mb, 4, 0), 4, 1)
            qpP[1:, :] = qp_cur[:-1, :]

        bs_mv = _bs_mv_term(picP, mvP, picid, mv)
        bs = np.where(
            intraP | mb_intra4,
            np.where(mb_edge, 4, 3),
            np.where(nnzP | nnz, 2, bs_mv))
        # interior edges always have qpP == qp_cur
        qpP_eff = np.where(mb_edge, qpP, qp_cur)
        bs = np.where(frame_edge, 0, bs)
        if t84 is not None:
            if direction == "v":
                inner = (np.arange(n4x) % 2 == 1)[None, :] & \
                    np.ones((n4y, 1), bool)
            else:
                inner = (np.arange(n4y) % 2 == 1)[:, None] & \
                    np.ones((1, n4x), bool)
            bs = np.where(t84 & inner, 0, bs)
        # q-side MB not covered by a slice -> no filtering of its edges
        avail4 = np.repeat(np.repeat(dec.mb_avail, 4, 0), 4, 1)
        bs = np.where(avail4, bs, 0)

        qp_avg = (qpP_eff + qp_cur + 1) >> 1
        ia = _clip3(qp_avg + alpha_off, 0, 51)
        ib = _clip3(qp_avg + beta_off, 0, 51)
        alpha = ALPHA[52 + ia]
        beta = BETA[52 + ib]
        tc0 = TC0[52 + ia, np.clip(bs, 1, 3)] * (bs < 4)
        out[f"bs_{direction}"] = bs.astype(np.int32)
        out[f"al_{direction}"] = alpha.astype(np.int32)
        out[f"be_{direction}"] = beta.astype(np.int32)
        out[f"tc_{direction}"] = tc0.astype(np.int32)

        # chroma thresholds per component (qpc averaging)
        als, bes, tcs = [], [], []
        for coff in (pps.chroma_qp_index_offset,
                     pps.second_chroma_qp_index_offset):
            qpc = (CQP[_clip3(qpP_eff + coff, 0, 51)] +
                   CQP[_clip3(qp_cur + coff, 0, 51)] + 1) >> 1
            cia = _clip3(qpc + alpha_off, 0, 51)
            cib = _clip3(qpc + beta_off, 0, 51)
            als.append(ALPHA[52 + cia].astype(np.int32))
            bes.append(BETA[52 + cib].astype(np.int32))
            tcs.append(((TC0[52 + cia, np.clip(bs, 1, 3)] + 1)
                        * (bs < 4)).astype(np.int32))
        out[f"al_c{direction}"] = als
        out[f"be_c{direction}"] = bes
        out[f"tc_c{direction}"] = tcs
    out["mb_avail"] = dec.mb_avail
    return out


# ---------------------------------------------------------------------------
# wrapper: assemble tensors from a parsed SliceDecoder, run the program


def reconstruct(dec, alpha_off=0, beta_off=0, do_deblock=True) -> None:
    """Device-path equivalent of recon_host.reconstruct + deblock_frame:
    fills dec.y/u/v (final, deblocked) from the parse tensors."""
    sps = dec.sps
    nmbx, nmby = sps.mb_width, sps.mb_height
    H, W = nmby * 16, nmbx * 16

    # stack unique DPB planes into slots; resolve list-relative ref ->
    # slot on the host so the device sees plain indices
    list0 = dec.list0
    if not list0 and dec.ref_frame is not None:
        list0 = [{"planes": dec.ref_frame}]
    slots = []
    slot_of = {}
    slot_map = ({}, {})
    for lst, lstref in ((0, list0), (1, dec.list1)):
        for r, ent in enumerate(lstref):
            key = id(ent["planes"][0])
            if key not in slot_of:
                slot_of[key] = len(slots)
                slots.append(ent["planes"])
            slot_map[lst][r] = slot_of[key]
    dec._slot_map = slot_map
    Rmax = max(1, max(sps.num_ref_frames, len(slots)))
    dpb_y = np.zeros((Rmax, H, W), np.uint8)
    dpb_u = np.zeros((Rmax, H // 2, W // 2), np.uint8)
    dpb_v = np.zeros((Rmax, H // 2, W // 2), np.uint8)
    for i, (py_, pu_, pv_) in enumerate(slots):
        dpb_y[i], dpb_u[i], dpb_v[i] = py_, pu_, pv_

    slot = np.full((2, nmby * 4, nmbx * 4), -1, np.int32)
    for lst in range(2):
        for r, s in slot_map[lst].items():
            slot[lst][dec.mv_ref[lst] == r] = s

    pcm_y = np.zeros((H, W), np.uint8)
    pcm_u = np.zeros((H // 2, W // 2), np.uint8)
    pcm_v = np.zeros((H // 2, W // 2), np.uint8)
    for addr, (py_, pu_, pv_) in dec.pcm.items():
        mby, mbx = addr // nmbx, addr % nmbx
        pcm_y[mby * 16:mby * 16 + 16, mbx * 16:mbx * 16 + 16] = py_
        pcm_u[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = pu_
        pcm_v[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = pv_

    dbp = deblock_params(dec, alpha_off, beta_off) if do_deblock else \
        {"mb_avail": dec.mb_avail}

    if not hasattr(dec, "wp"):
        from .recon_host import build_weight_arrays
        dec.wp = build_weight_arrays(dec, getattr(dec, "last_sh", None))

    fn = _get_recon(nmbx, nmby, Rmax, do_deblock)
    y, u, v = fn(dec.coeff_y, dec.coeff8_y, dec.coeff_u, dec.coeff_v,
                 dec.i4_pred, dec.i8_pred, dec.blk_avail,
                 dec.blk8_avail, dec.i16_mode,
                 dec.chroma_imode, dec.mb_nbr_avail,
                 dec.mb_intra, dec.mb_avail, dec.is_pcm,
                 pcm_y, pcm_u, pcm_v,
                 dec.mv.astype(np.int32), slot, dec.wp,
                 dpb_y, dpb_u, dpb_v, dbp)
    dec.y[:] = np.asarray(y)
    dec.u[:] = np.asarray(u)
    dec.v[:] = np.asarray(v)
