"""Segment-parallel JPEG Huffman decode ON the TPU.

The classic objection to accelerator media decode is that entropy coding
is bit-serial. For JPEG that is only true *within a restart interval*:
a stream with restart markers (RSTn) is thousands of independent,
byte-aligned, predictor-reset bit segments per frame. This module
decodes all of them as lanes of ONE vectorized program: a
`lax.while_loop` whose body decodes one Huffman symbol per lane per
iteration via LUT gathers. The host ships only the raw destuffed scan
bytes (~100-200 KB/frame) instead of ~6 MB of coefficient planes —
which is what makes a >5x end-to-end decode speedup per chip possible
on a host with a single CPU core.

Host-side preparation (csrc/mjpeg_huff.cpp mjpeg_split_segments)
destuffs the scan and records segment byte offsets; build_luts() bakes
the DHT specs into flat 16-bit-peek tables.

Reference for the sequential semantics being vectorized:
libavcodec/mjpegdec.c decode_block / ITU T.81 §F.2.2.
"""

from __future__ import annotations

import numpy as np


def build_lut(counts: np.ndarray, values: np.ndarray) -> np.ndarray:
    """(16,) code-length counts + values -> (65536,) int32 LUT of
    len<<8 | symbol for a 16-bit MSB-first peek. 0 = invalid code."""
    lut = np.zeros(1 << 16, np.int32)
    code = 0
    vi = 0
    for l in range(1, 17):
        for _ in range(int(counts[l - 1])):
            lo = code << (16 - l)
            hi = lo + (1 << (16 - l))
            lut[lo:hi] = (l << 8) | int(values[vi])
            code += 1
            vi += 1
        code <<= 1
    return lut


def build_jpeg_luts(st) -> np.ndarray:
    """From a parsed _JpegState: (4, 65536) int32 LUTs ordered
    [dc_luma, dc_chroma, ac_luma, ac_chroma]."""
    comps = st.components
    dcl = build_lut(st.dc_counts[comps[0].dc_tab],
                    st.dc_values[comps[0].dc_tab])
    dcc = build_lut(st.dc_counts[comps[1].dc_tab],
                    st.dc_values[comps[1].dc_tab])
    acl = build_lut(st.ac_counts[comps[0].ac_tab],
                    st.ac_values[comps[0].ac_tab])
    acc = build_lut(st.ac_counts[comps[1].ac_tab],
                    st.ac_values[comps[1].ac_tab])
    return np.stack([dcl, dcc, acl, acc])


def build_jpeg_luts9(st) -> np.ndarray:
    """Length-capped (<=9 bit) tables -> (512, 12) int8 one-hot-matmul
    LUT: per 9-bit peek, columns [len, run, size] x [dc_luma, dc_chroma,
    ac_luma, ac_chroma] (nibbles keep every entry int8-exact for the
    MXU int8 dot). Raises if any code is longer than 9 bits."""
    comps = st.components
    specs = [(st.dc_counts[comps[0].dc_tab], st.dc_values[comps[0].dc_tab]),
             (st.dc_counts[comps[1].dc_tab], st.dc_values[comps[1].dc_tab]),
             (st.ac_counts[comps[0].ac_tab], st.ac_values[comps[0].ac_tab]),
             (st.ac_counts[comps[1].ac_tab], st.ac_values[comps[1].ac_tab])]
    out = np.zeros((512, 12), np.int8)
    for t, (counts, values) in enumerate(specs):
        if any(counts[l] for l in range(9, 16)):
            raise ValueError("jpeg: code longer than 9 bits")
        code = 0
        vi = 0
        for l in range(1, 10):
            for _ in range(int(counts[l - 1])):
                lo = code << (9 - l)
                hi = lo + (1 << (9 - l))
                v = int(values[vi])
                out[lo:hi, 3 * t] = l
                out[lo:hi, 3 * t + 1] = v >> 4
                out[lo:hi, 3 * t + 2] = v & 15
                code += 1
                vi += 1
            code <<= 1
    return out


def jpeg_scan_decode9(rows, valid, lut9, blocks_per_seg: int = 6,
                      comp_of_blk=(0, 0, 0, 0, 1, 2), max_iter: int = 0,
                      blk_end=None, cur0=None):
    """One-hot/MXU fast path of jpeg_scan_decode for streams whose
    Huffman codes are <= 9 bits (our encoder's huffman=optimal default).

    rows:  (L, S) uint8 — each lane's destuffed segment at a fixed
           stride (mjpeg_split_segments_strided), >= 4 trailing pad.
    lut9:  (512, 8) float32 from build_jpeg_luts9.
    cur0:  optional (L,) int32 initial bit position per lane (lanes cut
           from a shared window at coarse alignment start mid-row).
    Returns (L, blocks_per_seg, 64) int32.

    Random gathers cost ~0.5 ms per step inside a TPU loop; every lookup
    here is instead a one-hot contraction (MXU/VPU-friendly): the 32-bit
    bit-window read is a masked row reduction, the Huffman table is a
    512-wide one-hot matmul, and coefficient emission is a one-hot
    accumulate. sh + len + size <= 7+9+15 = 31 keeps symbol AND
    magnitude inside one 32-bit window, so each iteration does exactly
    one window read."""
    import jax
    import jax.numpy as jnp

    L, S = rows.shape
    NBLK = blocks_per_seg
    if max_iter <= 0:
        max_iter = NBLK * 130
    # per-byte 32-bit big-endian windows, once
    r = rows.astype(np.int32)
    pad = jnp.zeros((L, 3), np.int32)
    rp = jnp.concatenate([r, pad], axis=1)
    rows32 = ((rp[:, :S] << 24) | (rp[:, 1:S + 1] << 16)
              | (rp[:, 2:S + 2] << 8) | rp[:, 3:S + 3])
    if blk_end is None:
        end = jnp.full(L, NBLK, np.int32)
    else:
        end = blk_end.astype(np.int32)
    pos_iota = jnp.arange(S, dtype=np.int32)[None, :]
    emit_iota = jnp.arange(NBLK * 64, dtype=np.int32)[None, :]
    lutf = lut9.astype(np.int8)                     # (512, 12)

    def cond(c):
        it = c[0]
        return (it < max_iter) & jnp.any(c[2] < end)

    def body(c):
        it, cur, blk, k, p0, p1, p2, out = c
        done = blk >= end
        cb = jnp.clip(cur >> 3, 0, S - 1)
        w32 = jnp.sum(jnp.where(pos_iota == cb[:, None], rows32, 0),
                      axis=1)
        sh = cur & 7
        look9 = (w32 >> (23 - sh)) & 0x1FF
        oh = (jnp.arange(512, dtype=np.int32)[None, :]
              == look9[:, None]).astype(np.int8)
        res = jax.lax.dot_general(
            oh, lutf, (((1,), (0,)), ((), ())),
            preferred_element_type=np.int32)          # (L, 12)
        # component from block index arithmetically (a 6-entry table
        # gather costs ~0.5 ms per loop step on TPU; compares are free):
        # 4:2:0 MCU block order Y Y Y Y U V
        b6 = jnp.clip(blk, 0, NBLK - 1) % 6
        comp = (b6 >= 4).astype(np.int32) + (b6 >= 5)
        is_dc = k < 0
        sel = jnp.where(is_dc, 0, 2) + (comp > 0)

        def pick(col0):
            return jnp.where(
                sel == 0, res[:, col0],
                jnp.where(sel == 1, res[:, col0 + 3],
                          jnp.where(sel == 2, res[:, col0 + 6],
                                    res[:, col0 + 9])))

        ln = pick(0)
        run = pick(1)
        sz = pick(2)
        mag = (w32 >> (32 - sh - ln - sz)) & ((1 << sz) - 1)
        half = (1 << sz) >> 1
        val = jnp.where((sz > 0) & (mag < half), mag - (1 << sz) + 1, mag)
        cur = jnp.where(done, cur, cur + ln + sz)
        predc = jnp.where(comp == 0, p0, jnp.where(comp == 1, p1, p2))
        pred_new = predc + val
        coef_val = jnp.where(is_dc, pred_new, val)
        pos = jnp.where(is_dc, 0, k + run)
        eob = (~is_dc) & (sz == 0) & (run == 0)
        zrl = (~is_dc) & (sz == 0) & (run == 15)
        write = (is_dc | (sz > 0)) & (~done) & (pos < 64)
        slot = jnp.clip(blk, 0, NBLK - 1) * 64 + jnp.clip(pos, 0, 63)
        emit = (emit_iota == jnp.where(write, slot, NBLK * 64)[:, None])
        out = out + emit * coef_val[:, None].astype(np.int16)
        upd = is_dc & (~done)
        p0 = jnp.where(upd & (comp == 0), pred_new, p0)
        p1 = jnp.where(upd & (comp == 1), pred_new, p1)
        p2 = jnp.where(upd & (comp == 2), pred_new, p2)
        k_new = jnp.where(is_dc, 1, jnp.where(zrl, k + 16, pos + 1))
        bdone = (~is_dc) & (eob | (k_new >= 64))
        blk = jnp.where((~done) & bdone, blk + 1, blk)
        k = jnp.where(done, k, jnp.where(bdone, -1, k_new))
        return (it + 1, cur, blk, k, p0, p1, p2, out)

    z = jnp.zeros(L, np.int32)
    init = (jnp.int32(0),
            z if cur0 is None else jnp.asarray(cur0, np.int32),
            jnp.where(valid, 0, end).astype(np.int32),
            z - 1, z, z, z,
            jnp.zeros((L, NBLK * 64), np.int16))
    *_, out = jax.lax.while_loop(cond, body, init)
    return out.astype(np.int32).reshape(L, NBLK, 64)


def jpeg_scan_decode(buf, bitpos0, valid, luts, blocks_per_seg: int = 6,
                     comp_of_blk=(0, 0, 0, 0, 1, 2), max_iter: int = 0,
                     blk_end=None):
    """Traceable segment-parallel scan decode.

    buf:      (NB,) uint8 destuffed scan bytes (all lanes' segments),
              padded by >= 4 bytes.
    bitpos0:  (L,) int32 bit offset of each lane's segment start.
    valid:    (L,) bool lane mask (padding lanes decode nothing).
    luts:     (4, 65536) int32 from build_jpeg_luts.
    blk_end:  optional (L,) int32 blocks per lane (a short final restart
              interval decodes fewer); defaults to blocks_per_seg.
    Returns (L, blocks_per_seg, 64) int32 zigzag coefficient blocks.
    """
    import jax
    import jax.numpy as jnp

    L = bitpos0.shape[0]
    NBLK = blocks_per_seg
    if max_iter <= 0:
        max_iter = NBLK * 130
    # 24-bit windows so a 16-bit peek at any bit offset is ONE gather
    b = buf.astype(np.int32)
    b1 = jnp.concatenate([b[1:], jnp.zeros(1, np.int32)])
    b2 = jnp.concatenate([b[2:], jnp.zeros(2, np.int32)])
    buf24 = (b << 16) | (b1 << 8) | b2
    nb = buf24.shape[0]
    lflat = luts.reshape(-1)
    comp_map = jnp.asarray(np.asarray(comp_of_blk, np.int32))
    lane_base = jnp.arange(L, dtype=np.int32) * (NBLK * 64)
    OOB = L * NBLK * 64 + 7
    if blk_end is None:
        end = jnp.full(L, NBLK, np.int32)
    else:
        end = blk_end.astype(np.int32)

    def peek16(cur):
        w = buf24[jnp.clip(cur >> 3, 0, nb - 1)]
        return (w >> (8 - (cur & 7))) & 0xFFFF

    def cond(c):
        it, cur, blk, k, p0, p1, p2, out = c
        return (it < max_iter) & jnp.any(blk < end)

    def body(c):
        it, cur, blk, k, p0, p1, p2, out = c
        done = blk >= end
        comp = comp_map[jnp.clip(blk, 0, NBLK - 1) % len(comp_of_blk)]
        is_dc = k < 0
        sel = jnp.where(is_dc, 0, 2) + (comp > 0)
        e = lflat[sel * 65536 + peek16(cur)]
        ln = e >> 8
        sym = e & 255
        cur = jnp.where(done, cur, cur + ln)
        run = sym >> 4            # 0 for DC symbols (sym <= 11)
        sz = sym & 15
        mag = (peek16(cur) >> (16 - sz)) & ((1 << sz) - 1)
        half = (1 << sz) >> 1
        val = jnp.where((sz > 0) & (mag < half), mag - (1 << sz) + 1, mag)
        cur = jnp.where(done, cur, cur + sz)
        predc = jnp.where(comp == 0, p0, jnp.where(comp == 1, p1, p2))
        pred_new = predc + val
        coef_val = jnp.where(is_dc, pred_new, val)
        pos = jnp.where(is_dc, 0, k + run)
        eob = (~is_dc) & (sz == 0) & (run == 0)
        zrl = (~is_dc) & (sz == 0) & (run == 15)
        write = (is_dc | (sz > 0)) & (~done) & (pos < 64)
        idx = jnp.where(write,
                        lane_base + jnp.clip(blk, 0, NBLK - 1) * 64
                        + jnp.clip(pos, 0, 63), OOB)
        out = out.at[idx].set(coef_val, mode="drop")
        upd = is_dc & (~done)
        p0 = jnp.where(upd & (comp == 0), pred_new, p0)
        p1 = jnp.where(upd & (comp == 1), pred_new, p1)
        p2 = jnp.where(upd & (comp == 2), pred_new, p2)
        k_new = jnp.where(is_dc, 1,
                          jnp.where(zrl, k + 16, pos + 1))
        bdone = (~is_dc) & (eob | (k_new >= 64))
        blk = jnp.where((~done) & bdone, blk + 1, blk)
        k = jnp.where(done, k, jnp.where(bdone, -1, k_new))
        return (it + 1, cur, blk, k, p0, p1, p2, out)

    z = jnp.zeros(L, np.int32)
    init = (jnp.int32(0),
            bitpos0.astype(np.int32),
            jnp.where(valid, 0, end).astype(np.int32),
            z - 1, z, z, z,
            jnp.zeros(L * NBLK * 64, np.int32))
    *_, out = jax.lax.while_loop(cond, body, init)
    return out.reshape(L, NBLK, 64)


# ---------------------------------------------------------------------------
# Pallas TPU kernel variant
# ---------------------------------------------------------------------------

NL_PL = 1024          # lanes per kernel block: 8 sublanes x 128 VPU lanes


def _make_pl_kernel(stride: int, max_iter: int, nblk: int,
                    lut_rows: int = 512):
    """Kernel factory for jpeg_scan_decode9_pl (v5).

    A block of 1024 segments lives as an (8, 128) lane tile with all
    decode state in VMEM/vregs; one while-loop iteration decodes one
    Huffman symbol on every lane:

    - the input arrives as big-endian 32-bit words (built for free in
      the XLA prelude, where the pack fuses into the row gather); bits
      are served from a 12-word (384-bit) per-lane L1 buffer held in
      vregs and refilled by a group-masked reduction once per 4
      iterations, so no per-symbol 256-wide window read is needed;
    - the (len,run,size) lookup is a 512-wide one-hot int8 matmul on
      the MXU (codes are <= 9 bits by construction);
    - coefficients accumulate into the (8, 128, nblk*64) output tile
      with a one-hot masked add.

    Iterations per kernel block = max symbols over its 1024 lanes,
    which is why callers sort lanes by segment length first. Measured
    on v5e: ~2.2 us/iteration + ~60 us/block fixed; the bench clip
    runs ~14 ms per 8-frame 1080p batch.

    Sequential semantics being vectorized: libavcodec/mjpegdec.c
    decode_block / ITU T.81 F.2.2 (same as jpeg_scan_decode9).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    S = stride
    NW = S // 4               # 32-bit words per lane
    NG = NW // 8              # 8-word (256-bit) refill groups
    NCOEF = nblk * 64
    CHUNK = 4                 # body steps per refill + cond check

    def srl(x, n):
        return lax.shift_right_logical(x, n)

    def kernel(words_ref, end_ref, cur0_ref, lut_ref, out_ref):
        # words_ref (1,NW,8,128) i32 big-endian words; end_ref
        # (1,8,128) i32; cur0_ref (1,8,128) i32 initial bit positions;
        # lut_ref (1,512,16) i8 (this block's frame); out_ref
        # (1,8,128,nblk*64) i16
        peek_bits = lut_rows.bit_length() - 1      # 512 -> 9, 256 -> 8
        lut_const = lut_ref[0]
        end = end_ref[0]
        out_ref[0] = jnp.zeros((8, 128, NCOEF), jnp.int16)
        gidx = lax.broadcasted_iota(jnp.int32, (NG, 8, 8, 128), 0)
        oh_iota = lax.broadcasted_iota(jnp.int32, (8, 128, lut_rows), 2)
        emit_iota = lax.broadcasted_iota(jnp.int32, (8, 128, NCOEF), 2)

        def refill(cur):
            """L1 = 12 words covering bits [g*256, g*256+384)."""
            g = srl(cur, 8)
            wv = words_ref[0].reshape(NG, 8, 8, 128)
            main = jnp.sum(jnp.where(gidx == g[None, None], wv, 0), axis=0)
            nxt = jnp.sum(jnp.where(gidx[:, :4] == (g[None, None] + 1),
                                    wv[:, :4], 0), axis=0)
            return g * 256, [main[i] for i in range(8)] + \
                [nxt[i] for i in range(4)]

        def peek32(cur, base, lbuf):
            """32 bits at absolute bit position cur (cur-base <= 335)."""
            off = cur - base
            wi = srl(off, 5)
            w0 = lbuf[0]
            w1 = lbuf[1]
            for i in range(1, 12):
                m = wi == i
                w0 = jnp.where(m, lbuf[i], w0)
                w1 = jnp.where(m, lbuf[i + 1] if i + 1 < 12 else lbuf[i],
                               w1)
            sh = off & 31
            return (w0 << sh) | srl(srl(w1, 1), 31 - sh)

        def cond(c):
            it, cur, blk = c[:3]
            return (it < max_iter) & jnp.any(blk < end)

        def body(c):
            it, cur, blk, k, p0, p1, p2, base, lbuf = c
            done = blk >= end
            w32 = peek32(cur, base, lbuf)
            look9 = srl(w32, 32 - peek_bits)
            oh = (oh_iota == look9[..., None]).astype(jnp.int8)
            res = lax.dot_general(oh, lut_const, (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            b6 = jnp.clip(blk, 0, nblk - 1) % 6
            comp = (b6 >= 4).astype(jnp.int32) + (b6 >= 5)
            is_dc = k < 0
            sel = jnp.where(is_dc, 0, 2) + (comp > 0)

            def pick(c0):
                return jnp.where(
                    sel == 0, res[..., c0],
                    jnp.where(sel == 1, res[..., c0 + 3],
                              jnp.where(sel == 2, res[..., c0 + 6],
                                        res[..., c0 + 9])))

            ln = pick(0)
            run = pick(1)
            sz = pick(2)
            mag = srl(w32, jnp.clip(32 - ln - sz, 0, 31)) & ((1 << sz) - 1)
            half = srl(1 << sz, 1)
            val = jnp.where((sz > 0) & (mag < half),
                            mag - (1 << sz) + 1, mag)
            cur = jnp.where(done, cur, cur + ln + sz)
            predc = jnp.where(comp == 0, p0,
                              jnp.where(comp == 1, p1, p2))
            pred_new = predc + val
            coef_val = jnp.where(is_dc, pred_new, val)
            pos = jnp.where(is_dc, 0, k + run)
            eob = (~is_dc) & (sz == 0) & (run == 0)
            zrl = (~is_dc) & (sz == 0) & (run == 15)
            write = (is_dc | (sz > 0)) & (~done) & (pos < 64)
            slot = jnp.clip(blk, 0, nblk - 1) * 64 + jnp.clip(pos, 0, 63)
            wslot = jnp.where(write, slot, NCOEF)
            emit = jnp.where(emit_iota == wslot[..., None],
                             coef_val[..., None], 0).astype(jnp.int16)
            out_ref[0] += emit
            upd = is_dc & (~done)
            p0 = jnp.where(upd & (comp == 0), pred_new, p0)
            p1 = jnp.where(upd & (comp == 1), pred_new, p1)
            p2 = jnp.where(upd & (comp == 2), pred_new, p2)
            k_new = jnp.where(is_dc, 1, jnp.where(zrl, k + 16, pos + 1))
            bdone = (~is_dc) & (eob | (k_new >= 64))
            blk = jnp.where((~done) & bdone, blk + 1, blk)
            k = jnp.where(done, k, jnp.where(bdone, -1, k_new))
            return (it + 1, cur, blk, k, p0, p1, p2, base, lbuf)

        def chunk_body(c):
            it, cur, blk, k, p0, p1, p2, base, lbuf = c
            base, lbuf = refill(cur)
            c = (it, cur, blk, k, p0, p1, p2, base, lbuf)
            for _ in range(CHUNK):
                c = body(c)
            return c

        z = jnp.zeros((8, 128), jnp.int32)
        base0, lbuf0 = refill(cur0_ref[0])
        jax.lax.while_loop(cond, chunk_body,
                           (jnp.int32(0), cur0_ref[0], z, z - 1, z, z, z,
                            base0, lbuf0))

    return kernel


def jpeg_scan_decode9_pl(rows, lens, lut9, blocks_per_seg: int = 6,
                         max_iter: int = 0, interpret: bool = False,
                         cur0=None):
    """Pallas-TPU segment-parallel scan decode (traceable).

    rows: (L, S) uint8 strided destuffed segments; lens: (L,) int32
    segment byte lengths (used to sort lanes into uniform-length kernel
    blocks; 0 marks an invalid/padding lane); lut9: (512, 12) int8 from
    build_jpeg_luts9, or (F, 512, 12) per-frame tables with L divisible
    by F (frames then never share a kernel block and each block reads
    its own frame's table — DHTs may differ per frame, e.g. our
    encoder's huffman=optimal). Returns (L, blocks_per_seg, 64) int32,
    same contract as jpeg_scan_decode9.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, S = rows.shape
    if S % 32:
        raise ValueError("jpeg_scan_decode9_pl: stride must be a "
                         "multiple of 32 (word-group refill)")
    NBLK = blocks_per_seg
    NCOEF = NBLK * 64
    if max_iter <= 0:
        max_iter = S * 8              # >= 1 bit per symbol: safe bound

    lut9 = jnp.asarray(lut9, jnp.int8)
    if lut9.ndim == 2:
        lut9 = lut9[None]
    lut_rows = lut9.shape[-2]              # 512 (<=9-bit) or 256 (<=8)
    if lut_rows not in (256, 512):
        raise ValueError("jpeg_scan_decode9_pl: lut must have 256 or "
                         "512 rows")
    F = lut9.shape[0]
    if L % F:
        raise ValueError("jpeg_scan_decode9_pl: L not divisible by F")
    npf = L // F                       # lanes per frame
    bpf = -(-npf // NL_PL)             # kernel blocks per frame
    npf_p = bpf * NL_PL
    nb = F * bpf

    lens = jnp.asarray(lens, jnp.int32).reshape(F, npf)
    rows = jnp.asarray(rows).reshape(F, npf, S)
    if cur0 is None:
        cur0 = jnp.zeros((F, npf), jnp.int32)
    else:
        cur0 = jnp.asarray(cur0, jnp.int32).reshape(F, npf)
    if npf_p != npf:
        rows = jnp.pad(rows, ((0, 0), (0, npf_p - npf), (0, 0)))
        lens = jnp.pad(lens, ((0, 0), (0, npf_p - npf)))
        cur0 = jnp.pad(cur0, ((0, 0), (0, npf_p - npf)))
    # sort lanes by length (descending) WITHIN each frame so every
    # 1024-lane block is near-uniform; padding lanes (len 0) sort last
    perm = jnp.argsort(-lens, axis=1)
    rows_s = jnp.take_along_axis(rows, perm[:, :, None], axis=1)
    end_s = jnp.where(jnp.take_along_axis(lens, perm, axis=1) > 0,
                      NBLK, 0).astype(jnp.int32)
    cur0_s = jnp.take_along_axis(cur0, perm, axis=1)

    # big-endian 32-bit words, packed in the XLA prelude where the
    # byte combine fuses into the gather (the kernel reads words only)
    r5 = rows_s.reshape(nb, 8, 128, S // 4, 4).astype(jnp.int32)
    w32 = (r5[..., 0] << 24) | (r5[..., 1] << 16) \
        | (r5[..., 2] << 8) | r5[..., 3]
    w4 = w32.transpose(0, 3, 1, 2)                  # (nb, NW, 8, 128)
    e3 = end_s.reshape(nb, 8, 128)
    c3 = cur0_s.reshape(nb, 8, 128)
    lutpad = jnp.zeros((F, lut_rows, 16), jnp.int8).at[:, :, :12].set(lut9)
    kernel = _make_pl_kernel(S, max_iter, NBLK, lut_rows)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, S // 4, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lut_rows, 16), lambda i: (i // bpf, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128, NCOEF),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, 128, NCOEF), jnp.int16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w4, e3, c3, lutpad)
    out = out.reshape(F, npf_p, NCOEF)
    inv = jnp.argsort(perm, axis=1)
    out = jnp.take_along_axis(out, inv[:, :, None], axis=1)[:, :npf]
    return out.astype(jnp.int32).reshape(L, NBLK, 64)
