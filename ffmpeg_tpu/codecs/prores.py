"""Apple ProRes decoder (reference: libavcodec/proresdec.c).

SURVEY.md flags ProRes as a prime TPU target: intra-only, slice-parallel
DCT. Host side parses headers and the adaptive Rice/Exp-Golomb entropy
stream into dense per-slice coefficient tensors; dequant + IDCT run
batched over every block of the frame through the same matmul IDCT as
MJPEG (ops/idct.py). The reference's integer simple_idct differs from
our float IDCT by <= 1-2 LSB at 10 bit (same IEEE-1180-style tolerance
class); tests gate on that."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.frame import Frame
from ..core.packet import Packet
from ..io.stream import MediaType
from ..utils.error import InvalidData, NotSupported
from ..utils.rational import Rational
from .codec import Codec, register_decoder

# ITU-like interleaved progressive scan (proresdata.c)
PROGRESSIVE_SCAN = np.array([
    0, 1, 8, 9, 2, 3, 10, 11, 16, 17, 24, 25, 18, 19, 26, 27,
    4, 5, 12, 20, 13, 6, 7, 14, 21, 28, 29, 22, 15, 23, 30, 31,
    32, 33, 40, 48, 41, 34, 35, 42, 49, 56, 57, 50, 43, 36, 37, 44,
    51, 58, 59, 52, 45, 38, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

_FIRST_DC_CB = 0xB8
_DC_CB = [0x04, 0x28, 0x28, 0x4D, 0x4D, 0x70, 0x70]
_RUN_CB = [0x06, 0x06, 0x05, 0x05, 0x04, 0x29, 0x29, 0x29, 0x29, 0x28,
           0x28, 0x28, 0x28, 0x28, 0x28, 0x4C]
_LEV_CB = [0x04, 0x0A, 0x05, 0x06, 0x04, 0x28, 0x28, 0x28, 0x28, 0x4C]


class _Bits:
    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes):
        self.d = data + b"\x00" * 8
        self.pos = 0
        self.n = len(data) * 8

    def peek32(self) -> int:
        p = self.pos
        first = p >> 3
        v = int.from_bytes(self.d[first:first + 5], "big")
        return (v >> (8 - (p & 7))) & 0xFFFFFFFF

    def get(self, nbits: int) -> int:
        p = self.pos
        self.pos = p + nbits
        if nbits == 0:
            return 0
        first = p >> 3
        end = p + nbits
        last = (end + 7) >> 3
        v = int.from_bytes(self.d[first:last], "big")
        return (v >> ((last << 3) - end)) & ((1 << nbits) - 1)


def _codeword(b: _Bits, codebook: int) -> int:
    """Adaptive Rice / Exp-Golomb hybrid (proresdec.c DECODE_CODEWORD)."""
    buf = b.peek32()
    switch_bits = codebook & 3
    rice_order = codebook >> 5
    exp_order = (codebook >> 2) & 7
    q = 32 - buf.bit_length() if buf else 32   # leading zeros (31-log2)
    if q > switch_bits:       # exp-golomb
        bits = exp_order - switch_bits + (q << 1)
        if bits > 31:
            raise InvalidData("prores: bad codeword")
        val = b.get(bits) - (1 << exp_order) + \
            ((switch_bits + 1) << rice_order)
    elif rice_order:
        b.pos += q + 1
        val = (q << rice_order) + b.get(rice_order)
    else:
        val = q
        b.pos += q + 1
    return val


def _tosigned(x: int) -> int:
    return (x >> 1) ^ -(x & 1)


def _decode_dc(b: _Bits, n_blocks: int, out: np.ndarray):
    code = _codeword(b, _FIRST_DC_CB)
    prev = _tosigned(code)
    out[0, 0] = prev
    code = 5
    sign = 0
    for i in range(1, n_blocks):
        code = _codeword(b, _DC_CB[min(code, 6)])
        if code:
            sign ^= -(code & 1)
        else:
            sign = 0
        prev += (((code + 1) >> 1) ^ sign) - sign
        out[i, 0] = prev


def _decode_ac(b: _Bits, n_blocks: int, out: np.ndarray):
    log2_n = n_blocks.bit_length() - 1
    run, level = 4, 2
    max_coeffs = 64 << log2_n
    block_mask = n_blocks - 1
    pos = block_mask
    while True:
        bits_left = b.n - b.pos
        if bits_left <= 0 or (bits_left < 32 and
                              b.get(bits_left) == 0):
            break
        if bits_left < 32:
            b.pos -= bits_left      # undo the probe read
        run = _codeword(b, _RUN_CB[min(run, 15)])
        pos += run + 1
        if pos >= max_coeffs:
            raise InvalidData("prores: ac overflow")
        level = _codeword(b, _LEV_CB[min(level, 9)]) + 1
        sign = -b.get(1)
        out[pos & block_mask, PROGRESSIVE_SCAN[pos >> log2_n]] = \
            (level ^ sign) - sign


@register_decoder
class ProresDecoder(Codec):
    codec_id = "prores"
    codec_type = MediaType.VIDEO
    aliases = ("apcn", "apch", "apcs", "apco", "ap4h", "ap4x")

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None or len(pkt.data) < 28:
            return []
        tag = self.par.codec_tag
        if isinstance(tag, int):
            tag = tag.to_bytes(4, "big").decode("latin1", "ignore")
        elif isinstance(tag, bytes):
            tag = tag.decode("latin1", "ignore")
        bits12 = self.par.codec_id in ("ap4h", "ap4x") or \
            tag in ("ap4h", "ap4x")
        buf = pkt.data
        if buf[4:8] == b"icpf":          # frame atom wrapper
            buf = buf[8:]
        hdr_size = int.from_bytes(buf[:2], "big")
        version = int.from_bytes(buf[2:4], "big")
        if version > 1:
            raise NotSupported(f"prores: version {version}")
        width = int.from_bytes(buf[8:10], "big")
        height = int.from_bytes(buf[10:12], "big")
        frame_type = (buf[12] >> 2) & 3
        if frame_type != 0:
            raise NotSupported("prores: interlaced")
        is444 = (buf[12] & 0xC0) == 0xC0
        alpha = buf[17] & 0xF
        if alpha:
            raise NotSupported("prores: alpha")
        flags = buf[19]
        ptr = 20
        if flags & 2:
            qmat_luma = np.frombuffer(buf[ptr:ptr + 64],
                                      np.uint8).astype(np.int32)
            ptr += 64
        else:
            qmat_luma = np.full(64, 4, np.int32)
        if flags & 1:
            qmat_chroma = np.frombuffer(buf[ptr:ptr + 64],
                                        np.uint8).astype(np.int32)
            ptr += 64
        else:
            qmat_chroma = qmat_luma
        # file qmats are already raster-ordered (proresdec.c keeps them
        # unpermuted for the C idct)
        ql = qmat_luma
        qc = qmat_chroma

        pic = buf[hdr_size:]
        frame = self._decode_picture(pic, width, height, is444, ql, qc,
                                     bits12)
        depth = "12le" if bits12 else "10le"
        fmt = ("yuv444p" if is444 else "yuv422p") + depth
        f = Frame.video(width, height, fmt, planes=frame, pts=pkt.pts,
                        time_base=pkt.time_base or Rational(1, 25))
        f.key_frame = True
        f.color_range = "tv"
        return [f]

    def _decode_picture(self, buf, width, height, is444, ql, qc,
                        bits12=False):
        hdr_size = buf[0] >> 3
        log2_sw = buf[7] >> 4
        if (buf[7] & 0xF) or log2_sw > 3:
            raise InvalidData("prores: bad slice dims")
        slice_mb_w = 1 << log2_sw
        mb_w = (width + 15) >> 4
        mb_h = (height + 15) >> 4
        slice_count = mb_h * ((mb_w >> log2_sw)
                              + bin(mb_w & (slice_mb_w - 1)).count("1"))
        index = buf[hdr_size:hdr_size + slice_count * 2]
        data = buf[hdr_size + slice_count * 2:]

        W, H = mb_w * 16, mb_h * 16
        cw = W if is444 else W // 2
        y_pl = np.zeros((H, W), np.uint16)
        u_pl = np.zeros((H, cw), np.uint16)
        v_pl = np.zeros((H, cw), np.uint16)
        log2_cb_per_mb = 2 if is444 else 1

        pos = 0
        mb_x = mb_y = 0
        cur = slice_mb_w
        for i in range(slice_count):
            size = int.from_bytes(index[i * 2:i * 2 + 2], "big")
            sl = data[pos:pos + size]
            pos += size
            while mb_w - mb_x < cur:
                cur >>= 1
            self._decode_slice(sl, mb_x, mb_y, cur, y_pl, u_pl, v_pl,
                               ql, qc, is444, bits12)
            mb_x += cur
            if mb_x == mb_w:
                cur = slice_mb_w
                mb_x = 0
                mb_y += 1
        return [y_pl[:height, :width],
                u_pl[:height, :width if is444 else width // 2],
                v_pl[:height, :width if is444 else width // 2]]

    def _decode_slice(self, sl, mb_x, mb_y, mb_count, y_pl, u_pl, v_pl,
                      ql, qc, is444, bits12=False):
        hdr_size = sl[0] >> 3
        qscale = min(max(sl[1], 1), 224)
        if qscale > 128:
            qscale = (qscale - 96) << 2
        y_size = int.from_bytes(sl[2:4], "big")
        u_size = int.from_bytes(sl[4:6], "big")
        if hdr_size > 7:
            v_size = int.from_bytes(sl[6:8], "big")
        else:
            v_size = len(sl) - y_size - u_size - hdr_size
        body = sl[hdr_size:]

        n_luma = mb_count * 4
        n_chroma = mb_count * (4 if is444 else 2)
        yb = self._entropy(body[:y_size], n_luma)
        ub = self._entropy(body[y_size:y_size + u_size], n_chroma)
        vb = self._entropy(body[y_size + u_size:y_size + u_size + v_size],
                           n_chroma)
        ypix = _idct_blocks(yb, ql * qscale, bits12)
        upix = _idct_blocks(ub, qc * qscale, bits12)
        vpix = _idct_blocks(vb, qc * qscale, bits12)

        # luma: 4 blocks per MB at (0,0) (8,0) (0,8) (8,8)
        for m in range(mb_count):
            x0, y0 = (mb_x + m) * 16, mb_y * 16
            y_pl[y0:y0 + 8, x0:x0 + 8] = ypix[m * 4]
            y_pl[y0:y0 + 8, x0 + 8:x0 + 16] = ypix[m * 4 + 1]
            y_pl[y0 + 8:y0 + 16, x0:x0 + 8] = ypix[m * 4 + 2]
            y_pl[y0 + 8:y0 + 16, x0 + 8:x0 + 16] = ypix[m * 4 + 3]
        npb = 4 if is444 else 2
        for pl, blocks in ((u_pl, upix), (v_pl, vpix)):
            for m in range(mb_count):
                y0 = mb_y * 16
                if is444:
                    # column-major pairs (proresdec decode_slice_chroma)
                    x0 = (mb_x + m) * 16
                    pl[y0:y0 + 8, x0:x0 + 8] = blocks[m * 4]
                    pl[y0 + 8:y0 + 16, x0:x0 + 8] = blocks[m * 4 + 1]
                    pl[y0:y0 + 8, x0 + 8:x0 + 16] = blocks[m * 4 + 2]
                    pl[y0 + 8:y0 + 16, x0 + 8:x0 + 16] = blocks[m * 4 + 3]
                else:
                    x0 = (mb_x + m) * 8
                    pl[y0:y0 + 8, x0:x0 + 8] = blocks[m * 2]
                    pl[y0 + 8:y0 + 16, x0:x0 + 8] = blocks[m * 2 + 1]

    @staticmethod
    def _entropy(data: bytes, n_blocks: int) -> np.ndarray:
        out = np.zeros((n_blocks, 64), np.int32)
        if not data:
            return out
        b = _Bits(data)
        _decode_dc(b, n_blocks, out)
        _decode_ac(b, n_blocks, out)
        return out


def _idct_blocks(coeffs: np.ndarray, qmat: np.ndarray,
                 bits12: bool = False) -> np.ndarray:
    """Dequant + 8x8 IDCT, batched on device (ops/idct.idct8x8).
    Coefficient scale: pixels = idct/4 + 512 at 10 bit; idct + 2048 at
    12 bit (calibrated against the reference's simple_idct pipelines)."""
    import jax.numpy as jnp
    from ..ops.idct import idct8x8
    deq = coeffs.astype(np.float32) * qmat.astype(np.float32)
    blocks = jnp.asarray(deq.reshape(-1, 8, 8))
    if bits12:
        pix = idct8x8(blocks) + 2048.0
        out = jnp.clip(jnp.round(pix), 16, 4079)
    else:
        pix = idct8x8(blocks) / 4.0 + 512.0
        out = jnp.clip(jnp.round(pix), 4, 1019)
    return np.asarray(out).astype(np.uint16)
