"""DNxHD / DNxHR (SMPTE VC-3) decoder (reference: libavcodec/dnxhddec.c).

The third of SURVEY.md's intra-DCT "prime TPU target" trio (with MJPEG
and ProRes): rows are independent coding units; the host VLC stage
yields dense weighted-coefficient tensors and the IDCT runs batched on
device. Float matmul IDCT vs the reference's integer simple_idct:
small-LSB tolerance class (tests gate per depth)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.frame import Frame
from ..core.packet import Packet
from ..io.stream import MediaType
from ..utils.error import InvalidData, NotSupported
from ..utils.rational import Rational
from .codec import Codec, register_decoder
from . import dnxhd_tables as T
from ..ops.idct import ZIGZAG as ZIGZAG_RASTER

_HR_PREFIXES = (b"\x00\x00\x02\x80\x01", b"\x00\x00\x03\x8c\x03",
                b"\x00\x00\x02\x80\x03")


def _build_lut(codes, bits, nsym, syms=None):
    maxlen = max(b for b in bits[:nsym] if b) if nsym else 1
    size = 1 << maxlen
    sym_t = np.full(size, -1, np.int32)
    len_t = np.zeros(size, np.int8)
    for i in range(nsym):
        l = bits[i]
        if l == 0:
            continue
        base = codes[i] << (maxlen - l)
        n = 1 << (maxlen - l)
        sym_t[base:base + n] = syms[i] if syms is not None else i
        len_t[base:base + n] = l
    return maxlen, sym_t, len_t


class _Bits:
    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes):
        self.d = data + b"\x00" * 8
        self.pos = 0
        self.n = len(data) * 8

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

    def peek(self, nbits: int) -> int:
        p = self.pos
        v = self.get(nbits)
        self.pos = p
        return v

    def vlc(self, lut):
        maxlen, sym_t, len_t = lut
        pf = self.peek(maxlen)
        sym = int(sym_t[pf])
        if sym < 0:
            raise InvalidData("dnxhd: bad vlc")
        self.pos += int(len_t[pf])
        return sym


_LUT_CACHE = {}


def _tables(cid, bit_depth):
    key = (cid, bit_depth)
    if key in _LUT_CACHE:
        return _LUT_CACHE[key]
    e = T.CID_TABLE[cid]
    get = lambda s, part: getattr(T, f"T{s}_{part}", None)
    dc_n = 14 if bit_depth > 8 else 12
    dc = _build_lut(get(e["dc"], "DC_CODES"), get(e["dc"], "DC_BITS"), dc_n)
    ac = _build_lut(get(e["ac"], "AC_CODES"), get(e["ac"], "AC_BITS"), 257)
    runsym = e.get("runsym", e["run"])
    run = _build_lut(get(e["run"], "RUN_CODES"), get(e["run"], "RUN_BITS"),
                     62, syms=get(runsym, "RUN"))
    ac_info = np.asarray(get(e["ac"], "AC_INFO"), np.int32).reshape(257, 2)
    lw = np.asarray(get(e["lw"], "LUMA_WEIGHT"), np.int64)
    cwv = get(e["cw"], "CHROMA_WEIGHT")
    cw = np.asarray(cwv, np.int64) if cwv is not None else lw
    out = dict(dc=dc, ac=ac, run=run, ac_info=ac_info, lw=lw, cw=cw,
               index_bits=e["index_bits"], eob=e["eob_index"],
               is444=e["is444"])
    _LUT_CACHE[key] = out
    return out


@register_decoder
class DnxhdDecoder(Codec):
    codec_id = "dnxhd"
    codec_type = MediaType.VIDEO
    aliases = ("AVdn", "AVdh", "dnxhr")

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None or len(pkt.data) < 0x180:
            return []
        buf = pkt.data
        if buf[:5] not in _HR_PREFIXES and buf[:3] != b"\x00\x00\x02":
            raise InvalidData("dnxhd: bad header prefix")
        if buf[5] & 2:
            raise NotSupported("dnxhd: interlaced")
        height = int.from_bytes(buf[0x18:0x1a], "big")
        width = int.from_bytes(buf[0x1a:0x1c], "big")
        bd_code = buf[0x21] >> 5
        bit_depth = {1: 8, 2: 10, 3: 12}.get(bd_code)
        if bit_depth is None:
            raise InvalidData("dnxhd: bad bit depth")
        cid = int.from_bytes(buf[0x28:0x2c], "big")
        if cid not in T.CID_TABLE:
            raise NotSupported(f"dnxhd: cid {cid} (classic DNxHD "
                               "profiles TBD; DNxHR supported)")
        is444 = bool((buf[0x2c] >> 6) & 1)
        act = buf[0x2c] & 1
        if act:
            raise NotSupported("dnxhd: adaptive color transform")
        tb = _tables(cid, bit_depth)
        mb_w = (width + 15) >> 4
        mb_h = int.from_bytes(buf[0x16c:0x16e], "big")
        if not mb_h:
            mb_h = (height + 15) >> 4
        data_offset = 0x280 if mb_h <= 68 else 0x170 + (mb_h << 2)
        offsets = [int.from_bytes(buf[0x170 + 4 * i:0x174 + 4 * i], "big")
                   for i in range(mb_h)]
        body = buf[data_offset:]

        W, H = mb_w * 16, mb_h * 16
        cw_pix = W if is444 else W // 2
        dt = np.uint8 if bit_depth == 8 else np.uint16
        y_pl = np.zeros((H, W), dt)
        u_pl = np.zeros((H, cw_pix), dt)
        v_pl = np.zeros((H, cw_pix), dt)

        for row in range(mb_h):
            self._decode_row(body[offsets[row]:], row, mb_w, tb,
                             bit_depth, is444, y_pl, u_pl, v_pl)
        fmt = {(8, False): "yuv422p", (10, False): "yuv422p10le",
               (12, False): "yuv422p12le", (10, True): "yuv444p10le",
               (12, True): "yuv444p12le"}[(bit_depth, is444)]
        planes = [y_pl[:height, :width],
                  u_pl[:height, :width if is444 else width // 2],
                  v_pl[:height, :width if is444 else width // 2]]
        f = Frame.video(width, height, fmt, planes=planes, pts=pkt.pts,
                        time_base=pkt.time_base or Rational(1, 25))
        f.key_frame = True
        f.color_range = "tv"
        return [f]

    def _decode_row(self, data, row, mb_w, tb, bit_depth, is444,
                    y_pl, u_pl, v_pl):
        b = _Bits(data)
        last_dc = [1 << (bit_depth + 2)] * 3
        nblk = 12 if is444 else 8
        index_bits = tb["index_bits"]
        # (index_bits, level_bias, level_shift) per dnxhddec block variants
        if bit_depth == 8:
            bias, shift = 32, 6
        elif bit_depth == 10 and not is444 and index_bits != 6:
            bias, shift = 8, 4
        elif bit_depth == 10 and not is444:
            # HQX 10-bit uses the 444-style block decode
            bias, shift = 32, 6
        else:
            bias, shift = 32, 6
        blocks = np.zeros((mb_w, nblk, 64), np.int64)
        for x in range(mb_w):
            qscale = b.get(11)
            b.get(1)                  # act flag
            lscale = tb["lw"] * qscale
            cscale = tb["cw"] * qscale
            for n in range(nblk):
                if not is444:
                    comp = 0 if (n & 2) == 0 else 1 + (n & 1)
                else:
                    comp = (n >> 1) % 3
                scale = lscale if comp == 0 else cscale
                weight = tb["lw"] if comp == 0 else tb["cw"]
                self._dct_block(b, blocks[x, n], scale, weight, tb,
                                last_dc, comp, index_bits, bias, shift)
        pix = _idct_batch(blocks.reshape(-1, 64), bit_depth)
        pix = pix.reshape(mb_w, nblk, 8, 8)
        y0 = row * 16
        for x in range(mb_w):
            if not is444:
                x0 = x * 16
                y_pl[y0:y0 + 8, x0:x0 + 8] = pix[x, 0]
                y_pl[y0:y0 + 8, x0 + 8:x0 + 16] = pix[x, 1]
                u_pl[y0:y0 + 8, x * 8:x * 8 + 8] = pix[x, 2]
                v_pl[y0:y0 + 8, x * 8:x * 8 + 8] = pix[x, 3]
                y_pl[y0 + 8:y0 + 16, x0:x0 + 8] = pix[x, 4]
                y_pl[y0 + 8:y0 + 16, x0 + 8:x0 + 16] = pix[x, 5]
                u_pl[y0 + 8:y0 + 16, x * 8:x * 8 + 8] = pix[x, 6]
                v_pl[y0 + 8:y0 + 16, x * 8:x * 8 + 8] = pix[x, 7]
            else:
                x0 = x * 16
                order = [(y_pl, 0, 0), (y_pl, 0, 8), (u_pl, 0, 0),
                         (u_pl, 0, 8), (v_pl, 0, 0), (v_pl, 0, 8),
                         (y_pl, 8, 0), (y_pl, 8, 8), (u_pl, 8, 0),
                         (u_pl, 8, 8), (v_pl, 8, 0), (v_pl, 8, 8)]
                for n, (pl, dy, dx) in enumerate(order):
                    pl[y0 + dy:y0 + dy + 8, x0 + dx:x0 + dx + 8] = pix[x, n]

    @staticmethod
    def _dct_block(b, out, scale, weight, tb, last_dc, comp, index_bits,
                   bias, shift):
        length = b.vlc(tb["dc"])
        if length:
            v = b.get(length)
            if not (v >> (length - 1)):     # negative (JPEG-style extend)
                v -= (1 << length) - 1
            last_dc[comp] += v
        out[0] = last_dc[comp]
        ac_info = tb["ac_info"]
        eob = tb["eob"]
        i = 0
        while True:
            idx = b.vlc(tb["ac"])
            if idx == eob:
                break
            level = int(ac_info[idx, 0])
            flags = int(ac_info[idx, 1])
            sign = -b.get(1)
            if flags & 1:
                level += b.get(index_bits) << 7
            if flags & 2:
                i += b.vlc(tb["run"])
            i += 1
            if i > 63:
                raise InvalidData("dnxhd: ac overflow")
            w = int(scale[i])
            val = level * w + (w >> 1)
            # add bias unless (bias == 32 and weight[i] == 32)
            if bias < 32 or int(weight[i]) != bias:
                val += bias
            val >>= shift
            out[ZIGZAG_RASTER[i]] = (val ^ sign) - sign


def _idct_batch(blocks: np.ndarray, bit_depth: int) -> np.ndarray:
    import jax.numpy as jnp
    from ..ops.idct import idct8x8
    x = jnp.asarray(blocks.astype(np.float32).reshape(-1, 8, 8))
    pix = idct8x8(x)
    maxv = (1 << bit_depth) - 1
    out = jnp.clip(jnp.round(pix), 0, maxv)
    return np.asarray(out).astype(np.uint16 if bit_depth > 8 else np.uint8)
