"""VP9 decoder (reference: libavcodec/vp9.c).

Scope this round: profile-0 8-bit 4:2:0 keyframes / intra-only frames
with tiles and the full in-loop deblocking filter; validated byte-exact
against the reference decoder on crafted streams (the walker in
block.py runs in both directions). Inter frames land next."""

from __future__ import annotations

from typing import List, Optional

from ...core.frame import Frame
from ...core.packet import Packet
from ...io.stream import MediaType
from ...utils.error import InvalidData
from ...utils.rational import Rational
from ..codec import Codec, register_decoder
from .block import FrameState, TileWalker
from .bool import BoolDecoder
from .header import parse_compressed, parse_uncompressed
from .lf import loopfilter_frame


def tile_bounds(idx: int, log2_n: int, sbs: int) -> tuple:
    """→ (start, end) in MI units (vp9.c set_tile_offset)."""
    s = min((idx * sbs) >> log2_n, sbs) << 3
    e = min(((idx + 1) * sbs) >> log2_n, sbs) << 3
    return s, e


def decode_frame(data: bytes):
    """→ (header, FrameState) with reconstructed + filtered planes."""
    h = parse_uncompressed(data)
    pos = (h.uncompressed_bits + 7) // 8
    if pos + h.compressed_size > len(data):
        raise InvalidData("vp9: truncated compressed header")
    probs = parse_compressed(h, data[pos:pos + h.compressed_size])
    pos += h.compressed_size
    fs = FrameState(h, probs)
    n_tc = 1 << h.log2_tile_cols
    n_tr = 1 << h.log2_tile_rows
    for tr in range(n_tr):
        r0, r1 = tile_bounds(tr, h.log2_tile_rows, fs.sb_rows)
        walkers = []
        for tc in range(n_tc):
            if tr == n_tr - 1 and tc == n_tc - 1:
                size = len(data) - pos
            else:
                if pos + 4 > len(data):
                    raise InvalidData("vp9: truncated tile sizes")
                size = int.from_bytes(data[pos:pos + 4], "big")
                pos += 4
            if pos + size > len(data):
                raise InvalidData("vp9: truncated tile")
            core = BoolDecoder(data[pos:pos + size])
            if core.get(128):
                raise InvalidData("vp9: bad tile marker bit")
            pos += size
            c0, c1 = tile_bounds(tc, h.log2_tile_cols, fs.sb_cols)
            walkers.append(TileWalker(fs, core, tile_col_start=c0,
                                      tile_col_end=c1))
        for row in range(r0, min(r1, fs.rows), 8):
            for w in walkers:
                fs.new_tile_left()
                for col in range(w.tile_col_start,
                                 min(w.tile_col_end, fs.cols), 8):
                    w.decode_sb(row, col, 0)
    loopfilter_frame(fs)
    return h, fs


@register_decoder
class VP9Decoder(Codec):
    codec_id = "vp9"
    codec_type = MediaType.VIDEO

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None or not pkt.data:
            return []
        h, fs = decode_frame(pkt.data)
        W, H = h.width, h.height
        f = Frame.video(W, H, "yuv420p",
                        planes=[fs.y[:H, :W].copy(),
                                fs.u[:(H + 1) >> 1, :(W + 1) >> 1].copy(),
                                fs.v[:(H + 1) >> 1, :(W + 1) >> 1].copy()],
                        pts=pkt.pts if pkt else 0,
                        time_base=(pkt.time_base if pkt else None)
                        or Rational(1, 25))
        f.key_frame = h.keyframe
        return [f] if h.show_frame else []
