"""VP8 decoder (RFC 6386; reference: libavcodec/vp8.c).

Keyframe (intra) decoding: segmentation, all intra modes, token
partitions, full normal + simple loop filters; validated byte-exact
against the reference decoder on crafted streams (block.py walks in
both directions). Inter frames land next."""

from __future__ import annotations

from typing import List, Optional

from ...core.frame import Frame
from ...core.packet import Packet
from ...io.stream import MediaType
from ...utils.error import InvalidData, NotSupported
from ...utils.rational import Rational
from ..codec import Codec, register_decoder
from .block import FrameState, MBWalker
from .header import Probs, VP8Header, parse_header
from .lf import filter_level_for_mb, filter_mb, filter_mb_simple


class VP8Core:
    def __init__(self):
        self.probs_saved: Optional[Probs] = None
        self.header: Optional[VP8Header] = None

    def decode_frame(self, data: bytes):
        h, probs, snapshot, c, parts = parse_header(
            bytes(data), self.probs_saved, self.header)
        if not h.keyframe:
            raise NotSupported("vp8: inter frames")
        fs = FrameState(h, probs)
        w = MBWalker(fs, c, parts)
        for mb_y in range(fs.mb_h):
            fs.new_row()
            for mb_x in range(fs.mb_w):
                w.decode_mb(mb_x, mb_y)
        # loop filter (whole frame, MB raster)
        if h.filter_level:
            s = {"seg_enabled": h.seg_enabled,
                 "seg_absolute": h.seg_absolute,
                 "seg_filter_level": h.seg_filter_level,
                 "filter_level": h.filter_level,
                 "lf_delta_enabled": h.lf_delta_enabled,
                 "lf_ref_delta": h.lf_ref_delta,
                 "lf_mode_delta": h.lf_mode_delta,
                 "sharpness": h.sharpness}
            for mb_y in range(fs.mb_h):
                for mb_x in range(fs.mb_w):
                    mb = fs.mb_info[mb_y][mb_x]
                    lvl, il, inner = filter_level_for_mb(s, mb)
                    if h.filter_simple:
                        filter_mb_simple(fs.y, mb_x, mb_y, lvl, il,
                                         inner)
                    else:
                        filter_mb(fs.y, fs.u, fs.v, mb_x, mb_y, lvl,
                                  il, inner, h.keyframe)
        self.probs_saved = probs if h.update_probabilities else \
            (snapshot or probs)
        self.header = h
        return h, fs


def decode_frame(data: bytes):
    return VP8Core().decode_frame(data)


@register_decoder
class VP8Decoder(Codec):
    codec_id = "vp8"
    codec_type = MediaType.VIDEO

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.core = VP8Core()

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None or not pkt.data:
            return []
        h, fs = self.core.decode_frame(bytes(pkt.data))
        if h.invisible:
            return []
        W, H = h.width, h.height
        f = Frame.video(W, H, "yuv420p",
                        planes=[fs.y[:H, :W].copy(),
                                fs.u[:(H + 1) >> 1, :(W + 1) >> 1].copy(),
                                fs.v[:(H + 1) >> 1, :(W + 1) >> 1].copy()],
                        pts=pkt.pts if pkt else 0,
                        time_base=(pkt.time_base if pkt else None)
                        or Rational(1, 25))
        f.key_frame = h.keyframe
        return [f]
