"""rawvideo decoder/encoder (libavcodec/rawdec.c / rawenc.c)."""

from __future__ import annotations

from typing import List, Optional

from ..core.frame import Frame
from ..core.packet import Packet, PKT_FLAG_KEY
from ..io.stream import MediaType
from ..utils.error import InvalidData
from .codec import Codec, register_decoder, register_encoder


@register_decoder
class RawVideoDecoder(Codec):
    codec_id = "rawvideo"
    codec_type = MediaType.VIDEO

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None:
            return []
        p = self.par
        if not p.width or not p.pix_fmt:
            raise InvalidData("rawvideo: missing dimensions/pix_fmt")
        f = Frame.from_bytes(pkt.data, p.pix_fmt, p.width, p.height,
                             pts=pkt.pts, duration=pkt.duration,
                             time_base=pkt.time_base)
        f.sample_aspect_ratio = p.sample_aspect_ratio
        f.color_range = p.color_range if p.color_range != "unspecified" else f.color_range
        f.color_space = p.color_space
        f.chroma_location = p.chroma_location if p.chroma_location != "unspecified" else f.chroma_location
        return [f]


@register_encoder
class RawVideoEncoder(Codec):
    codec_id = "rawvideo"
    codec_type = MediaType.VIDEO
    is_encoder = True

    def encode(self, frame: Optional[Frame]) -> List[Packet]:
        if frame is None:
            return []
        return [Packet(data=frame.numpy().to_bytes(), pts=frame.pts,
                       dts=frame.pts, duration=frame.duration,
                       flags=PKT_FLAG_KEY, time_base=frame.time_base)]


@register_decoder
class WrappedFrameDecoder(Codec):
    """wrapped_avframe analog: packets whose payload IS a Frame object."""

    codec_id = "wrapped_frame"
    codec_type = MediaType.VIDEO

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None:
            return []
        if not isinstance(pkt.opaque, Frame):
            raise InvalidData("wrapped_frame packet without Frame payload")
        return [pkt.opaque]
