"""Subtitle codecs: SRT/SubRip (srtdec.c/srtenc.c analogs) — text subs
decoded to text+timing side frames."""

from __future__ import annotations

import re
from typing import List, Optional

from ..core.frame import Frame
from ..core.packet import Packet, PKT_FLAG_KEY
from ..io.stream import MediaType
from .codec import Codec, register_decoder, register_encoder


@register_decoder
class SrtDecoder(Codec):
    """Decodes SubRip payloads: text carried in frame.side_data['text']."""

    codec_id = "subrip"
    codec_type = MediaType.SUBTITLE
    aliases = ("srt",)

    _TAG_RE = re.compile(r"<[^>]+>")

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None or not pkt.data:
            return []
        text = pkt.data.decode("utf-8", "replace")
        plain = self._TAG_RE.sub("", text).strip()
        f = Frame(pts=pkt.pts, duration=pkt.duration,
                  time_base=pkt.time_base)
        f.side_data["text"] = plain
        f.side_data["ass"] = text
        return [f]


@register_encoder
class SrtEncoder(Codec):
    codec_id = "subrip"
    codec_type = MediaType.SUBTITLE
    is_encoder = True

    def encode(self, frame: Optional[Frame]) -> List[Packet]:
        if frame is None:
            return []
        text = frame.side_data.get("text", "")
        return [Packet(data=text.encode("utf-8"), pts=frame.pts,
                       dts=frame.pts, duration=frame.duration,
                       flags=PKT_FLAG_KEY, time_base=frame.time_base)]
