"""AVI demuxer (reference: libavformat/avidec.c core: hdrl/strl parse +
movi chunk walk + idx1 keyframe flags)."""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

from ...core.packet import Packet, PKT_FLAG_KEY
from ...formats.channel_layout import default_layout
from ...utils.error import EndOfStream, InvalidData
from ...utils.rational import Rational
from ..demux import Demuxer, register_demuxer, PROBE_SCORE_MAX
from ..stream import CodecParameters, MediaType

_VIDEO_FOURCC = {
    b"MJPG": "mjpeg", b"mjpg": "mjpeg", b"jpeg": "mjpeg",
    b"H264": "h264", b"h264": "h264", b"X264": "h264", b"avc1": "h264",
    b"HEVC": "hevc", b"hvc1": "hevc",
    b"mpg2": "mpeg2video", b"MPG2": "mpeg2video",
    b"mpg1": "mpeg1video", b"MPG1": "mpeg1video",
    b"XVID": "mpeg4", b"xvid": "mpeg4", b"DIVX": "mpeg4", b"FMP4": "mpeg4",
    b"DX50": "mpeg4", b"mp4v": "mpeg4",
    b"VP80": "vp8", b"VP90": "vp9",
    b"FFV1": "ffv1", b"png ": "png", b"MPNG": "png",
    b"\x00\x00\x00\x00": "rawvideo", b"DIB ": "rawvideo",
}
_AUDIO_TAG = {0x0001: None, 0x0003: None, 0x0055: "mp3", 0x00FF: "aac",
              0x2000: "ac3", 0x0006: "pcm_alaw", 0x0007: "pcm_mulaw"}


@register_demuxer
class AviDemuxer(Demuxer):
    name = "avi"
    extensions = ("avi",)

    @classmethod
    def probe(cls, head: bytes, filename: str = "") -> int:
        if head[:4] == b"RIFF" and head[8:12] in (b"AVI ", b"AVIX"):
            return PROBE_SCORE_MAX
        return 0

    def read_header(self) -> None:
        r = self.r
        if r.tag() != b"RIFF":
            raise InvalidData("avi: not RIFF")
        r.rl32()
        if r.tag() != b"AVI ":
            raise InvalidData("avi: not AVI")
        self._movi_start = None
        self._movi_end = None
        self._rates: List[Rational] = []
        while not r.at_eof():
            tag = r.tag()
            size = r.rl32()
            end = r.tell() + size + (size & 1)
            if tag == b"LIST":
                ltype = r.tag()
                if ltype == b"movi":
                    self._movi_start = r.tell()
                    self._movi_end = end
                    break
                elif ltype in (b"hdrl", b"strl"):
                    continue      # descend
                else:
                    r.skip(end - r.tell())
            elif tag == b"strh":
                self._parse_strh(r.read_exact(size))
                if size & 1:
                    r.skip(1)
            elif tag == b"strf":
                self._parse_strf(r.read_exact(size))
                if size & 1:
                    r.skip(1)
            else:
                r.skip(end - r.tell())
        if self._movi_start is None:
            raise InvalidData("avi: no movi")
        self._counts: Dict[int, int] = {}

    def _parse_strh(self, d: bytes) -> None:
        fcc_type = d[0:4]
        fcc = d[4:8]
        scale, rate = struct.unpack("<II", d[20:28])
        tb = Rational(scale or 1, rate or 25)
        if fcc_type == b"vids":
            codec = _VIDEO_FOURCC.get(fcc, fcc.decode("latin1").strip().lower())
            par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec)
            self.add_stream(codecpar=par, time_base=tb)
        elif fcc_type == b"auds":
            par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="?")
            self.add_stream(codecpar=par, time_base=tb)
        else:
            par = CodecParameters(codec_type=MediaType.DATA)
            self.add_stream(codecpar=par, time_base=tb)
        self._pending_par = self.streams[-1].codecpar

    def _parse_strf(self, d: bytes) -> None:
        par = getattr(self, "_pending_par", None)
        if par is None:
            return
        if par.codec_type == MediaType.VIDEO and len(d) >= 40:
            w, h = struct.unpack("<ii", d[4:12])
            par.width, par.height = w, abs(h)
        elif par.codec_type == MediaType.AUDIO and len(d) >= 16:
            wtag, ch, rate, _, ba, bits = struct.unpack("<HHIIHH", d[:16])
            from .wav import _TAG_TO_CODEC, _pcm_codec
            codec = _TAG_TO_CODEC.get(wtag) or _pcm_codec(wtag, bits)
            par.codec_id = codec
            par.sample_rate = rate
            par.ch_layout = default_layout(ch)
            par.block_align = ba
            par.bits_per_coded_sample = bits
            st = self.streams[-1]
            st.time_base = Rational(1, rate)
        self._pending_par = None

    def read_packet(self) -> Packet:
        r = self.r
        while True:
            if self._movi_end is not None and r.tell() >= self._movi_end:
                raise EndOfStream()
            if r.at_eof():
                raise EndOfStream()
            tag = r.read(4)
            if len(tag) < 4:
                raise EndOfStream()
            if tag == b"LIST":
                r.rl32()
                r.tag()
                continue
            if tag in (b"idx1", b"RIFF"):
                raise EndOfStream()
            size = r.rl32()
            # stream id: '00dc', '01wb', etc.
            try:
                sid = int(tag[:2])
            except ValueError:
                r.skip(size + (size & 1))
                continue
            data = r.read_exact(size)
            if size & 1:
                r.skip(1)
            if sid >= len(self.streams):
                continue
            st = self.streams[sid]
            n = self._counts.get(sid, 0)
            if st.codecpar.codec_type == MediaType.AUDIO and \
                    st.codecpar.block_align:
                dur = len(data) // st.codecpar.block_align
            else:
                dur = 1
            pkt = Packet(data=data, pts=n, dts=n,
                         duration=dur, stream_index=sid,
                         flags=PKT_FLAG_KEY, time_base=st.time_base)
            self._counts[sid] = n + dur
            return pkt
