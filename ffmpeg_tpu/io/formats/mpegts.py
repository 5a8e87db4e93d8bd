"""MPEG-TS demuxer (reference: libavformat/mpegts.c, 3.9k LoC core).

188-byte packet sync, PAT → PMT → PES reassembly with PTS/DTS parsing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ...core.packet import Packet, PKT_FLAG_KEY
from ...formats.channel_layout import default_layout
from ...utils.error import EndOfStream, InvalidData
from ...utils.rational import NOPTS, Rational
from ..demux import Demuxer, register_demuxer
from ..parsers import SPLITTERS
from ..stream import CodecParameters, MediaType

TS_PACKET_SIZE = 188

# stream_type → (codec_id, media_type)
_STREAM_TYPES = {
    0x01: ("mpeg1video", MediaType.VIDEO), 0x02: ("mpeg2video", MediaType.VIDEO),
    0x03: ("mp3", MediaType.AUDIO), 0x04: ("mp3", MediaType.AUDIO),
    0x0F: ("aac", MediaType.AUDIO), 0x11: ("aac_latm", MediaType.AUDIO),
    0x10: ("mpeg4", MediaType.VIDEO),
    0x1B: ("h264", MediaType.VIDEO), 0x24: ("hevc", MediaType.VIDEO),
    0x21: ("jpeg2000", MediaType.VIDEO),
    0x81: ("ac3", MediaType.AUDIO), 0x87: ("eac3", MediaType.AUDIO),
    0x82: ("dts", MediaType.AUDIO), 0x06: ("data", MediaType.DATA),
    0xD1: ("dirac", MediaType.VIDEO), 0xEA: ("vc1", MediaType.VIDEO),
}


@dataclass
class _PesState:
    pid: int
    stream_index: int
    buffer: bytearray = field(default_factory=bytearray)
    pts: int = NOPTS
    dts: int = NOPTS
    key: bool = True
    started: bool = False


@register_demuxer
class MpegTsDemuxer(Demuxer):
    name = "mpegts"
    long_name = "MPEG-TS (MPEG-2 Transport Stream)"
    extensions = ("ts", "m2t", "m2ts", "mts")

    @classmethod
    def probe(cls, head: bytes, filename: str = "") -> int:
        score = 0
        for start in range(min(188, max(1, len(head) - 188 * 4))):
            if all(start + i * 188 < len(head) and head[start + i * 188] == 0x47
                   for i in range(4)):
                score = 50 if start else 100
                break
        return score

    def read_header(self) -> None:
        self._pmt_pids: set = set()
        self._pes: Dict[int, _PesState] = {}
        self._queue: List[Packet] = []
        self._started = False
        self._sync()
        # scan for PAT/PMT before declaring streams
        scanned = 0
        while not self._pes and scanned < 5000:
            if not self._read_ts_packet():
                break
            scanned += 1
        if not self._pes:
            raise InvalidData("mpegts: no PMT found")
        # private (0x06) streams need their first ES payload to identify
        # the codec — keep scanning (packets land in the queue, not lost)
        scanned = 0
        while any(st.codecpar.codec_id == "data"
                  for st in self.streams) and scanned < 20000:
            if not self._read_ts_packet():
                for ps in self._pes.values():
                    if ps.started and ps.buffer:
                        self._emit(ps)
                break
            scanned += 1

    def _sync(self) -> None:
        while True:
            b = self.r.peek(1)
            if not b:
                raise EndOfStream()
            if b[0] == 0x47:
                return
            self.r.skip(1)

    def _read_ts_packet(self) -> bool:
        data = self.r.read(TS_PACKET_SIZE)
        if len(data) < TS_PACKET_SIZE:
            return False
        if data[0] != 0x47:
            self._sync()
            return True
        pid = (data[1] & 0x1F) << 8 | data[2]
        pusi = bool(data[1] & 0x40)
        afc = (data[3] >> 4) & 3
        pos = 4
        if afc & 2:   # adaptation field
            af_len = data[4]
            pos = 5 + af_len
        if not (afc & 1) or pos >= TS_PACKET_SIZE:
            return True
        payload = data[pos:]

        if pid == 0:                      # PAT
            self._parse_pat(payload, pusi)
        elif pid in self._pmt_pids:
            self._parse_pmt(payload, pusi)
        elif pid in self._pes:
            self._feed_pes(self._pes[pid], payload, pusi)
        return True

    @staticmethod
    def _section(payload: bytes, pusi: bool) -> Optional[bytes]:
        if not pusi:
            return None
        ptr = payload[0]
        return payload[1 + ptr:]

    def _parse_pat(self, payload: bytes, pusi: bool) -> None:
        sec = self._section(payload, pusi)
        if not sec or sec[0] != 0x00:
            return
        slen = (sec[1] & 0x0F) << 8 | sec[2]
        i = 8
        end = 3 + slen - 4
        while i + 4 <= end:
            prog = sec[i] << 8 | sec[i + 1]
            pid = (sec[i + 2] & 0x1F) << 8 | sec[i + 3]
            if prog != 0:
                self._pmt_pids.add(pid)
            i += 4

    def _parse_pmt(self, payload: bytes, pusi: bool) -> None:
        sec = self._section(payload, pusi)
        if not sec or sec[0] != 0x02:
            return
        slen = (sec[1] & 0x0F) << 8 | sec[2]
        end = 3 + slen - 4
        pcr = (sec[8] & 0x1F) << 8 | sec[9]
        pinfo_len = (sec[10] & 0x0F) << 8 | sec[11]
        i = 12 + pinfo_len
        while i + 5 <= end:
            stype = sec[i]
            epid = (sec[i + 1] & 0x1F) << 8 | sec[i + 2]
            es_len = (sec[i + 3] & 0x0F) << 8 | sec[i + 4]
            i += 5 + es_len
            if epid in self._pes:
                continue
            codec, mtype = _STREAM_TYPES.get(stype, (f"type{stype}", MediaType.DATA))
            par = CodecParameters(codec_type=mtype, codec_id=codec)
            st = self.add_stream(codecpar=par, time_base=Rational(1, 90000))
            self._pes[epid] = _PesState(pid=epid, stream_index=st.index)

    def _feed_pes(self, ps: _PesState, payload: bytes, pusi: bool) -> None:
        if pusi:
            if ps.started and ps.buffer:
                self._emit(ps)
            ps.buffer = bytearray(payload)
            ps.started = True
        elif ps.started:
            ps.buffer += payload

    def _emit(self, ps: _PesState) -> None:
        buf = bytes(ps.buffer)
        ps.buffer = bytearray()
        if len(buf) < 9 or buf[:3] != b"\x00\x00\x01":
            return
        hdr_len = buf[8]
        flags = buf[7]
        pts = dts = NOPTS

        def ts_at(i):
            return ((buf[i] >> 1 & 7) << 30 | buf[i + 1] << 22 |
                    (buf[i + 2] >> 1) << 15 | buf[i + 3] << 7 | buf[i + 4] >> 1)

        if flags & 0x80:
            pts = ts_at(9)
            dts = ts_at(14) if flags & 0x40 else pts
        data = buf[9 + hdr_len:]
        if not data:
            return
        st = self.streams[ps.stream_index]
        if st.codecpar.codec_id == "data":
            self._sniff_es(st, data)
        splitter = SPLITTERS.get(st.codecpar.codec_id)
        if splitter is not None:
            frames, rate, rest = splitter(data)
            if rate and not st.codecpar.sample_rate:
                st.codecpar.sample_rate = rate
            step = 0
            if rate:
                nsamp = 1024 if st.codecpar.codec_id == "aac" else 1152
                step = nsamp * 90000 // rate
            for j, fr in enumerate(frames):
                self._queue.append(Packet(
                    data=fr,
                    pts=(pts + j * step) if pts != NOPTS else NOPTS,
                    dts=(dts + j * step) if dts != NOPTS else NOPTS,
                    stream_index=ps.stream_index, flags=PKT_FLAG_KEY,
                    time_base=Rational(1, 90000)))
            return
        self._queue.append(Packet(
            data=data, pts=pts, dts=dts, stream_index=ps.stream_index,
            flags=PKT_FLAG_KEY, time_base=Rational(1, 90000)))

    @staticmethod
    def _sniff_es(st, data: bytes) -> None:
        """stream_type 0x06 (private PES) carries no codec id — identify
        the ES from its first payload like mpegts.c does by probing."""
        par = st.codecpar
        if data[:2] == b"\xff\xd8":
            par.codec_id, par.codec_type = "mjpeg", MediaType.VIDEO
        elif data[:3] == b"\x00\x00\x01" and data[3:4] in (b"\xb3", b"\x00"):
            par.codec_id, par.codec_type = "mpeg2video", MediaType.VIDEO
        elif len(data) > 1 and data[0] == 0xFF and (data[1] & 0xF6) == 0xF0:
            par.codec_id, par.codec_type = "aac", MediaType.AUDIO
        elif data[:3] == b"ID3" or (len(data) > 1 and data[0] == 0xFF and
                                    (data[1] & 0xE6) in (0xE2, 0xE4, 0xE6)):
            par.codec_id, par.codec_type = "mp3", MediaType.AUDIO

    def read_packet(self) -> Packet:
        while not self._queue:
            if not self._read_ts_packet():
                # EOF: flush pending PES payloads
                for ps in self._pes.values():
                    if ps.started and ps.buffer:
                        self._emit(ps)
                if self._queue:
                    break
                raise EndOfStream()
        return self._queue.pop(0)
