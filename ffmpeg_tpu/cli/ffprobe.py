"""fftpu-probe — media inspector (analog of fftools/ffprobe.c) with the
pluggable textformat writers (default/json/csv/flat/ini/compact)."""

from __future__ import annotations

import sys
from typing import List, Optional

from ..io import open_input
from ..io.stream import MediaType
from ..utils.error import FFTPUError
from ..utils.rational import NOPTS
from .textformat import get_writer


def _stream_dict(st) -> dict:
    p = st.codecpar
    d = {
        "index": st.index,
        "codec_name": p.codec_id,
        "codec_type": p.codec_type,
    }
    if p.codec_type == MediaType.VIDEO:
        d.update(width=p.width, height=p.height,
                 pix_fmt=p.pix_fmt or "unknown",
                 sample_aspect_ratio=f"{p.sample_aspect_ratio.num}:{p.sample_aspect_ratio.den}",
                 avg_frame_rate=f"{st.avg_frame_rate.num}/{st.avg_frame_rate.den}")
    elif p.codec_type == MediaType.AUDIO:
        d.update(sample_rate=p.sample_rate, channels=p.channels,
                 channel_layout=p.ch_layout.describe() if p.ch_layout else "unknown")
    d["time_base"] = f"{st.time_base.num}/{st.time_base.den}"
    if st.duration != NOPTS:
        d["duration_ts"] = st.duration
        if st.time_base.den:
            d["duration"] = f"{st.duration * st.time_base.num / st.time_base.den:.6f}"
    if st.nb_frames:
        d["nb_frames"] = st.nb_frames
    return d


def _packet_dict(pkt, st) -> dict:
    tb = st.time_base
    d = {
        "codec_type": st.codecpar.codec_type,
        "stream_index": pkt.stream_index,
        "pts": pkt.pts if pkt.pts != NOPTS else "N/A",
        "dts": pkt.dts if pkt.dts != NOPTS else "N/A",
        "duration": pkt.duration,
        "size": len(pkt.data),
        "pos": pkt.pos,
        "flags": ("K" if pkt.is_keyframe else "_") + "_",
    }
    if pkt.pts != NOPTS and tb.den:
        d["pts_time"] = f"{pkt.pts * tb.num / tb.den:.6f}"
    return d


def main(argv: Optional[List[str]] = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    url = None
    fmt = None
    writer = "default"
    show_streams = show_format = show_packets = False
    input_format = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-show_streams":
            show_streams = True
        elif a == "-show_format":
            show_format = True
        elif a == "-show_packets":
            show_packets = True
        elif a in ("-of", "-print_format", "-output_format"):
            i += 1
            writer = argv[i]
        elif a == "-f":
            i += 1
            input_format = argv[i]
        elif a in ("-v", "-loglevel"):
            i += 1
        elif a in ("-hide_banner",):
            pass
        elif a == "-i":
            i += 1
            url = argv[i]
        elif not a.startswith("-"):
            url = a
        i += 1
    if url is None:
        sys.stderr.write("usage: fftpu-probe [-show_streams|-show_format|"
                         "-show_packets] [-of json|csv|flat|ini|compact] input\n")
        return 1
    if not (show_streams or show_format or show_packets):
        show_streams = show_format = True
    try:
        d = open_input(url, format=input_format)
        sections = []
        if show_packets:
            for pkt in d.packets():
                sections.append(("packet", _packet_dict(pkt, d.streams[pkt.stream_index])))
        if show_streams:
            for st in d.streams:
                sections.append(("stream", _stream_dict(st)))
        if show_format:
            fmt_d = {
                "filename": url,
                "nb_streams": len(d.streams),
                "format_name": d.name,
            }
            if d.duration != NOPTS:
                fmt_d["duration"] = f"{d.duration / 1e6:.6f}"
            sections.append(("format", fmt_d))
        sys.stdout.write(get_writer(writer).render(sections))
        return 0
    except FFTPUError as e:
        sys.stderr.write(f"fftpu-probe: error: {e}\n")
        return 1


if __name__ == "__main__":
    sys.exit(main())
