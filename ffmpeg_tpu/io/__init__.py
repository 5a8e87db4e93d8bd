"""Container & byte I/O layer (libavformat analog)."""

from . import avio
from .demux import Demuxer, open_input, probe_format, demuxer_names
from .mux import Muxer, open_output, muxer_names
from .stream import CodecParameters, MediaType, StreamInfo

# register built-in formats
from .formats import exrfmt, tee_fifo, webvtt, wav, y4m, rawvideo, hashenc, img_mjpeg, mov, flac, adts, matroska, matroskaenc, movenc, mpegts, avi, concat_seg, srt, gif, hls, mp3raw, h26x, ac3raw, dtsraw, ivf, dash, dashenc, webpfmt, rtp, assfmt, ogg, flv, mlpraw  # noqa: F401

__all__ = [
    "avio", "Demuxer", "Muxer", "open_input", "open_output", "probe_format",
    "demuxer_names", "muxer_names", "CodecParameters", "MediaType",
    "StreamInfo",
]
